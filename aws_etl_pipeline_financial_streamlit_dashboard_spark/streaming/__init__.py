from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.jobs import (
    stream_events_from_files,
    tumbling_counts_stream,
)

__all__ = ["stream_events_from_files", "tumbling_counts_stream"]

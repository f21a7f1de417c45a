from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import (
    load_testdata,
    read_csv_seed,
    read_table,
    register_views,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.sinks import (
    write_jdbc_overwrite,
    write_marker,
    write_parquet_overwrite,
)

__all__ = [
    "load_testdata",
    "read_csv_seed",
    "read_table",
    "register_views",
    "write_jdbc_overwrite",
    "write_marker",
    "write_parquet_overwrite",
]

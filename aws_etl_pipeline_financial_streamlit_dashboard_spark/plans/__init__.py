from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
    QUERIES,
    QuerySpec,
    headline_queries,
)

__all__ = ["QUERIES", "QuerySpec", "headline_queries"]

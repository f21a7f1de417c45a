from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.core import (
    argmax_latest,
    cast_columns,
    select_rename,
    union_align,
    unpivot_metrics,
)

__all__ = [
    "argmax_latest",
    "cast_columns",
    "select_rename",
    "union_align",
    "unpivot_metrics",
]

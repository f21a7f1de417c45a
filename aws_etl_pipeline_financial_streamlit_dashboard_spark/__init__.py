"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference AWS-ETL-Pipeline-Financial-Streamlit-Dashboard
(see SURVEY.md), re-expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, declarative sources/sinks, and LLM-data-pipeline extension
operators (dedup, similarity search, text analysis, multimodal columns)
designed for horizontal scale.

Package layout:
- ``session``    SparkSession factory with scale-aware defaults (AQE etc.)
- ``schemas``    explicit StructTypes for the serving + testdata tables
- ``sources``    readers/sinks (parquet, csv, json, jdbc, api-fetch source)
- ``operators``  composable DataFrame operators (projection, argmax-join,
                 union-align, unpivot, dedup, similarity, text analysis)
- ``functions``  scalar/column helpers (name normalization, month keys)
- ``plans``      full query plans: the cleaning transform pipeline, the six
                 dashboard queries, and the TPC-H-analog query catalog that
                 backs ``__spark_entry__.queries()`` and ``bench.py``
- ``streaming``  Structured Streaming: windowed aggs, watermarks, markers
"""

from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

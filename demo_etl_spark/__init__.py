"""demo_etl_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference ETL pipeline (rkrumins/demo-etl): a star-schema sales
analytics asset pipeline with lineage tracking, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, event windowing, multimodal plumbing).

Design stance (SURVEY.md §7): everything is declarative DataFrame /
Spark SQL so Catalyst handles pushdown, pruning, join strategy and
codegen; custom code is limited to listeners (lineage) and API
surface. No row-at-a-time Python UDFs in any hot path.
"""

from demo_etl_spark.context import RunContext, DEFAULT_CONTEXT
from demo_etl_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["RunContext", "DEFAULT_CONTEXT", "get_spark", "__version__"]

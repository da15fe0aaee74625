"""etl_io_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ETL library (``/root/reference/etl_io.py``):
parameterized select/filter, decode/rename cleaning, crosswalk joins with
list-column explode, grouped aggregation (sum/count/count-distinct/product),
long<->wide pivot, one-hot encoding, plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns) and
Structured Streaming over event tables.

Design principles (see SURVEY.md):
  * DataFrame/SQL only — logical plans go through Catalyst; no RDDs.
  * Broadcast small dims, semi-joins instead of collected IN-lists.
  * Built-in functions over UDFs; Arrow-batched pandas UDFs when unavoidable.
  * Every operator designed for 100 TB / 1000-executor scale, tested locally.
"""

from etl_io_spark.session import get_spark, stop_spark
from etl_io_spark.catalog import TableCatalog

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "TableCatalog", "__version__"]

"""rosbag2parquet_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of orm011/rosbag2parquet (reference: C++14 batch
ETL columnarizer), re-expressed Spark-first.

The reference converts a row-oriented typed message log into per-type Parquet
tables plus ``Messages``/``Connections`` metadata tables and delegates querying
to engines reading its output (reference README.md:14-18). This package
provides both halves natively on Spark:

- the pipeline operators (scan, demux, flatten, cast/promote, time-split,
  seqno, dim-lookup, metadata projection, SNAPPY parquet sink) as DataFrame
  transformations — see :mod:`rosbag2parquet_spark.operators` and
  :mod:`rosbag2parquet_spark.sources`;
- the downstream query surface its output is designed for (filter pushdown,
  column pruning, joins on seqno/connection_id, SQL, top-k, union) — Catalyst
  provides most of it; see :mod:`rosbag2parquet_spark.operators.relational`;
- north-star large-scale training-data ops (dedup, similarity search,
  multimodal columns, text analysis) — :mod:`rosbag2parquet_spark.functions`.

Everything is DataFrame/SQL-first: logical plans are declared, Catalyst +
Tungsten choose the physical strategy; Pandas UDFs appear only where built-in
operators cannot express the semantics (documented per call site).
"""

from rosbag2parquet_spark.convert import convert, convert_bag
from rosbag2parquet_spark.session import get_spark
from rosbag2parquet_spark.sources.catalog import TABLES, load_table, register_views

__all__ = [
    "convert",
    "convert_bag",
    "get_spark",
    "load_table",
    "register_views",
    "TABLES",
]

__version__ = "0.1.0"

"""Structured Streaming surface. The reference is strictly batch (one scan
loop, rosbag2parquet.cpp:52-59) — everything here is a north-star extension
(X5): the same logical windowed/sessionized plans as
:mod:`rosbag2parquet_spark.operators.windows`, run incrementally with
watermarks for late data."""

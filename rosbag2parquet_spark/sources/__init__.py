"""Sources: fixture catalog, message-definition schema compiler, bag-style
log source emulation (reference S1/S4 — rosbag2parquet.cpp:41-63,
MessageTable.cpp:305-361)."""

from __future__ import annotations

#: the engine's Connections dim column set (reference README.md:35-42)
CONN_FIELDS = (
    "connection_id", "topic", "datatype", "md5sum", "msg_def",
    "callerid", "latching",
)


def attach_conn_rows(df, tuples):
    """Memoize the driver-parsed Connections rows ON the DataFrame object
    (r13): every ``*_connections_df`` builder creates its frame FROM a
    driver-side row list, yet the converter immediately ``collect()``s it
    back — a full Spark job (~0.3 s of each conversion) for values the
    driver already held. The memo rides only the exact object the builder
    returned (a filtered/derived frame is a new object without it), and
    `conn_rows_of` falls back to a real collect in that case, so the memo
    can never serve stale rows."""
    from pyspark.sql import Row

    df._driver_conn_rows = [
        Row(**dict(zip(CONN_FIELDS, t))) for t in tuples
    ]
    return df


def conn_rows_of(df):
    """The Connections rows of ``df``: the driver-parsed memo when this is
    the exact frame a ``*_connections_df`` builder returned, else a real
    ``collect()``."""
    rows = getattr(df, "_driver_conn_rows", None)
    return rows if rows is not None else df.collect()

"""Schema → SQL DDL generation (reference S17: ``GetVerticaType``,
utils.h:99-136, emits ``vertica_load_tables.sql`` so the Parquet output loads
into an external SQL engine; output sample reference README.md:100).

Ours generates ANSI-flavored DDL from a Spark StructType — same purpose,
engine-neutral. The reference stores unsigned ints in signed columns and
widens in the DDL (utils.h:106-109 maps UINT_32→INT); we document the same
relaxation via the type map.
"""

from __future__ import annotations

from pyspark.sql import types as T

_TYPE_MAP: list[tuple[type, str]] = [
    (T.BooleanType, "BOOLEAN"),
    (T.ByteType, "SMALLINT"),
    (T.ShortType, "SMALLINT"),
    (T.IntegerType, "INTEGER"),
    (T.LongType, "BIGINT"),
    (T.FloatType, "REAL"),
    (T.DoubleType, "DOUBLE PRECISION"),
    (T.StringType, "VARCHAR"),
    (T.BinaryType, "VARBINARY"),
    (T.TimestampType, "TIMESTAMP"),
    (T.TimestampNTZType, "TIMESTAMP"),
    (T.DateType, "DATE"),
]


def sql_type(dt: T.DataType) -> str:
    for spark_t, ddl in _TYPE_MAP:
        if isinstance(dt, spark_t):
            return ddl
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"{sql_type(dt.elementType)} ARRAY"
    raise TypeError(f"no DDL mapping for {dt}")


def create_table_ddl(table: str, schema: T.StructType, if_not_exists: bool = True) -> str:
    """CREATE TABLE statement for one table (reference utils.h:117-136 shape:
    one column per line, nullability from the schema)."""
    head = "CREATE TABLE " + ("IF NOT EXISTS " if if_not_exists else "") + table
    cols = ",\n".join(
        f"  {f.name} {sql_type(f.dataType)}" + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    )
    return f"{head} (\n{cols}\n);"


def load_script(tables: dict[str, T.StructType]) -> str:
    """The `vertica_load_tables.sql` analog: DDL for every output table of a
    conversion run (reference emits one per MessageTable at Close)."""
    return "\n\n".join(create_table_ddl(name, schema) for name, schema in sorted(tables.items()))

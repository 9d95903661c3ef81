"""Operators: the reference's pipeline + aggregation surface (SURVEY.md §2a/2b)
and the query capabilities its output is designed for (§2c), as DataFrame
transformations. Each module exports ``QUERIES`` (name → callable(spark,
sf_dir) → DataFrame) and ``ORACLES`` (name → DuckDB SQL) so correctness parity
lives next to the implementation."""

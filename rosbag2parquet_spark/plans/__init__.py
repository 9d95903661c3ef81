"""Plan-level utilities: schema→DDL generation (reference S17) and physical
plan inspection helpers used by tests to assert pushdown/broadcast."""

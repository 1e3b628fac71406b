"""Logical query plans for the driver contract: each SURVEY.md §2 operator
re-expressed over the driver's parquet tables, paired with an ANSI-SQL
oracle (DuckDB) that must match value-for-value."""

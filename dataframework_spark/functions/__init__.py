"""Shared expression helpers (Spark side) + DuckDB dialect twins."""

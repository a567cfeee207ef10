"""Relational operators over the TPC-H-ish test tables — the
conformance surface for the driver's DuckDB oracle (SURVEY.md §5.2
item 2). Each op is a Ray-Data-first pipeline; the matching ANSI SQL
lives in ``__ray_entry__.oracle_sql``.
"""

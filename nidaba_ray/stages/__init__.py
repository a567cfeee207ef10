"""Stage functions / actor classes for ``Dataset.map_batches`` chains.

Each module holds a pure kernel (unit-testable without Ray) plus the
batch-level wrapper used in pipelines. Registered in
``stages.registry`` (the nidaba plugin-registry analog, SURVEY.md §2.10).
"""

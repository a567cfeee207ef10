"""Composed Dataset pipelines (the Batch/Celery-canvas analog —
nidaba/nidaba.py Batch.run compiles task groups to a Celery chain;
here a pipeline is a lazy Dataset chain scheduled by the streaming
executor, SURVEY.md §3.4)."""

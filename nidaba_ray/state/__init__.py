"""Checkpoint / lineage state — the Redis-batch-state analog
(nidaba keeps per-task state in Redis and artifacts on a shared FS,
nidaba/nidaba.py + storage.py; here a bucketed parquet layout plus
atomic per-bucket JSON manifests provide resume, lineage and counters
— SURVEY.md §4.1 checkpoint row, FIXTURES.md F5)."""

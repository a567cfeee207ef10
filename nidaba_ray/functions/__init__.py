"""Corpus-level text analysis / dedup / similarity operators —
first-class training-data-pipeline ops beyond the reference's own set
(driver instruction), each exposed via ``__ray_entry__.queries()``.
"""

"""nidaba_ray — a Ray-Data-native web-text main-content extraction engine.

Re-expresses the staged OCR DAG of OpenPhilology/nidaba (binarize →
segment → recognize → merge/align → spell-check → output; see SURVEY.md)
as streaming chains of ``ray.data.Dataset.map_batches`` stages over
zero-copy Arrow batches of Common-Crawl-style web pages.

NOT a port: the reference is a Celery/shared-FS batch system over page
images; this engine is columnar (Arrow), streaming (Ray Data executor)
and operates on HTML/PDF payloads per BASELINE.json:input_hint.

Layout:
    algorithms/  pure kernels (edit distance, alignment, median string)
                 — analog of nidaba/algorithms/{string,median}.py
    record.py    span-record schema + serializers — analog of nidaba/tei.py
    synth.py     deterministic synthetic pages table (seed=42)
    stages/      map_batches stage functions / actor classes
    pipelines/   composed Dataset pipelines (flagship: extract)
    functions/   text analysis, dedup, ANN ops over generic corpora
    relational/  relational operators over the TPC-H-ish test tables
    state/       checkpoint manifest / resumable bucketed output
    sources/     read helpers (column pruning, block sizing)

Library code never calls ``ray.init``/``ray.shutdown`` (driver contract).
"""

__version__ = "0.1.0"

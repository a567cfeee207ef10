"""PageRank over the host graph — the canonical iterative graph
computation a web-scale pipeline runs between link extraction and
crawl prioritization / quality weighting.

Determinism: ALL arithmetic is int64 — ranks live in ``SCALE``
micro-units, per-edge contributions are ``(rank · weight) // W``
(exact integer division by the source's total out-weight), damping is
``(85 · x) // 100``, and dangling mass redistributes as an integer
share. Integer sums are order-independent, so the result is
bit-identical across parallelism levels, block layouts and reruns —
and the WHOLE iteration unrolls into DuckDB CTE stages
(``pagerank_sql``, the ann_ivf_sql unrolled-Lloyd precedent), making
an iterative distributed algorithm fully SQL-replayable.

Scale shape: edges stay a Dataset end to end — each iteration is one
``map_batches`` pass over the edges with the rank map broadcast via
``ray.put`` (node-count-sized, ≪ edges; the lexicon/threshold
broadcast pattern) followed by one grouped sum whose key cardinality
is the node count. The driver holds O(nodes) (the rank vector it must
publish anyway), never O(edges). For node sets beyond broadcast reach
the same iteration runs as an edges⋈ranks hash join — the documented
``max_broadcast``-style fallback, not implemented here because the
host universe (~10^8) fits the established broadcast budget.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["SCALE", "N_ITER", "pagerank_hosts", "pagerank_sql",
           "pagerank_pages"]

SCALE = 10**12
N_ITER = 5


def pagerank_hosts(edges: rd.Dataset, n_iter: int = N_ITER) -> pa.Table:
    """(src_host, dst_host, n_links) edges → (host, rank) in SCALE
    micro-units, sorted by host. Standard damped PageRank (d=0.85)
    with uniform teleport and uniform dangling redistribution, k fixed
    iterations."""
    from ray.data.aggregate import Sum

    # the edge list is consumed once per iteration plus twice at
    # setup — materialize it (host-pair-sized) so upstream harvesting
    # never re-executes
    edges = edges.materialize()

    # setup: out-weights per source and the node universe — both are
    # node-count-sized aggregates of the (already host-pair-sized)
    # edge list
    outw_df = (
        edges.groupby("src_host")
        .aggregate(Sum("n_links", alias_name="w"))
        .to_pandas()
    )
    srcs = edges.select_columns(["src_host"]).unique("src_host")
    dsts = edges.select_columns(["dst_host"]).unique("dst_host")
    nodes = sorted(set(srcs) | set(dsts))
    n = len(nodes)
    if n == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64())})
    outw = dict(zip(outw_df["src_host"], outw_df["w"].astype(int)))
    tele = (15 * SCALE) // (100 * n)
    ranks = {h: SCALE // n for h in nodes}

    for _ in range(n_iter):
        state = ray.put((ranks, outw))

        def contrib(batch: pa.Table, state_ref=state) -> pa.Table:
            r, w = ray.get(state_ref)
            df = batch.to_pandas()
            c = [
                (int(r.get(s, 0)) * int(nl)) // int(w[s])
                for s, nl in zip(df["src_host"], df["n_links"])
            ]
            g = (pd.DataFrame({"h": df["dst_host"], "c": c})
                 .groupby("h", as_index=False)["c"].sum())
            return pa.Table.from_pandas(g, preserve_index=False)

        in_df = (
            edges.map_batches(contrib, batch_format="pyarrow")
            # partials are ≤ n-node rows per batch — coalesce before
            # the rollup so the grouped aggregate has no empty reduce
            # partitions (the schema-less RefBundle warning)
            .repartition(1)
            .groupby("h")
            .aggregate(Sum("c", alias_name="s"))
            .to_pandas()  # ≤ n nodes
        )
        incoming = dict(zip(in_df["h"], in_df["s"].astype(int)))
        dangle = sum(r for h, r in ranks.items() if h not in outw)
        share = (85 * dangle) // (100 * n)
        ranks = {
            h: tele + (85 * incoming.get(h, 0)) // 100 + share
            for h in nodes
        }

    return pa.table({
        "host": pa.array(nodes, pa.string()),
        "rank": pa.array([ranks[h] for h in nodes], pa.int64()),
    })


def pagerank_sql(edges_table: str = "edges", n_iter: int = N_ITER) -> str:
    """The iteration unrolled as CTE stages — byte-exact replay of
    :func:`pagerank_hosts` because every operation is an int64 sum,
    product or floor division."""
    ctes = [f"""
nodes AS (
  SELECT DISTINCT h FROM (
    SELECT src_host AS h FROM {edges_table}
    UNION SELECT dst_host FROM {edges_table})
),
cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
outw AS (
  SELECT src_host, CAST(SUM(n_links) AS BIGINT) AS w
  FROM {edges_table} GROUP BY src_host
),
r0 AS (SELECT h, {SCALE}::BIGINT // (SELECT n FROM cnt) AS r FROM nodes)"""]
    for i in range(1, n_iter + 1):
        p = i - 1
        ctes.append(f"""
in{i} AS (
  SELECT e.dst_host AS h, CAST(SUM((r.r * e.n_links) // o.w) AS BIGINT) AS s
  FROM {edges_table} e
  JOIN r{p} r ON r.h = e.src_host
  JOIN outw o ON o.src_host = e.src_host
  GROUP BY e.dst_host
),
dang{i} AS (
  SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS d
  FROM r{p} r LEFT JOIN outw o ON o.src_host = r.h
  WHERE o.src_host IS NULL
),
r{i} AS (
  SELECT n.h,
         (15 * {SCALE}::BIGINT) // (100 * (SELECT n FROM cnt))
         + (85 * COALESCE(i.s, 0)) // 100
         + (85 * (SELECT d FROM dang{i})) // (100 * (SELECT n FROM cnt))
           AS r
  FROM nodes n LEFT JOIN in{i} i ON i.h = n.h
)""")
    return (
        "WITH " + ",".join(ctes)
        + f"\nSELECT h AS host, r AS rank FROM r{n_iter} ORDER BY host"
    )


def pagerank_pages(sf_dir: str, n_iter: int = N_ITER) -> pa.Table:
    """Host PageRank of the synthetic pages corpus: link harvest →
    host graph → k integer iterations (the composed pipeline a crawl
    scheduler runs)."""
    from nidaba_ray.functions.linkgraph import host_graph
    from nidaba_ray.synth import pages_dataset_from_documents

    pages = pages_dataset_from_documents(sf_dir)
    return pagerank_hosts(host_graph(pages), n_iter)

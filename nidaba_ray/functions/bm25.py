"""BM25 keyword retrieval over the documents corpus — the classic
sparse-retrieval operator (Robertson-Walker Okapi BM25, the Lucene
``+1`` idf form) complementing the dense ANN family: score a fixed
query set against every document, return top-k per query.

Determinism / oracle parity: every per-(query, doc, token) component
is computed in doubles with the SAME expression structure on both
engines, quantized to 6 decimals (``round_like_sql`` ↔ ``ROUND``) and
converted to int64 micro-units BEFORE summation — integer sums are
order-independent, so scores are bit-identical across block layouts
and parallelism, and ties break on the total order
(score_micro desc, doc_id asc). ``bm25_sql`` replays the whole thing.

Scale shape — two passes, no corpus shuffle:

1. stats pass: per-batch partials for (N docs, Σ doc length) and the
   per-query-token document frequencies (only the query vocabulary is
   counted — a pushdown: the df map is |query vocab| entries, never
   corpus-vocabulary-sized);
2. scoring pass: broadcast (df, N, avgdl) by closure, compute each
   batch's (query, doc) scores vectorized over the batch's token
   Counters, keep a per-batch top-k COMBINER (≤ k rows per query per
   batch forward), merge per query with ``groupby.map_groups`` (the
   stratified_over bound: queries × k × batches combiner rows move,
   the corpus never does).
"""

from __future__ import annotations

from collections import Counter

import math

import pandas as pd
import pyarrow as pa
import ray.data as rd

from nidaba_ray.functions.compat import round_like_sql
from nidaba_ray.functions.textops import _docs

__all__ = ["BM25_K1", "BM25_B", "DEFAULT_QUERIES", "bm25_topk",
           "bm25_sql"]

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

# deterministic in-repo query set over the corpus vocabulary
DEFAULT_QUERIES: dict[str, str] = {
    "q_join": "hash join merge",
    "q_scan": "table scan filter",
    "q_window": "window agg group",
    "q_stream": "stream batch row",
    "q_sort": "sort order key",
}


def _idf(n_docs: int, df: int) -> float:
    # Lucene form: always positive, smooth at df = n_docs
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_topk(sf_dir: str, queries: dict[str, str] | None = None,
              k: int = BM25_TOPK) -> pa.Table:
    """Top-k documents per query: (qid, rank, doc_id, score_micro)."""
    from ray.data.aggregate import Sum

    queries = DEFAULT_QUERIES if queries is None else queries
    qtoks = {qid: [t for t in q.split(" ") if t]
             for qid, q in queries.items()}
    vocab = sorted({t for ts in qtoks.values() for t in ts})

    # ---- pass 1: corpus stats + query-vocab document frequencies
    def stats_partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        df_counts = dict.fromkeys(vocab, 0)
        n, sdl = 0, 0
        for t in texts:
            toks = [x for x in (t or "").split(" ") if x]
            n += 1
            sdl += len(toks)
            seen = set(toks)
            for v in vocab:
                if v in seen:
                    df_counts[v] += 1
        return pa.table({
            "tok": pa.array(["\x00N", "\x00SDL"] + vocab, pa.string()),
            "c": pa.array([n, sdl] + [df_counts[v] for v in vocab],
                          pa.int64()),
        })

    stats = (
        _docs(sf_dir, ["text"])
        .map_batches(stats_partial, batch_format="pyarrow")
        .repartition(1)  # ≤ |vocab|+2 rows per batch partial
        .groupby("tok")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .set_index("tok")["c"]
    )
    n_docs = int(stats["\x00N"])
    avgdl = float(stats["\x00SDL"]) / n_docs
    df = {v: int(stats.get(v, 0)) for v in vocab}
    idf = {v: _idf(n_docs, df[v]) for v in vocab}

    # ---- pass 2: scoring with a per-batch top-k combiner
    def score_partial(batch: pa.Table) -> pa.Table:
        rows: list[tuple[str, int, int]] = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            toks = [x for x in (text or "").split(" ") if x]
            dl = len(toks)
            tf = Counter(toks)
            norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            for qid, ts in qtoks.items():
                micro = 0
                for t in ts:
                    f = tf.get(t, 0)
                    if not f:
                        continue
                    comp = idf[t] * (f * (BM25_K1 + 1.0)) / (f + norm)
                    micro += int(round(round_like_sql(comp, 6) * 1e6))
                if micro > 0:
                    rows.append((qid, int(doc_id), micro))
        out = pd.DataFrame(rows, columns=["qid", "doc_id", "score_micro"])
        out = (out.sort_values(["qid", "score_micro", "doc_id"],
                               ascending=[True, False, True])
               .groupby("qid", as_index=False).head(k))
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_micro", "doc_id"],
                          ascending=[False, True]).head(k)
        g = g.assign(rank=range(1, len(g) + 1))
        return g[["qid", "rank", "doc_id", "score_micro"]]

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(score_partial, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(["qid", "rank"]).reset_index(drop=True)
        .astype({"qid": "string", "rank": "int64", "doc_id": "int64",
                 "score_micro": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def bm25_sql(queries: dict[str, str] | None = None,
             k: int = BM25_TOPK) -> str:
    """Byte-exact replay: same component expression, same 6-dp
    quantization to micro-units before the (order-free) integer sum,
    same (score desc, doc_id asc) tie-break."""
    queries = DEFAULT_QUERIES if queries is None else queries
    qvals = ", ".join(
        f"('{qid}', '{t}')"
        for qid, q in sorted(queries.items())
        for t in q.split(" ") if t
    )
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
q(qid, tok) AS (VALUES {qvals}),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
  WHERE tok IN (SELECT DISTINCT tok FROM q)
  GROUP BY doc_id, tok
),
df AS (
  SELECT q.tok, CAST(COUNT(DISTINCT tf.doc_id) AS BIGINT) AS df
  FROM (SELECT DISTINCT tok FROM q) q
  LEFT JOIN tf ON tf.tok = q.tok
  GROUP BY q.tok
),
comp AS (
  SELECT q.qid, tf.doc_id,
         CAST(ROUND(ROUND(
           LN((CAST(s.n_docs - df.df AS DOUBLE) + 0.5)
              / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
           * (tf.f * ({BM25_K1} + 1.0))
           / (tf.f + {BM25_K1} * (1.0 - {BM25_B}
                                  + {BM25_B} * dl.dl / s.avgdl)),
           6) * 1000000.0, 0) AS BIGINT) AS micro
  FROM q
  JOIN tf ON tf.tok = q.tok
  JOIN df ON df.tok = q.tok
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, CAST(SUM(micro) AS BIGINT) AS score_micro
  FROM comp GROUP BY qid, doc_id
  HAVING SUM(micro) > 0
),
ranked AS (
  SELECT qid, doc_id, score_micro,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score_micro
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""

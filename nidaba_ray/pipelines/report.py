"""Corpus data card — the per-language summary table a dataset
release ships (the "datasheet" every curated training corpus
publishes): document and token counts, duplicate share, mean
readability, and the Gopher document-rule pass rate, in one rollup.

Scale shape: TWO narrow passes. Pass 1 is a per-batch per-lang
combiner over (count, token count, Flesch micro-units, gopher-rule
passes) — one fixed-width row per language per batch moves, never
documents. Pass 2 is the (lang, md5) distinct-text count (the
source_reputation idiom: the shuffle moves one row per distinct text,
payloads never travel). Everything driver-side is n_langs rows.

Determinism / parity: counts are integers; Flesch is quantized per
document (4 dp → micro-units) BEFORE summation so the rollup is
order-independent; means round with ``round_like_sql``. The whole
card replays in one DuckDB query (``DATACARD_SQL``) composed from the
same regexes ``readability_scores`` and ``GOPHER_FLAGS_SQL`` use —
shared constants, so the sides cannot drift.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nidaba_ray.functions.compat import round_like_sql
from nidaba_ray.functions.textops import (
    _RE_SENT,
    _RE_SYLL,
    _RE_WORD,
    GOPHER_FLAGS_SQL,
    _gopher_signals,
)

__all__ = ["corpus_datacard", "DATACARD_SQL", "key_skew",
           "key_skew_sql", "boilerplate_top", "boilerplate_top_sql"]

_GOPHER6 = ["f_word_count", "f_mean_word_len", "f_symbol_ratio",
            "f_bullet_ellipsis", "f_alpha_words", "f_stopwords"]


def _flesch_micro(s: pd.Series) -> np.ndarray:
    n_words = s.str.count(_RE_WORD).clip(lower=1).astype("int64")
    n_sents = s.str.count(_RE_SENT).clip(lower=1).astype("int64")
    n_syll = s.str.count(_RE_SYLL).astype("int64")
    flesch = round_like_sql(
        206.835 - 1.015 * (n_words / n_sents) - 84.6 * (n_syll / n_words),
        4)
    return np.asarray([int(round(f * 1e6)) for f in flesch], np.int64)


def corpus_datacard(sf_dir: str) -> pa.Table:
    """Per-lang card: (lang, n_docs, n_tokens, n_uniq_texts, dup_frac,
    mean_tokens, mean_flesch, gopher_pass_frac)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        s = df["text"]
        sig = _gopher_signals(s)
        g6 = np.logical_and.reduce([sig[k] for k in _GOPHER6])
        agg = pd.DataFrame({
            "lang": df["lang"],
            "n_docs": 1,
            "n_tokens": s.str.count(_RE_WORD).astype("int64"),
            "flesch_micro": _flesch_micro(s),
            "gopher_pass": g6.astype("int64"),
        }).groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    base = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # ≤ n_langs rows per batch partial
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_tokens", alias_name="n_tokens"),
                   Sum("flesch_micro", alias_name="flesch_micro"),
                   Sum("gopher_pass", alias_name="gopher_pass"))
        .to_pandas()
    )

    def fp_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame({
            "lang": df["lang"],
            "fp": [hashlib.md5(t.encode("utf-8")).hexdigest()
                   for t in df["text"]],
        }).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    def count_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("lang", as_index=False).size()
        return pa.Table.from_pandas(
            df.rename(columns={"size": "n"}), preserve_index=False)

    from ray.data.aggregate import Count

    uniq_df = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["lang", "text"])
        .map_batches(fp_partial, batch_format="pyarrow")
        # one row per distinct (lang, fp) — the shuffle moves
        # fingerprints, never payloads
        .groupby(["lang", "fp"])
        .aggregate(Count())
        .map_batches(count_partial, batch_format="pyarrow")
        .repartition(1)
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n_uniq_texts"))
        .to_pandas()
    )

    card = base.merge(uniq_df, on="lang").sort_values(
        "lang").reset_index(drop=True)
    card["dup_frac"] = round_like_sql(
        (card["n_docs"] - card["n_uniq_texts"]) / card["n_docs"], 4)
    card["mean_tokens"] = round_like_sql(
        card["n_tokens"] / card["n_docs"], 2)
    card["mean_flesch"] = round_like_sql(
        card["flesch_micro"] / card["n_docs"] / 1e6, 4)
    card["gopher_pass_frac"] = round_like_sql(
        card["gopher_pass"] / card["n_docs"], 4)
    card = card.drop(columns=["flesch_micro", "gopher_pass"]).astype(
        {"lang": "string", "n_docs": "int64", "n_tokens": "int64",
         "n_uniq_texts": "int64"})
    return pa.Table.from_pandas(card, preserve_index=False)


def key_skew(ds: rd.Dataset, key: str, k: int = 20,
             hot_ppm: int = 10_000) -> pa.Table:
    """Hot-key audit for a prospective partitioning key — the
    pre-flight check the brief's "salt hot keys" advice needs: which
    keys would dominate a ``groupby``/join shuffle on ``key``?

    Returns the top-``k`` keys as (key, n_rows, share_ppm, is_hot):
    integer parts-per-million share (``n*1e6 // total`` — exact, no
    float drift) and is_hot = 1 when the share clears ``hot_ppm``
    (default 1%). Ordered n_rows-desc then key-asc (total order).

    Scale shape: a per-batch value_counts combiner (one row per
    distinct key per batch) feeds ONE grouped sum at key cardinality;
    the total is a scalar aggregate over those counts and only ``k``
    rows ever reach the driver. Two passes over the counts Dataset,
    zero passes over payload columns (callers should project to the
    key column before calling)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key]).to_pandas().groupby(
            key, as_index=False).size()
        return pa.Table.from_pandas(
            df.rename(columns={"size": "n"}), preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(key)
                .aggregate(Sum("n", alias_name="n_rows"))
                .materialize())
    total = counts.sum("n_rows")
    top = (counts
           .sort(["n_rows", key], descending=[True, False])
           .limit(k)
           .to_pandas())
    top["share_ppm"] = (top["n_rows"].astype("int64")
                        * 1_000_000 // int(total)).astype("int64")
    top["is_hot"] = (top["share_ppm"] >= hot_ppm).astype("int64")
    return pa.Table.from_pandas(top, preserve_index=False)


def key_skew_sql(table: str, key: str, k: int = 20,
                 hot_ppm: int = 10_000) -> str:
    """DuckDB replay of :func:`key_skew` (integer ppm arithmetic)."""
    return f"""
WITH counts AS (
  SELECT {key}, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM {table} GROUP BY {key}
),
tot AS (SELECT SUM(n_rows) AS t FROM counts)
SELECT {key}, n_rows,
       CAST(n_rows * 1000000 // t AS BIGINT) AS share_ppm,
       CAST(CASE WHEN n_rows * 1000000 // t >= {hot_ppm}
            THEN 1 ELSE 0 END AS BIGINT) AS is_hot
FROM counts, tot
ORDER BY n_rows DESC, {key} ASC
LIMIT {k}
"""


DATACARD_SQL = f"""
WITH gopher AS ({GOPHER_FLAGS_SQL}),
readab AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '{_RE_WORD}')) AS n_tokens,
         CAST(ROUND(ROUND(
           206.835
           - 1.015 * (CAST(GREATEST(len(regexp_extract_all(text, '{_RE_WORD}')), 1) AS DOUBLE)
                      / GREATEST(len(regexp_extract_all(text, '{_RE_SENT}')), 1))
           - 84.6 * (CAST(len(regexp_extract_all(text, '{_RE_SYLL}')) AS DOUBLE)
                     / GREATEST(len(regexp_extract_all(text, '{_RE_WORD}')), 1)),
           4) * 1000000.0, 0) AS BIGINT) AS flesch_micro,
         md5(text) AS fp
  FROM documents
),
per AS (
  SELECT r.lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT r.fp) AS BIGINT) AS n_uniq_texts,
         CAST(SUM(r.flesch_micro) AS BIGINT) AS flesch_micro,
         CAST(COUNT(*) FILTER (WHERE g.f_word_count AND g.f_mean_word_len
              AND g.f_symbol_ratio AND g.f_bullet_ellipsis
              AND g.f_alpha_words AND g.f_stopwords) AS BIGINT)
           AS gopher_pass
  FROM readab r JOIN gopher g ON g.doc_id = r.doc_id
  GROUP BY r.lang
)
SELECT lang, n_docs, n_tokens, n_uniq_texts,
       ROUND(CAST(n_docs - n_uniq_texts AS DOUBLE) / n_docs, 4)
         AS dup_frac,
       ROUND(CAST(n_tokens AS DOUBLE) / n_docs, 2) AS mean_tokens,
       ROUND(CAST(flesch_micro AS DOUBLE) / n_docs / 1000000.0, 4)
         AS mean_flesch,
       ROUND(CAST(gopher_pass AS DOUBLE) / n_docs, 4)
         AS gopher_pass_frac
FROM per ORDER BY lang
"""


def boilerplate_top(ds: rd.Dataset, k: int = 20, min_df: int = 2,
                    column: str = "text") -> pa.Table:
    """Most-repeated cross-document lines — the diagnostic that tells
    you what ``dedup_paragraphs`` WOULD remove before you run it
    (cookie banners, footers, share bars surface immediately).

    Scale shape: per-batch distinct-line counts (each doc contributes
    a line once) shuffle as (line, n) partials — only DISTINCT line
    text travels, never documents — then one grouped sum and a
    top-k sort (df desc, line asc; k rows to the driver)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch[column].to_pylist():
            counts.update(set((t or "").split("\n")))
        counts.pop("", None)
        lines, ns = zip(*counts.items()) if counts else ((), ())
        return pa.table({"line": pa.array(list(lines), pa.string()),
                         "n": pa.array(list(ns), pa.int64())})

    top = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("line")
             .aggregate(Sum("n", alias_name="df"))
             .filter(expr=f"df >= {int(min_df)}")
             .sort(["df", "line"], descending=[True, False])
             .limit(k)
             .to_pandas())
    return pa.Table.from_pandas(
        top.astype({"line": "string", "df": "int64"}),
        preserve_index=False)


def boilerplate_top_sql(table: str = "documents", k: int = 20,
                        min_df: int = 2, column: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB replay: split on chr(10), count distinct docs per line."""
    return f"""
WITH lines AS (
  SELECT DISTINCT {id_col} AS doc, unnest(string_split({column}, chr(10))) AS line
  FROM {table}
),
counts AS (
  SELECT line, CAST(COUNT(*) AS BIGINT) AS df
  FROM lines WHERE line <> '' GROUP BY line
)
SELECT line, df FROM counts
WHERE df >= {int(min_df)}
ORDER BY df DESC, line ASC
LIMIT {int(k)}
"""

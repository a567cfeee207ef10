"""Char-trigram LM perplexity (functions/lm.py) — determinism, scalar-
reference parity, and the CCNet discrimination property (in-language
text scores lower perplexity than character noise)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from nidaba_ray.functions import lm
from nidaba_ray.functions.compat import round_like_sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def models(ray_session):
    return lm.train_charlm(SF)


def test_training_deterministic(ray_session, models):
    lm._MODEL_MEMO.clear()
    again = lm.train_charlm(SF)
    assert sorted(models) == sorted(again)
    for lang in models:
        a, b = models[lang], again[lang]
        assert np.array_equal(a.tri_keys, b.tri_keys)
        assert np.array_equal(a.tri_counts, b.tri_counts)
        assert a.v == b.v


def test_scoring_matches_scalar_reference(ray_session, models):
    out = lm.charlm_perplexity(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()
    for _, r in docs.head(40).iterrows():
        ref = round_like_sql(
            lm.perplexity_reference(r["text"], models[r["lang"]]), 4
        )
        assert out.loc[r["doc_id"], "ppl"] == ref, r["doc_id"]


def test_scoring_deterministic_across_runs(ray_session):
    a = lm.charlm_perplexity(SF).to_pandas().sort_values("doc_id")
    b = lm.charlm_perplexity(SF).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_noise_scores_higher_than_language(ray_session, models):
    # under the corpus-trained model, character noise whose trigrams
    # were never seen degrades to the uniform bound ~V, while real
    # corpus text sits far below it (the CCNet filter signal)
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["lang", "text"]
    ).to_pandas()
    clean = [
        lm.perplexity_reference(r["text"], models[r["lang"]])
        for _, r in docs.head(25).iterrows()
    ]
    noise = lm.perplexity_reference("qzxj" * 40, models["en"])
    assert noise > max(clean)
    assert max(clean) < 5.0
    assert noise > 0.9 * models["en"].v


def test_short_doc_uniform_bound(models):
    for lang, m in models.items():
        assert lm.perplexity_reference("ab", m) == float(m.v)


def test_curate_by_perplexity_matches_duckdb_gate(ray_session, tmp_path):
    """The gate logic is pinned against DuckDB quantile_disc computed
    over the SAME scored table (ppl itself is pinned by the reference
    tests above — SQL cannot recompute the model, but it can replay
    the percentile filter exactly)."""
    import duckdb

    scored = lm.charlm_perplexity(SF).to_pandas()
    path = tmp_path / "scored.parquet"
    scored.to_parquet(path, index=False)
    mine = (lm.curate_by_perplexity(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    ora = duckdb.connect().execute(f"""
        WITH s AS (SELECT * FROM read_parquet('{path}')),
        thr AS (SELECT lang, quantile_disc(ppl, 0.9) AS q
                FROM s GROUP BY lang)
        SELECT doc_id, s.lang, ppl FROM s JOIN thr USING (lang)
        WHERE ppl < q ORDER BY doc_id
    """).df()
    assert mine.equals(ora)
    # the gate drops roughly (but at most) the worst decile per lang
    kept = mine.groupby("lang").size()
    total = scored.groupby("lang").size()
    frac = (kept / total).to_numpy()
    assert (frac <= 0.95).all() and (frac >= 0.75).all()
    # everything dropped scores no better than everything kept, per lang
    dropped = scored[~scored["doc_id"].isin(mine["doc_id"])]
    for lang in total.index:
        assert (dropped[dropped["lang"] == lang]["ppl"].min()
                >= mine[mine["lang"] == lang]["ppl"].max())


def test_unmodeled_language_scores_inf(ray_session, tmp_path):
    """A language absent from the training sample cannot be scored —
    it must surface as +inf (gate drops it), never 0.0 ('perfect')."""
    import pyarrow as pa

    docs = pa.table({
        "doc_id": pa.array([10_000, 10_001], pa.int64()),
        "lang": pa.array(["xx", "xx"], pa.string()),
        "text": pa.array(["some tokens here now", "more text body"],
                         pa.string()),
        "source": pa.array(["s", "s"], pa.string()),
        "n_chars": pa.array([20, 14], pa.int64()),
    })
    d = tmp_path / "unmodeled"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    # sample bound (doc_id < 4096) excludes every row → no models at all
    out = lm.charlm_perplexity(str(d)).to_pandas()
    assert np.isinf(out["ppl"]).all()

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

"""DSIR importance resampling — DuckDB full-replay parity, target
discrimination, layout invariance and kernel pins."""

import math

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from nidaba_ray.functions.dsir import (
    DSIR_BUCKETS,
    _fit_llr,
    _grams,
    _gumbel_micro,
    dsir_log_weights,
    dsir_selected,
    dsir_sql,
)

SF = "/root/testdata/sf0.001"


def _oracle(sf=SF, **kw):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    return con.execute(dsir_sql(**kw)).fetchdf()


def test_dsir_sql_parity(ray_session):
    """Selected set, order AND integer keys equal the full DuckDB
    replay (retokenize → rehash → refit → rescore → re-Gumbel)."""
    ours = dsir_selected(SF).to_pandas().reset_index(drop=True)
    theirs = _oracle().reset_index(drop=True)
    assert theirs["key"].dtype == np.int64  # SUM cast guarded
    assert ours.equals(theirs)


def test_dsir_discriminates_target_lang(ray_session):
    """The resample is enriched in the target language vs base rate —
    the property DSIR exists to deliver."""
    sel = dsir_selected(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["lang"])
    base = np.mean(np.asarray(docs["lang"]) == "en")
    assert (sel["lang"] == "en").mean() > base + 0.15


def test_dsir_layout_invariance(ray_session, tmp_path):
    """Same corpus rewritten with 7-row row-groups (different block /
    batch layout) selects the identical set with identical keys."""
    d = tmp_path / "sfcopy"
    d.mkdir()
    t = pq.read_table(f"{SF}/documents.parquet")
    pq.write_table(t, str(d / "documents.parquet"), row_group_size=7)
    a = dsir_selected(SF).to_pandas().reset_index(drop=True)
    b = dsir_selected(str(d)).to_pandas().reset_index(drop=True)
    assert a.equals(b)


def test_dsir_weights_exact_int(ray_session):
    """Per-doc log-weights are exact int64 sums of the broadcast llr
    vector — recompute one doc by hand."""
    llr = _fit_llr(SF, "en", 256, DSIR_BUCKETS)
    assert llr.dtype == np.int64 and len(llr) == DSIR_BUCKETS
    w = dsir_log_weights(SF).to_pandas().set_index("doc_id")["logw"]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    row = docs.iloc[3]
    from nidaba_ray.functions.dsir import _gram_buckets
    expect = int(llr[_gram_buckets(row["text"], DSIR_BUCKETS)].sum())
    assert w[row["doc_id"]] == expect


def test_grams_contract():
    # ASCII whitespace split, empties dropped, bigram space join
    assert _grams("a  b\tc") == ["a", "b", "c", "a b", "b c"]
    assert _grams("") == []
    assert _grams("solo") == ["solo"]
    # NBSP is NOT a separator (the shared WS_RUN contract)
    assert _grams("a b") == ["a b"]


def test_gumbel_micro_lattice():
    """u is the odd 52-bit lattice — strictly inside (0,1), finite
    Gumbel, and reproducible from the md5 definition."""
    g = _gumbel_micro([0, 1, 2**40])
    assert g.dtype == np.int64 and np.all(np.isfinite(g.astype(float)))
    import hashlib
    h = int.from_bytes(hashlib.md5(b"dsir:1").digest()[:8], "big")
    u = ((h >> 12) * 2 + 1) / 2.0 ** 53
    assert 0.0 < u < 1.0
    expect = int(np.sign(x := -math.log(-math.log(u)))
                 * math.floor(abs(x) * 1e6 + 0.5))
    assert g[1] == expect


def test_fingerprint_md5_parity_offsurface(ray_session):
    """fingerprint_md5 ceded its driver-surface slot to dsir_select
    (round 5); its SQL parity stays pinned here."""
    from nidaba_ray.functions.textops import FINGERPRINT_SQL, fingerprint_md5

    ours = fingerprint_md5(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    theirs = con.execute(FINGERPRINT_SQL).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    assert ours.equals(theirs)


def test_dsir_k_and_param_plumbing(ray_session):
    sel = dsir_selected(SF, k=7, target_lang="zh").to_pandas()
    assert len(sel) == 7
    theirs = _oracle(k=7, target_lang="zh").reset_index(drop=True)
    assert sel.reset_index(drop=True).equals(theirs)

"""Deterministic mixture / stratified sampling — DuckDB parity and
parallelism-invariance (the properties a reproducible training
mixture actually needs)."""

import duckdb
import pandas as pd

from nidaba_ray.pipelines.curate import (
    mixture_sample,
    mixture_sql,
    stratified_sample,
    stratified_sql,
)

SF = "/root/testdata/sf0.001"


def _view(con):
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')")


def test_mixture_sample_sql_parity(ray_session):
    ours = mixture_sample(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    _view(con)
    theirs = con.execute(mixture_sql()).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    assert ours["doc_id"].tolist() == theirs["doc_id"].tolist()
    assert ours["lang"].tolist() == theirs["lang"].tolist()
    # the mixture actually thins the low-rate languages
    full = con.execute(
        "SELECT lang, COUNT(*) c FROM documents GROUP BY lang"
    ).fetchdf().set_index("lang")["c"]
    kept = ours.groupby("lang").size()
    assert kept["en"] == full["en"]          # rate 1.0 keeps all
    assert kept.get("zh", 0) < full["zh"]    # rate 0.125 thins


def test_mixture_rates_respected(ray_session):
    # rate 0 drops a language entirely; unlisted languages drop too
    out = mixture_sample(SF, rates={"en": 0.0, "fr": 1.0}).to_pandas()
    assert set(out["lang"]) == {"fr"}
    con = duckdb.connect()
    _view(con)
    n_fr = con.execute(
        "SELECT COUNT(*) FROM documents WHERE lang='fr'").fetchone()[0]
    assert len(out) == n_fr


def test_stratified_sample_sql_parity(ray_session):
    ours = stratified_sample(SF).to_pandas().sort_values(
        ["lang", "doc_id"]).reset_index(drop=True)
    con = duckdb.connect()
    _view(con)
    theirs = con.execute(stratified_sql()).fetchdf().sort_values(
        ["lang", "doc_id"]).reset_index(drop=True)
    assert ours["doc_id"].tolist() == theirs["doc_id"].tolist()
    assert ours["lang"].tolist() == theirs["lang"].tolist()
    assert (ours.groupby("lang").size() == 40).all()


def test_stratified_small_k_and_layout_invariance(ray_session):
    import ray.data as rd

    from nidaba_ray.pipelines.curate import stratified_over

    a = stratified_sample(SF, k=7).to_pandas().sort_values(
        ["lang", "doc_id"]).reset_index(drop=True)
    assert (a.groupby("lang").size() == 7).all()
    # same set when the input arrives in many small blocks — the
    # PRODUCTION combiner-then-merge must be layout-invariant
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).repartition(13)
    b = (stratified_over(ds, k=7).to_pandas()
         .sort_values(["lang", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_budget_sample_sql_parity(ray_session):
    """Token-budget sampler ≡ the DuckDB window-cumsum replay, on the
    default budgets AND a budget map that exercises every branch
    (excluded lang, tiny budget, whole-language-fits budget)."""
    from nidaba_ray.pipelines.curate import budget_sample, budget_sql

    con = duckdb.connect()
    _view(con)
    for budgets in (None,
                    {"en": 400, "fr": 10_000_000, "de": 37, "zh": 0}):
        ours = budget_sample(SF, budgets).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        theirs = con.execute(budget_sql(budgets)).fetchdf().sort_values(
            "doc_id").reset_index(drop=True)
        assert ours["doc_id"].tolist() == theirs["doc_id"].tolist()
        assert ours["n_tokens"].tolist() == theirs["n_tokens"].tolist()
        assert ours["lang"].tolist() == theirs["lang"].tolist()


def test_budget_sample_budget_respected_and_maximal(ray_session):
    """Kept token mass never exceeds the budget, and the kept prefix
    is MAXIMAL: the next doc in rank order would overflow."""
    import hashlib as _hl

    from nidaba_ray.pipelines.curate import budget_sample

    budgets = {"en": 500, "fr": 1234, "zh": 1}
    out = budget_sample(SF, budgets).to_pandas()
    con = duckdb.connect()
    _view(con)
    all_docs = con.execute(
        "SELECT doc_id, lang, CAST(len(string_split(text,' ')) AS BIGINT)"
        " AS n FROM documents").fetchdf()
    all_docs["k64"] = [
        int.from_bytes(_hl.md5(f"budget:{d}".encode()).digest()[:8], "big")
        for d in all_docs["doc_id"]
    ]
    for lang, b in budgets.items():
        kept = out[out["lang"] == lang]
        assert kept["n_tokens"].sum() <= b
        ordered = all_docs[all_docs["lang"] == lang].sort_values(
            ["k64", "doc_id"])
        cum = ordered["n"].cumsum()
        expect_ids = ordered["doc_id"][cum <= b].tolist()
        assert sorted(kept["doc_id"].tolist()) == sorted(expect_ids)
        # maximality: the first excluded doc would overflow
        if len(expect_ids) < len(ordered):
            nxt = ordered["n"].iloc[len(expect_ids)]
            assert kept["n_tokens"].sum() + nxt > b
    # unlisted languages contribute nothing
    assert set(out["lang"]) <= set(budgets)


def test_budget_sample_layout_invariance(ray_session):
    """Same kept set regardless of block layout (the histogram +
    boundary-bucket plan has no layout dependence)."""
    import ray.data as rd

    from nidaba_ray.pipelines.curate import budget_sample

    a = budget_sample(SF, {"en": 700, "de": 300}).to_pandas()
    ds = budget_sample(SF, {"en": 700, "de": 300})
    b = ds.repartition(13).to_pandas()
    key = lambda df: sorted(map(tuple, df.values.tolist()))
    assert key(a) == key(b)

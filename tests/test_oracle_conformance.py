"""Mirror of the driver's DuckDB-oracle comparison (SURVEY.md §5.2
item 2): for every query with an oracle, run the Ray pipeline and the
SQL on the same parquet tables and compare row count + schema +
order-insensitive values. Runs at sf0.001 for speed; the driver runs
the same contract at sf0.01."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLED = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, ray_session, oracle_con):
    q = entry_mod.queries()[name]
    ray_df = canon(to_df(q(SF_DIR)))
    sql_df = canon(oracle_con.execute(entry_mod.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} != {len(sql_df)} rows"
    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        if pd.api.types.is_float_dtype(a):
            bad = [
                i for i, (x, y) in enumerate(zip(a, b))
                if not (x == y or (math.isnan(x) and math.isnan(y)))
            ]
        else:
            bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
        assert not bad, (
            f"{name}.{c}: {len(bad)} mismatches, first: "
            f"row {bad[0]} ray={a.iloc[bad[0]]!r} sql={b.iloc[bad[0]]!r}"
        )


@pytest.mark.parametrize("qname", [
    "extract_documents_pdf4",   # RC4 V2/R3
    "extract_documents_pdf5",   # AES-128 V4/R4 /AESV2
    "extract_documents_pdf6",   # AES-256 V5/R5 /AESV3
    "extract_documents_docx",   # OOXML zip container (round 5)
    "extract_documents_epub",   # EPUB/OCF multi-chapter container
])
def test_encrypted_dialects_match_oracle(ray_session, oracle_con, qname):
    """The encrypted PDF dialects (off the 50-entry driver surface)
    pass the same byte-identity oracle as the on-surface dialects."""
    from nidaba_ray.pipelines import conformance

    q = getattr(conformance, qname)
    ray_df = canon(to_df(q(SF_DIR)))
    sql_df = canon(oracle_con.execute(conformance.EXTRACT_SQL).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns)
    assert len(ray_df) == len(sql_df)
    for c in ray_df.columns:
        assert (ray_df[c] == sql_df[c]).all(), c


def test_q5_hash_join_fallback_matches(ray_session):
    """The at-scale customer path (orders ⋈ customer as a clamped hash
    join instead of a driver-loaded broadcast map) must be value-equal
    to the default — same deterministic output table."""
    from nidaba_ray.relational.queries import q5_local_supplier_volume

    a = q5_local_supplier_volume(SF_DIR).to_pandas()
    b = q5_local_supplier_volume(SF_DIR, cust_broadcast=False).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_semi_anti_bloom_path_matches_exact(ray_session, monkeypatch):
    """The beyond-broadcast Bloom fallback (prefilter + exact
    verification join) must produce exactly the rows of the default
    broadcast is_in path — forced on by dropping the cutover to 0."""
    from nidaba_ray.relational import queries as q

    want_semi = canon(to_df(q.customers_with_orders(SF_DIR)))
    want_anti = canon(to_df(q.customers_without_orders(SF_DIR)))
    monkeypatch.setattr(q, "_EXACT_BROADCAST_MAX", 0)
    got_semi = canon(to_df(q.customers_with_orders(SF_DIR)))
    got_anti = canon(to_df(q.customers_without_orders(SF_DIR)))
    pd.testing.assert_frame_equal(got_semi, want_semi)
    pd.testing.assert_frame_equal(got_anti, want_anti)


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, ray_session):
    df = to_df(entry_mod.queries()[name](SF_DIR))
    assert df is not None and len(df.columns) > 0


def test_entry_smoke(ray_session):
    ds = entry_mod.entry()
    df = to_df(ds)
    assert len(df) == 500
    assert {"url", "text", "spans", "provenance", "error"} <= set(df.columns)


def test_entry_schema_stable(ray_session):
    """Driver smoke contract: repeated entry() calls yield the same
    schema and row count."""
    a = entry_mod.entry()
    b = entry_mod.entry()
    sa, sb = a.schema(), b.schema()
    assert sa.names == sb.names
    assert [str(t) for t in sa.types] == [str(t) for t in sb.types]
    assert a.count() == b.count() == 500

"""Full Gopher document filter (Rae et al. 2021 §A1.1) — DuckDB
parity for the six SQL-replayable rules, hand-built boundary docs for
every rule, and the composed keep gate."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from nidaba_ray.functions.textops import (
    GOPHER_FLAGS_SQL,
    GOPHER_REPETITION_MAX,
    _doc_repetition,
    gopher_quality_flags,
)

SF = "/root/testdata/sf0.001"

_SQL_FLAGS = ["f_word_count", "f_mean_word_len", "f_symbol_ratio",
              "f_bullet_ellipsis", "f_alpha_words", "f_stopwords"]


def _flags_for(texts):
    """Run the pipeline over crafted docs via a tiny parquet table."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(batch, os.path.join(d, "documents.parquet"))
        return gopher_quality_flags(d).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)


GOOD = ("the cat sat on the mat and it was that good to have "
        "a warm day with sunshine outside near the old stone wall "
        "while birds kept singing their small bright songs over the "
        "quiet green field and nobody wanted to leave before dusk "
        "because everything felt calm and slow and entirely pleasant")


def test_good_doc_keeps(ray_session):
    out = _flags_for([GOOD])
    row = out.iloc[0]
    assert bool(row["keep"]), row
    for f in _SQL_FLAGS + ["f_repetition"]:
        assert bool(row[f]), f


@pytest.mark.parametrize("text,flag", [
    ("short doc with the and of", "f_word_count"),        # < 50 words
    (" ".join(["a"] * 60) + " the of", "f_mean_word_len"),  # mwl < 3
    (" ".join(["supercalifragilistic"] * 60) + " the of",
     "f_mean_word_len"),                                   # mwl > 10
    (GOOD + " " + " ".join(["#"] * 20), "f_symbol_ratio"),
    ("\n".join(["- " + w for w in GOOD.split()]), "f_bullet_ellipsis"),
    ("\n".join([w + "..." for w in GOOD.split()]), "f_bullet_ellipsis"),
    (GOOD + " " + " ".join(["123"] * 60), "f_alpha_words"),
    (" ".join(f"w{i}" for i in range(60)), "f_stopwords"),
])
def test_each_rule_rejects(ray_session, text, flag):
    out = _flags_for([text])
    row = out.iloc[0]
    assert not bool(row[flag]), (flag, row)
    assert not bool(row["keep"])


def test_repetition_gate(ray_session):
    # one line repeated everywhere → dup_line_frac = 1 > 0.30
    spam = "\n".join(["the cat and the dog have fun with all of it"] * 40)
    out = _flags_for([spam])
    assert not bool(out.iloc[0]["f_repetition"])
    assert not bool(out.iloc[0]["keep"])
    # reference counter agrees with the flag decision
    rep = np.round(_doc_repetition(spam), 6)
    names = list(GOPHER_REPETITION_MAX)
    assert any(rep[i] > GOPHER_REPETITION_MAX[names[i]]
               for i in range(len(names)))


def test_sql_parity_on_corpus(ray_session):
    ours = gopher_quality_flags(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')")
    theirs = con.execute(GOPHER_FLAGS_SQL).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    assert len(ours) == len(theirs) > 0
    assert ours["doc_id"].tolist() == theirs["doc_id"].tolist()
    assert ours["n_words"].tolist() == theirs["n_words"].tolist()
    for f in _SQL_FLAGS:
        mism = (ours[f].astype(bool) != theirs[f].astype(bool)).sum()
        assert mism == 0, f"{f}: {mism} mismatches"


def test_keep_is_conjunction(ray_session):
    out = gopher_quality_flags(SF).to_pandas()
    flags = out[_SQL_FLAGS + ["f_repetition"]].astype(bool)
    assert (out["keep"].astype(bool) == flags.all(axis=1)).all()


def test_clean_gopher_registry_stage(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from nidaba_ray.stages import registry

    assert "clean.gopher" in registry.list_stages()
    spam = "\n".join(["the cat and the dog have fun with all of it"] * 40)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([GOOD, spam], pa.string()),
                  "extra": pa.array(["a", "b"], pa.string())})
    pq.write_table(t, str(tmp_path / "p.parquet"))
    out = registry.compile_pipeline(
        rd.read_parquet(str(tmp_path / "p.parquet")),
        [{"stage": "clean.gopher"}]).to_pandas()
    # rejected doc dropped; survivor passes through with all columns
    assert out["doc_id"].tolist() == [1]
    assert out["extra"].tolist() == ["a"]


def test_unicode_whitespace_parity(ray_session, tmp_path):
    """NBSP/Unicode-space docs must tokenize identically on both
    sides (review find: python str.split() splits Unicode whitespace,
    DuckDB's RE2 \\s does not — the shared explicit ASCII class is
    the contract)."""
    import pyarrow.parquet as pq

    from nidaba_ray.functions.textops import (
        C4_FILTERED_SQL,
        c4_filtered,
        gopher_quality_flags,
    )

    nbsp_doc = ("the cat sat on the mat and it was that "
                "good to have a warm day " * 8)
    nbsp_lines = "\n".join(
        ["five words joined by nbsp here stay strong."] * 5)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([nbsp_doc, nbsp_lines], pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    ours = gopher_quality_flags(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    theirs = con.execute(GOPHER_FLAGS_SQL).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    assert ours["n_words"].tolist() == theirs["n_words"].tolist()
    for f in _SQL_FLAGS:
        assert (ours[f].astype(bool).tolist()
                == theirs[f].astype(bool).tolist()), f
    ours_c4 = c4_filtered(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    theirs_c4 = con.execute(C4_FILTERED_SQL).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    assert ours_c4["doc_id"].tolist() == theirs_c4["doc_id"].tolist()
    assert ours_c4["text"].tolist() == theirs_c4["text"].tolist()


# --------------------------------------------------------------- C4


def test_c4_line_rules(ray_session):
    from nidaba_ray.functions.textops import _c4_clean

    doc = "\n".join([
        "This line survives because it is long enough.",   # keep
        "Too short to keep.",                              # <5 words
        "No terminal punctuation so this one goes",        # no punct
        "Enable JavaScript to view this content please.",  # javascript
        'He said "use five or more words here."',          # keep (")
        "Another perfectly normal sentence ends right here.",  # keep
    ])
    new_text, keep = _c4_clean(pd.Series([doc]))
    assert keep[0]
    assert new_text.iloc[0].split("\n") == [
        "This line survives because it is long enough.",
        'He said "use five or more words here."',
        "Another perfectly normal sentence ends right here.",
    ]


def test_c4_doc_rules(ray_session):
    from nidaba_ray.functions.textops import _c4_clean

    two_lines = ("One surviving sentence is right here.\n"
                 "And a second surviving sentence follows.")
    lorem = "\n".join(["A fine sentence stays right here today."] * 4
                      ) + "\nLorem Ipsum dolor sit amet."
    braces = "\n".join(["A fine sentence stays right here today."] * 4
                       ) + "\nfunction() { return; }"
    _, keep = _c4_clean(pd.Series([two_lines, lorem, braces]))
    assert keep.tolist() == [False, False, False]


def test_c4_sql_parity(ray_session, tmp_path):
    # the synthetic corpus has no terminal punctuation (everything is
    # filtered — checked below), so byte parity runs over a crafted
    # mixed corpus with survivors, partial rewrites and rejects
    import pyarrow.parquet as pq

    from nidaba_ray.functions.textops import C4_FILTERED_SQL, c4_filtered

    rng = np.random.default_rng(11)
    texts = []
    for i in range(120):
        lines = []
        for j in range(int(rng.integers(1, 9))):
            w = [f"word{k}" for k in range(int(rng.integers(2, 9)))]
            tail = ["nothing", ".", "!", '?"', " and JavaScript.",
                    ""][int(rng.integers(0, 6))]
            lines.append(" ".join(w) + tail)
        if i % 17 == 0:
            lines.append("this page has lorem ipsum inside it.")
        if i % 23 == 0:
            lines.append("var x = { a: 1 };")
        texts.append("\n".join(lines))
    t = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    ours = c4_filtered(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')")
    theirs = con.execute(C4_FILTERED_SQL).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    assert len(theirs) > 10  # the crafted corpus has real survivors
    assert ours["doc_id"].tolist() == theirs["doc_id"].tolist()
    assert ours["text"].tolist() == theirs["text"].tolist()  # bytes

    # and the real corpus: both sides agree it is entirely rejected
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')")
    assert len(con2.execute(C4_FILTERED_SQL).fetchdf()) == 0
    assert c4_filtered(SF).count() == 0


def test_clean_c4_registry_stage(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from nidaba_ray.stages import registry

    assert "clean.c4" in registry.list_stages()
    good = "\n".join(["A fine sentence stays right here today."] * 4)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([good, "short"], pa.string()),
                  "extra": pa.array(["a", "b"], pa.string())})
    pq.write_table(t, str(tmp_path / "p.parquet"))
    out = registry.compile_pipeline(
        rd.read_parquet(str(tmp_path / "p.parquet")),
        [{"stage": "clean.c4"}]).to_pandas()
    assert out["doc_id"].tolist() == [1]
    assert out["extra"].tolist() == ["a"]
    assert out["text"].iloc[0] == good


def test_training_data_clean_spec(ray_session, tmp_path):
    """The composed WET-style cleaning spec (C4 → Gopher → PII)
    compiles and runs end-to-end through the registry over a raw
    line-structured corpus."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from nidaba_ray.stages import registry

    keepable = "\n".join([
        "The harbor opened early and the fishermen hauled their nets.",
        "A warm wind moved across the water while gulls circled above.",
        "Merchants stacked crates of salted fish beside the old pier.",
        "Children watched the boats return with their morning catch.",
        "By noon the market was loud with bargaining and laughter.",
        "An old captain told stories that nobody quite believed.",
        "Evening light settled over the rooftops of the small town.",
        "Everyone agreed the season had been generous to have here.",
    ])
    spam = "\n".join(["the cat and the dog have fun with all of it."] * 40)
    short = "Too few surviving lines to pass here."
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([keepable, spam, short], pa.string())}),
        str(tmp_path / "documents.parquet"))
    spec = registry.load_spec("examples/training_data_clean.yaml")
    ds = rd.read_parquet(str(tmp_path / "documents.parquet"))
    out = registry.compile_pipeline(ds, spec).to_pandas()
    # the prose doc survives every gate byte-identically; the spam doc
    # dies at the Gopher repetition rule; the short doc at the C4
    # three-line page gate
    assert out["doc_id"].tolist() == [1]
    assert out["text"].iloc[0] == keepable


# ---------------------------------------------------------- FineWeb


def test_fineweb_each_rule():
    from nidaba_ray.functions.textops import _fineweb_signals

    long_punct = ("This is a long enough sentence that ends in a "
                  "period and stays.")
    ok = "\n".join([long_punct + f" Variant {i}." for i in range(10)])
    no_punct = "\n".join([f"line {i} with no terminal punctuation at "
                          "all and plenty of words" for i in range(10)])
    dup = "\n".join([long_punct] * 9 + ["One unique closing line "
                                        "stays right here today."])
    short = "\n".join([f"tiny {i}." for i in range(9)] + [long_punct])
    sig = _fineweb_signals(pd.Series([ok, no_punct, dup, short]))
    assert sig["keep"].tolist() == [True, False, False, False]
    assert not sig["f_punct_lines"][1]
    assert not sig["f_dup_line_chars"][2]
    assert not sig["f_short_lines"][3]


def test_fineweb_sql_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from nidaba_ray.functions.textops import (
        FINEWEB_FLAGS_SQL,
        fineweb_quality_flags,
    )

    rng = np.random.default_rng(5)
    texts = []
    for i in range(150):
        lines = []
        for j in range(int(rng.integers(1, 10))):
            w = [f"w{k}" for k in range(int(rng.integers(1, 14)))]
            tail = [".", "!", "", "", '?"'][int(rng.integers(0, 5))]
            line = " ".join(w) + tail
            lines.append(line)
            if rng.integers(0, 3) == 0:
                lines.append(line)  # force duplicated lines
        texts.append("\n".join(lines))
    t = pa.table({"doc_id": pa.array(range(150), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    ours = fineweb_quality_flags(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')")
    theirs = con.execute(FINEWEB_FLAGS_SQL).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    assert ours["doc_id"].tolist() == theirs["doc_id"].tolist()
    for f in ["f_punct_lines", "f_dup_line_chars", "f_short_lines"]:
        mism = (ours[f].astype(bool) != theirs[f].astype(bool)).sum()
        assert mism == 0, f"{f}: {mism} mismatches"
        assert 0 < ours[f].astype(bool).sum() < len(ours), f  # mixed
    assert (ours["keep"].astype(bool)
            == ours[["f_punct_lines", "f_dup_line_chars",
                     "f_short_lines"]].astype(bool).all(axis=1)).all()


def test_clean_fineweb_registry_stage(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from nidaba_ray.stages import registry

    assert "clean.fineweb" in registry.list_stages()
    good = "\n".join([f"A good long sentence number {i} that ends "
                      "with a period right here." for i in range(6)])
    bad = "\n".join(["no punct here at all"] * 6)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([good, bad], pa.string()),
                  "extra": pa.array(["a", "b"], pa.string())})
    pq.write_table(t, str(tmp_path / "p.parquet"))
    out = registry.compile_pipeline(
        rd.read_parquet(str(tmp_path / "p.parquet")),
        [{"stage": "clean.fineweb"}]).to_pandas()
    assert out["doc_id"].tolist() == [1]
    assert out["extra"].tolist() == ["a"]


def test_deterministic(ray_session):
    a = gopher_quality_flags(SF).to_pandas().sort_values("doc_id")
    b = gopher_quality_flags(SF).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


# ------------------------------------------- FineWeb line rewrite


def test_fineweb_rewrite_kernel():
    from nidaba_ray.functions.textops import _terminal_punct_rewrite

    texts = pd.Series([
        "Keeps this line.\nnav > home > products\nAnd this one too!",
        "no terminal punctuation anywhere\nstill none",
        'Quoted line stays."\nQuestion stays?\ntrailing junk',
        "",
    ])
    new, keep = _terminal_punct_rewrite(texts)
    assert keep.tolist() == [True, False, True, False]
    assert new.iloc[0] == "Keeps this line.\nAnd this one too!"
    assert new.iloc[2] == 'Quoted line stays."\nQuestion stays?'
    # empty/no-survivor docs rewrite to "" and are dropped by the mask
    assert new.iloc[1] == "" and new.iloc[3] == ""


def test_fineweb_rewrite_sql_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from nidaba_ray.functions.textops import (
        FINEWEB_REWRITE_SQL,
        fineweb_rewritten,
    )

    rng = np.random.default_rng(11)
    texts = []
    for i in range(150):
        lines = []
        for j in range(int(rng.integers(0, 8))):
            w = [f"w{k}" for k in range(int(rng.integers(0, 9)))]
            tail = [".", "!", "", '?"', '"', " "][int(rng.integers(0, 6))]
            lines.append(" ".join(w) + tail)
        texts.append("\n".join(lines))
    t = pa.table({"doc_id": pa.array(range(150), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    ours = fineweb_rewritten(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')")
    theirs = con.execute(FINEWEB_REWRITE_SQL).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    # byte parity: same surviving docs, identical rewritten text
    assert ours["doc_id"].tolist() == theirs["doc_id"].tolist()
    assert ours["text"].tolist() == theirs["text"].tolist()
    assert 0 < len(ours) < 150  # both drop and keep happen


def test_clean_fineweb_rewrite_registry_stage(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from nidaba_ray.stages import registry

    assert "clean.fineweb_rewrite" in registry.list_stages()
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(
                      ["Good line.\nmenu item\nAnother good one!",
                       "breadcrumb\nnav"], pa.string()),
                  "extra": pa.array(["a", "b"], pa.string())})
    pq.write_table(t, str(tmp_path / "p.parquet"))
    out = registry.compile_pipeline(
        rd.read_parquet(str(tmp_path / "p.parquet")),
        [{"stage": "clean.fineweb_rewrite"}]).to_pandas()
    assert out["doc_id"].tolist() == [1]
    assert out["text"].iloc[0] == "Good line.\nAnother good one!"
    assert out["extra"].tolist() == ["a"]


# --- compression-ratio signal (Dolma/RefinedWeb gzip heuristic) ---


def test_compression_ratio_bands(ray_session, tmp_path):
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nidaba_ray.functions.compat import round_like_sql
    from nidaba_ray.functions.textops import compression_ratio

    docs = {
        1: "spam " * 400,                      # hyper-repetitive
        2: ("The harbor report covers tides, moorings and the "
            "seasonal dredging plan in plain prose sentences."),
        3: __import__("hashlib").md5(b"x").hexdigest() * 1
           + "".join(__import__("hashlib").md5(str(i).encode())
                     .hexdigest() for i in range(40)),  # entropy-dense
        4: "",
        5: "ab",                                # overhead > payload
    }
    p = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()), pa.string())}),
        str(p))
    out = compression_ratio(str(tmp_path)).to_pandas().set_index("doc_id")
    # independent recompute
    for did, text in docs.items():
        raw = text.encode()
        want = 1.0 if not raw else round(
            float(round_like_sql(
                __import__("numpy").array(
                    [len(zlib.compress(raw, 6)) / len(raw)]), 6)[0]), 6)
        assert out.loc[did, "compression_ratio"] == want
    assert bool(out.loc[1, "f_too_compressible"])       # repetitive
    assert not bool(out.loc[2, "f_too_compressible"])   # normal prose
    assert not bool(out.loc[2, "f_incompressible"])
    assert out.loc[3, "compression_ratio"] > 0.5        # entropy-dense
    assert not bool(out.loc[3, "f_too_compressible"])
    assert out.loc[4, "compression_ratio"] == 1.0       # empty
    assert bool(out.loc[5, "f_incompressible"])         # overhead tail

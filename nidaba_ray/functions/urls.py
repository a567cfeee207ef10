"""URL canonicalization and canonical-URL re-crawl dedup — the key
operations a Common-Crawl-style pages table needs before any URL-level
grouping (the reference keys batches by storage path; a web corpus
keys by URL, and raw URLs alias: tracking params, case-variant hosts,
default ports, fragments).

Canonicalization contract (RAW-TEXT transforms only — no percent
decoding, no IDNA, no dot-segment resolution; every step is a single
well-defined string/regex op that DuckDB replays byte-exactly):

1. non-URL strings (no ``scheme://``) pass through unchanged;
2. the fragment is stripped;
3. scheme and authority are lowercased (the whole authority — rare
   userinfo is lowercased too, a documented simplification);
4. default ports drop (``:80`` for http, ``:443`` for https);
5. an empty path becomes ``/``;
6. query params split on ``&``: empties and tracking params
   (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``ref``,
   ``ref_src``) drop, the rest SORT bytewise and rejoin; an
   all-dropped query loses its ``?``.

Dot segments are deliberately preserved: resolving them can change
which resource a URL names when servers treat paths literally, and
the iterated rewrite is the one step plain RE2 (no lookahead — the
regex engine both numpy-side Python and DuckDB share) cannot express
as a single pass.

Determinism: canonical form is a pure per-string function; the dedup
winner per canonical key is the total order (warc_ts desc, url asc) —
byte-identical across runs, layouts and parallelism levels.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from nidaba_ray.util import join_partitions

__all__ = ["url_canonicalize", "canon_url_column", "url_dedup_latest",
           "url_canon_sql", "url_dedup_sql"]

_URL_RE = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$",
    re.S,
)
_TRACKING_RE = re.compile(r"^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)(=|$)")

_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"
_ASCII_FOLD = str.maketrans(_UPPER, _LOWER)
"""ASCII-ONLY case fold — NOT str.lower(): Unicode lowering diverges
between Python and DuckDB (U+0130 'İ' → 'i'+U+0307 in Python but
plain 'i' in DuckDB), which would break the byte-exact oracle parity;
hostnames on the wire are ASCII (IDNA) and anything else is left
untouched identically on both sides."""


def url_canonicalize(url: str) -> str:
    m = _URL_RE.match(url or "")
    if not m:
        return url
    scheme = m.group(1).translate(_ASCII_FOLD)
    auth = m.group(2).translate(_ASCII_FOLD)
    path = m.group(3)
    query = m.group(4)
    if scheme == "http" and auth.endswith(":80"):
        auth = auth[:-3]
    elif scheme == "https" and auth.endswith(":443"):
        auth = auth[:-4]
    if path == "":
        path = "/"
    out = f"{scheme}://{auth}{path}"
    if query is not None:
        params = sorted(
            p for p in query.split("&")
            if p and not _TRACKING_RE.match(p)
        )
        if params:
            out += "?" + "&".join(params)
    return out


# conservative already-canonical prescreen: a row the Python kernel
# could possibly CHANGE contains an uppercase ASCII letter, a query or
# fragment, a (possibly default) :80/:443 port, or has no path slash
# after the authority. Everything else is provably a fixpoint of
# url_canonicalize, so the vectorized RE2 pass lets clean corpora
# (most crawl urls are already lowercase, query-free) skip the
# per-row kernel entirely — the clean.mojibake fast-path pattern.
_NEEDS_WORK_RE = (
    r"[A-Z?#]|:80|:443|^[a-z][a-z0-9+.\-]*://[^/]*$"
)


def canon_url_column(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-batch canonical form — vectorized prescreen + the scalar
    kernel over only the rows it could change."""
    flagged = pc.match_substring_regex(urls, _NEEDS_WORK_RE)
    if not pc.any(flagged).as_py():
        out = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) \
            else urls
        return out.cast(pa.string())
    flags = flagged.to_pylist()
    return pa.array(
        [
            url_canonicalize(u) if (f and u is not None) else u
            for u, f in zip(urls.to_pylist(), flags)
        ],
        pa.string(),
    )


def url_canon_sql(col: str) -> str:
    """The canonicalization contract as one (nested) DuckDB scalar
    expression over column ``col`` — byte-exact vs
    :func:`url_canonicalize` (pinned in tests over crafted URLs)."""
    nofrag = f"regexp_replace({col}, '#.*$', '', 's')"
    # translate() = the same ASCII-only case fold as _ASCII_FOLD
    # (DuckDB lower() is Unicode-aware and diverges on e.g. U+0130)
    scheme = (f"translate(regexp_extract({nofrag},"
              " '^([A-Za-z][A-Za-z0-9+.-]*)://', 1),"
              f" '{_UPPER}', '{_LOWER}')")
    auth = (f"translate(regexp_extract({nofrag},"
            " '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),"
            f" '{_UPPER}', '{_LOWER}')")
    path = (f"regexp_extract({nofrag},"
            " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)")
    query = f"regexp_extract({nofrag}, '\\?([^#]*)', 1)"
    has_q = f"position('?' IN {nofrag}) > 0"
    auth2 = (
        f"CASE WHEN {scheme} = 'http' AND {auth} LIKE '%:80' "
        f"THEN left({auth}, length({auth}) - 3) "
        f"WHEN {scheme} = 'https' AND {auth} LIKE '%:443' "
        f"THEN left({auth}, length({auth}) - 4) ELSE {auth} END"
    )
    path2 = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        "x -> x <> '' AND NOT regexp_matches(x, "
        "'^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)(=|$)')))"
    )
    tail = (
        f"CASE WHEN {has_q} AND len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END"
    )
    return (
        f"CASE WHEN NOT regexp_matches({col}, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://') "
        f"THEN {col} ELSE {scheme} || '://' || {auth2} || {path2} "
        f"|| {tail} END"
    )


def url_dedup_latest(pages: rd.Dataset) -> rd.Dataset:
    """Re-crawl dedup over a pages Dataset: one surviving row per
    CANONICAL url — the latest capture (max warc_ts), raw-url
    lexicographic tie-break.

    Shape: ONE narrow grouped pass + ONE payload join. The winner per
    canonical url is the group MINIMUM of a composite sortable key —
    ``zero-pad-20(2^62 − ts_us) + '|' + url`` — whose lexicographic order
    IS (warc_ts desc, url asc): the fixed-width numeric prefix decides
    by inverted timestamp, equal prefixes fall through to the raw url.
    That collapses the earlier max-ts aggregate → join-back → min-url
    aggregate chain (measured 2× the total cost at 200k pages) into a
    single ``Min``; page PAYLOADS (html/text) then cross the wire once
    in the final hash join.

    Precondition (WARC capture semantics, asserted nowhere by design):
    ``(url, warc_ts)`` identifies a capture — two payloads under the
    same raw url AND the same timestamp would both survive here while
    the SQL window keeps one."""
    from ray.data.aggregate import Min

    def add_canon(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "canon_url", canon_url_column(batch["url"])
        )

    with_canon = pages.map_batches(add_canon, batch_format="pyarrow")

    def narrow(batch: pa.Table) -> pa.Table:
        # int64 epoch-micros (Ray aggregates coarsen raw timestamp
        # columns to seconds), inverted against 2^62 so ascending
        # strings mean descending time; zero-padded to 20 digits so
        # lexicographic == numeric even for pre-1970 (negative) ts,
        # where 2^62 - ts exceeds 19 digits
        ts = pc.cast(batch["warc_ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        urls = batch["url"].to_pylist()
        k = [f"{(2**62) - int(t):020d}|{u}" for t, u in zip(ts, urls)]
        return pa.table(
            {
                "canon_url": batch["canon_url"],
                "k": pa.array(k, pa.string()),
            }
        )

    keys = with_canon.map_batches(narrow, batch_format="pyarrow").materialize()
    # empty-aggregate-partition join hazard guard (the
    # embedding_near_dup_scalable precedent): grouped outputs carry
    # schema-LESS empty blocks when groups < partitions, and a
    # schema-less block poisons the join's schema broadcast — clamp
    # partitions to the key count and repartition the aggregate
    parts = max(1, min(join_partitions(8), keys.count()))
    winner_keys = keys.groupby("canon_url").aggregate(
        Min("k", alias_name="win_k")
    ).repartition(parts).materialize()
    # join the winning key back to the full rows; a page row wins iff
    # its OWN composite key equals the group minimum (ts and url match
    # together — an older capture of the winning raw url cannot win)
    def keep_winners(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["warc_ts"], pa.int64()).to_numpy(zero_copy_only=False)
        urls = t["url"].to_pylist()
        k = pa.array(
            [f"{(2**62) - int(x):020d}|{u}" for x, u in zip(ts, urls)],
            pa.string(),
        )
        return t.filter(pc.equal(k, t["win_k"])).drop_columns(["win_k"])

    return with_canon.join(
        winner_keys, "inner", parts, on=("canon_url",)
    ).map_batches(keep_winners, batch_format="pyarrow")


def url_dedup_stage(ds: rd.Dataset, keep_canon: bool = False) -> rd.Dataset:
    """Registry form (``dedup.url_latest``, the first DATASET-LEVEL
    stage — a grouped global op one map_batches cannot express).
    Schema-preserving by default so it composes ahead of the
    extraction chain; ``keep_canon=True`` keeps the canonical-url
    lineage column."""
    out = url_dedup_latest(ds)
    if not keep_canon:
        out = out.map_batches(
            lambda t: t.drop_columns(["canon_url"]), batch_format="pyarrow"
        )
    return out


def url_dedup_sql(pages_glob: str) -> str:
    """DuckDB replay of :func:`url_dedup_latest` over a pages parquet
    glob — canonical expression + one window."""
    canon = url_canon_sql("url")
    return f"""
SELECT * EXCLUDE (rn) FROM (
  SELECT p.*, {canon} AS canon_url,
         ROW_NUMBER() OVER (PARTITION BY {canon}
                            ORDER BY warc_ts DESC, url ASC) AS rn
  FROM read_parquet('{pages_glob}') p
) WHERE rn = 1
"""

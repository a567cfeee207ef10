"""Creative-Commons license detection + license-aware curation gate.

License-aware corpus construction is a first-class training-data
operation (the public Common-Pile / C4-variant recipes keep only
documents whose page declares a permissive license). The detector
here is the standard web heuristic: the FIRST ``creativecommons.org``
license URL in the raw page bytes, normalized to an SPDX-ish slug
(``cc-by-4.0``, ``cc-by-nc-sa-3.0``, ``cc0-1.0``, ``publicdomain``).

Scale/parity notes, same contract as the PII scrubber
(:mod:`nidaba_ray.functions.scrub`):

* The extract pattern is RE2 with an inline ``(?i)`` flag and runs
  DIRECTLY on the binary ``html`` column (``pc.extract_regex`` has a
  binary kernel) — no decode pass, no Python per-row loop, no state,
  no shuffle. License URLs are pure ASCII so byte-level matching is
  encoding-proof (UTF-8, latin-1, even mid-binary); only the matched
  ASCII group is cast to string.
* DuckDB's ``regexp_extract`` is also RE2; the pytest oracle checks
  byte parity of the SAME pattern string and the SAME ordered
  replacement list on both engines (tests/test_license.py).
* Gzip-compressed payloads scan as no-license by construction — run
  the stage after inflate (the extraction chain's sniff) when the
  corpus carries per-record gzip, exactly like every other raw-bytes
  annotator here.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = [
    "CC_LICENSE_PATTERN",
    "LICENSE_REPLACEMENTS",
    "PERMISSIVE_LICENSES",
    "annotate_license_batch",
    "license_filter_batch",
    "license_expr_sql",
    "license_counts",
    "license_counts_sql",
]

# (?i): hosts are case-insensitive and CC paths appear uppercased in
# the wild; the version is any single-digit major.minor. Named group
# so Arrow returns a struct field; DuckDB reads the same group by
# index 1.
CC_LICENSE_PATTERN = (
    r"(?i)creativecommons\.org/"
    r"(?P<lic>licenses/(?:by|by-sa|by-nd|by-nc|by-nc-sa|by-nc-nd)"
    r"/[0-9]\.[0-9]|publicdomain/(?:zero|mark)/1\.0)"
)

# ordered (find, replace) over the LOWERED extracted group — applied
# identically on both engines, so publicdomain paths must rewrite
# before the generic "licenses/" prefix and the slash collapse.
LICENSE_REPLACEMENTS: tuple[tuple[str, str], ...] = (
    ("publicdomain/zero/1.0", "cc0-1.0"),
    ("publicdomain/mark/1.0", "publicdomain"),
    ("licenses/", "cc-"),
    ("/", "-"),
)

# the gate's default allow-set: public-domain marks plus the two CC
# families that permit commercial reuse and derivatives (NC and ND
# variants stay out; versions per the pattern's single-digit grid).
PERMISSIVE_LICENSES: tuple[str, ...] = tuple(
    ["cc0-1.0", "publicdomain"]
    + [f"cc-by-{v}" for v in ("1.0", "2.0", "2.5", "3.0", "4.0")]
    + [f"cc-by-sa-{v}" for v in ("1.0", "2.0", "2.5", "3.0", "4.0")]
)


def detect_license(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Normalized license slug per value ('' = none found). Accepts a
    string OR binary column; the extraction is leftmost-match, the
    normalization is the shared replacement list."""
    lic = pc.struct_field(pc.extract_regex(col, CC_LICENSE_PATTERN), "lic")
    if pa.types.is_binary(lic.type) or pa.types.is_large_binary(lic.type):
        lic = pc.cast(lic, pa.string())  # matched group is pure ASCII
    lic = pc.ascii_lower(pc.fill_null(lic, ""))
    for find, repl in LICENSE_REPLACEMENTS:
        lic = pc.replace_substring(lic, pattern=find, replacement=repl)
    return lic


def annotate_license_batch(batch: pa.Table, column: str = "html") -> pa.Table:
    """Registry stage (``extract.license``): append a ``license``
    column with the normalized slug ('' when the page declares no CC
    license). Pure streaming annotator — one fixed-width string per
    row, no shuffle, binary-safe."""
    return batch.append_column("license", detect_license(batch[column]))


def license_filter_batch(
    batch: pa.Table, column: str = "html",
    allow: tuple[str, ...] = PERMISSIVE_LICENSES,
) -> pa.Table:
    """Registry cleaning stage (``clean.license``): keep only rows
    whose detected license is in ``allow`` (the license-required
    curation shape — unlicensed pages drop). When the batch already
    carries a ``license`` column (an upstream ``extract.license``),
    it is reused instead of re-scanning."""
    lic = (batch["license"] if "license" in batch.column_names
           else detect_license(batch[column]))
    keep = pc.is_in(lic, value_set=pa.array(sorted(allow), pa.string()))
    return batch.filter(pc.fill_null(keep, False))


def license_expr_sql(column: str = "html") -> str:
    """DuckDB expression equivalent to :func:`detect_license` — built
    from the SAME pattern and replacement list so the two sides cannot
    drift. ``column`` must be a VARCHAR on the SQL side (DuckDB's
    regexp functions don't take BLOBs; parity tests feed both engines
    the same strings)."""
    p = CC_LICENSE_PATTERN.replace("'", "''")
    expr = f"LOWER(regexp_extract({column}, '{p}', 1))"
    for find, repl in LICENSE_REPLACEMENTS:
        expr = f"replace({expr}, '{find}', '{repl}')"
    return expr


# doc_id % 9 → the page's declared license URL ('' = none). The URL
# forms deliberately vary scheme, host case, path case and trailing
# segments so the detector's (?i) + leftmost-match contract is
# exercised by the corpus itself, not just by unit pins.
LICENSE_URL_GRID: tuple[tuple[str, str], ...] = (
    ("", ""),
    ("cc-by-4.0", "https://CreativeCommons.org/licenses/by/4.0/"),
    ("cc-by-sa-3.0", "http://creativecommons.org/licenses/by-sa/3.0/deed.en"),
    ("", ""),
    ("cc0-1.0", "https://creativecommons.org/publicdomain/zero/1.0/"),
    ("cc-by-nc-4.0", "https://creativecommons.org/LICENSES/BY-NC/4.0/"),
    ("publicdomain", "//creativecommons.org/publicdomain/mark/1.0/"),
    ("cc-by-nc-nd-2.5", "https://creativecommons.org/licenses/by-nc-nd/2.5/"),
    ("", ""),
)


def license_pages(sf_dir: str) -> rd.Dataset:
    """(doc_id, html) pages whose footer declares the grid license for
    ``doc_id % 9`` — a deterministic generator (pure function of
    doc_id + documents.text), so the license rollup's oracle can
    replay the ASSIGNMENT in SQL without replaying the scanner (the
    streaming_extract_stats promotion idiom: the source generator is
    the replayable half, the Ray side really scans bytes)."""

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        html = []
        for doc_id, text in zip(ids, texts):
            _, url = LICENSE_URL_GRID[int(doc_id) % 9]
            footer = (
                f'<footer><a rel="license" href="{url}">license</a></footer>'
                if url else "<footer>all rights reserved</footer>"
            )
            html.append(
                f"<html><body><p>{text}</p>{footer}</body></html>".encode()
            )
        return pa.table({"doc_id": batch["doc_id"],
                         "html": pa.array(html, pa.binary())})

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(build, batch_format="pyarrow")


def license_counts(sf_dir: str) -> pa.Table:
    """Corpus rollup: documents per detected license slug over the
    deterministic license-page corpus. Shaped like a queries() entry:
    partial counts inside map_batches, one tiny groupby at the end."""
    pages = license_pages(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        lic = detect_license(batch["html"])
        counts = pc.value_counts(lic)
        return pa.table({
            "license": counts.field("values"),
            "n": pc.cast(counts.field("counts"), pa.int64()),
        })

    from ray.data.aggregate import Sum

    out = (
        pages.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .groupby("license")
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
        .sort_values("license")
        .reset_index(drop=True)
        .astype({"license": "string", "n_docs": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def license_counts_sql() -> str:
    """Oracle for :func:`license_counts`: replays the GENERATOR's
    doc_id % 9 license assignment (never the byte scanner — the Ray
    side genuinely extracts URLs from page bytes, the SQL side knows
    what the generator planted; matching counts prove the scan)."""
    cases = " ".join(
        f"WHEN {i} THEN '{slug}'"
        for i, (slug, _) in enumerate(LICENSE_URL_GRID) if slug
    )
    return (
        f"SELECT CASE doc_id % 9 {cases} ELSE '' END AS license, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents "
        "GROUP BY 1 ORDER BY license"
    )

"""Image–text pair harvesting — ``<img src alt>`` extraction from raw
pages (the LAION-style front door for image-text dataset
construction: the alt text is the caption candidate).

Contract kept deliberately regex-expressible (the urls.py precedent)
so DuckDB replays it byte-for-byte: img tags found by ONE RE2
pattern, src/alt read from double- or single-quoted attribute values
(unquoted values are skipped — they are rare and their grammar is
delimiter-ambiguous); an empty value counts as missing; pairs emit in
document order with a per-page pair index. Pages decode latin-1
(lossless byte→char, ASCII attribute syntax is encoding-proof).

Scale notes: one compiled-pattern pass per page inside map_batches —
flat-map shape (pages in, ≥0 narrow pair rows out), no state, no
shuffle; payloads never leave the stage."""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data as rd

__all__ = ["IMG_TAG_PATTERN", "SRC_PATTERN", "ALT_PATTERN",
           "harvest_img_batch", "image_text_pairs", "image_text_sql"]

# [\t\n\f\r />] after "img" keeps <imgx …> from matching; RE2-safe on
# both engines, (?i) inline
IMG_TAG_PATTERN = r"(?i)<img[\t\n\f\r />][^>]*>"
SRC_PATTERN = r"(?i)[\t\n\f\r /]src\s*=\s*(?:\"([^\"]*)\"|'([^']*)')"
ALT_PATTERN = r"(?i)[\t\n\f\r /]alt\s*=\s*(?:\"([^\"]*)\"|'([^']*)')"

_TAG_RE = re.compile(IMG_TAG_PATTERN)
_SRC_RE = re.compile(SRC_PATTERN)
_ALT_RE = re.compile(ALT_PATTERN)


def _attr(tag: str, rx: re.Pattern) -> str:
    m = rx.search(tag)
    if not m:
        return ""
    return m.group(1) if m.group(1) is not None else (m.group(2) or "")


def harvest_img_batch(batch: pa.Table, html_col: str = "html",
                      key_col: str = "url") -> pa.Table:
    """map_batches kernel: pages → (key, pair_idx, img_src, alt_text)
    rows, one per <img> with a non-empty quoted src."""
    keys, idxs, srcs, alts = [], [], [], []
    for key, payload in zip(batch[key_col].to_pylist(),
                            batch[html_col].to_pylist()):
        if isinstance(payload, (bytes, bytearray)):
            text = bytes(payload).decode("latin-1")
        else:
            text = payload or ""
        n = 0
        for m in _TAG_RE.finditer(text):
            tag = m.group(0)
            src = _attr(tag, _SRC_RE)
            if not src:
                continue
            keys.append(key)
            idxs.append(n)
            srcs.append(src)
            alts.append(_attr(tag, _ALT_RE))
            n += 1
    return pa.table({
        key_col: pa.array(keys, pa.string()),
        "pair_idx": pa.array(idxs, pa.int64()),
        "img_src": pa.array(srcs, pa.string()),
        "alt_text": pa.array(alts, pa.string()),
    })


def image_text_pairs(pages: rd.Dataset, html_col: str = "html",
                     key_col: str = "url") -> rd.Dataset:
    """(key, pair_idx, img_src, alt_text) rows from a pages Dataset."""
    return pages.map_batches(
        lambda b: harvest_img_batch(b, html_col, key_col),
        batch_format="pyarrow")


def image_text_sql(table: str = "pages", html_col: str = "html",
                   key_col: str = "url") -> str:
    """DuckDB replay built from the SAME three patterns — the regex
    bytes are IDENTICAL on both engines (DuckDB's name list binds
    positionally to capture groups 1 and 2, so no pattern rewrite is
    needed — the strongest form of the drift guard). ``html_col``
    must be VARCHAR on the SQL side; parity tests feed both engines
    the same strings."""

    def attr_expr(p: str, alias: str) -> str:
        g = f"regexp_extract(tag, '{p.replace(chr(39), chr(39) * 2)}', " \
            f"['d', 's'])"
        return (f"COALESCE(NULLIF({g}.d, ''), NULLIF({g}.s, ''), '') "
                f"AS {alias}")

    tag_p = IMG_TAG_PATTERN.replace("'", "''")
    return f"""
WITH tags AS (
  SELECT {key_col},
         unnest(regexp_extract_all({html_col}, '{tag_p}')) AS tag,
         generate_subscripts(regexp_extract_all({html_col}, '{tag_p}'), 1) - 1
           AS tag_idx
  FROM {table}
),
attrs AS (
  SELECT {key_col}, tag_idx,
         {attr_expr(SRC_PATTERN, "img_src")},
         {attr_expr(ALT_PATTERN, "alt_text")}
  FROM tags
)
SELECT {key_col},
       CAST(ROW_NUMBER() OVER (PARTITION BY {key_col} ORDER BY tag_idx)
            - 1 AS BIGINT) AS pair_idx,
       img_src, alt_text
FROM attrs WHERE img_src <> ''
ORDER BY {key_col}, pair_idx
"""

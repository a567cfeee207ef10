"""Structured-metadata extraction from page markup — the schema.org
JSON-LD harvest every production web pipeline runs beside main-content
extraction (public recipe: Common Crawl's WAT metadata and the
schema.org embedding conventions; JSON-LD payloads live in
``<script type="application/ld+json">`` blocks whose content is raw
JSON, not entity-decoded HTML).

The flagship extractor deliberately SKIPS scripts (JSON-LD must never
leak into page text — fixture ``jsonld_scripts`` pins that); this
stage is the complementary pass that reads ONLY those blocks. Pure
per-batch kernel: one compiled regex scan + ``json.loads`` per block
with per-block error isolation — no state, no shuffle, streams.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import ray.data as rd

__all__ = ["extract_jsonld_objects", "jsonld_rows", "page_jsonld_metadata"]

# Raw-text scan: the HTML parser is not needed (script content is CDATA
# until the first `</script`, per the HTML spec's script-data state).
_LDJSON_RE = re.compile(
    r"<script\b[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>"
    r"(.*?)</script",
    re.IGNORECASE | re.DOTALL,
)


def extract_jsonld_objects(html_text: str) -> tuple[list[dict], int]:
    """All JSON-LD objects in document order + the invalid-block count.

    ``@graph`` containers and top-level arrays are flattened one level
    (the two publishing conventions); non-dict members are skipped.
    A block that fails to parse counts as invalid, never raises."""
    objs: list[dict] = []
    n_invalid = 0
    for m in _LDJSON_RE.finditer(html_text):
        try:
            data = json.loads(m.group(1))
        except (json.JSONDecodeError, ValueError):
            n_invalid += 1
            continue
        if isinstance(data, dict) and isinstance(data.get("@graph"), list):
            members = data["@graph"]
        elif isinstance(data, list):
            members = data
        else:
            members = [data]
        objs.extend(o for o in members if isinstance(o, dict))
    return objs, n_invalid


def _first_str(obj: dict, *keys: str) -> str:
    """First present key rendered as a flat string (schema.org allows
    strings, lists, or nested objects with a ``name``)."""
    for k in keys:
        v = obj.get(k)
        if isinstance(v, str):
            return v
        if isinstance(v, list) and v:
            v = v[0]
        if isinstance(v, dict):
            name = v.get("name")
            if isinstance(name, str):
                return name
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return str(v)
    return ""


def jsonld_rows(batch: pa.Table) -> pa.Table:
    """map_batches kernel over pages(url, html): ONE ROW PER JSON-LD
    OBJECT — (url, obj_index, jsonld_type, name, date_published,
    author, n_invalid). Pages without JSON-LD emit nothing; a page
    whose blocks are all invalid emits one sentinel row with
    jsonld_type '' so the invalid count is never silently lost."""
    urls, idxs, types, names, dates, authors, invalids = (
        [], [], [], [], [], [], [])
    for url, payload in zip(batch["url"].to_pylist(),
                            batch["html"].to_pylist()):
        if isinstance(payload, bytes):
            try:
                text = payload.decode("utf-8")
            except UnicodeDecodeError:
                text = payload.decode("latin-1")
        else:
            text = payload
        objs, n_invalid = extract_jsonld_objects(text)
        if not objs and n_invalid == 0:
            continue
        if not objs:
            objs = [{}]  # sentinel row carries the invalid count
        for i, o in enumerate(objs):
            urls.append(url)
            idxs.append(i)
            t = o.get("@type")
            if isinstance(t, list) and t:
                t = t[0]
            types.append(t if isinstance(t, str) else "")
            names.append(_first_str(o, "headline", "name"))
            dates.append(_first_str(o, "datePublished", "dateCreated"))
            authors.append(_first_str(o, "author", "creator"))
            invalids.append(n_invalid)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "obj_index": pa.array(idxs, pa.int32()),
        "jsonld_type": pa.array(types, pa.string()),
        "name": pa.array(names, pa.string()),
        "date_published": pa.array(dates, pa.string()),
        "author": pa.array(authors, pa.string()),
        "n_invalid": pa.array(invalids, pa.int32()),
    })


def page_jsonld_metadata(pages: rd.Dataset) -> rd.Dataset:
    """Dataset pipeline: pages(url, html, …) → JSON-LD metadata rows."""
    return pages.map_batches(jsonld_rows, batch_format="pyarrow")

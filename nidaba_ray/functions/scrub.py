"""PII scrubbing — replace emails / IPv4 addresses / phone numbers
with placeholder tokens (driver instruction: training-data-pipeline
ops are first-class; the redact-with-placeholder approach and these
three categories follow the public C4/CCNet/Dolma cleaning recipes).

Scale notes: pure per-batch Arrow RE2 kernels
(``pc.replace_substring_regex``) — no Python per-row loop, no state,
no shuffle; the stage streams. DuckDB's ``regexp_replace`` is also
RE2, so the pytest oracle (tests/test_scrub_paradedup.py) checks
byte parity of the exact same pattern list on both engines.

Pattern order is part of the contract: emails first (so the
user@host digits are gone before the phone pattern runs), then IPv4
(so dotted quads don't half-match as phones), then phones.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# (pattern, replacement) in application order. RE2-safe: no
# backrefs/lookaround, identical semantics in Arrow and DuckDB.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\-() ]{6,}\d", "<PHONE>"),
)


def scrub_text_column(col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Apply the PII pattern list to one string column (Arrow RE2)."""
    for pattern, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pattern, replacement=repl)
    return col


def scrub_pii_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """map_batches kernel: replace ``column`` with its scrubbed form."""
    return batch.set_column(
        batch.schema.get_field_index(column), column,
        scrub_text_column(batch[column]),
    )


def scrub_pii(sf_dir: str) -> rd.Dataset:
    """(doc_id, text) with PII placeholders substituted."""
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(scrub_pii_batch, batch_format="pyarrow")


def scrub_sql_expr(column: str = "text") -> str:
    """The DuckDB expression equivalent to ``scrub_text_column`` —
    built from the SAME pattern list so the two sides cannot drift."""
    expr = column
    for pattern, repl in PII_PATTERNS:
        p = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


# ---------------------------------------------------------------------------
# Blocklist gates — the two published list-driven filters the cleaning
# family still lacked: C4's badword DOCUMENT gate (Raffel et al. 2020
# §2.2: "removed any page that contained any word on a blocklist")
# and the RefinedWeb/FineWeb-style URL-domain gate. Both are pure
# per-batch Arrow RE2 kernels built from a word/domain list — no
# Python row loop, no state, no shuffle — and both patterns are built
# ONCE from the same list on the python and DuckDB sides so parity
# cannot drift. The actual published badword list is not shipped;
# callers pass their own via fn_kwargs (the default is a small
# neutral placeholder so the stage is demonstrable and testable).
# ---------------------------------------------------------------------------

# neutral stand-in list — real deployments pass their own
BLOCKLIST_DEFAULT: tuple[str, ...] = ("badword", "blockedterm", "casino")

URL_BLOCKLIST_DEFAULT: tuple[str, ...] = ("ads.example", "spam.example")


def blocklist_pattern(words) -> str:
    """One RE2 alternation matching any listed word at ASCII-
    whitespace token boundaries (the repo's shared WS contract —
    textops.WS_RUN — NOT `\\s`, which the two regex engines define
    differently). Match against LOWERED text: explicit lowering on
    both engines replaces `(?i)`, whose casefold tables could
    diverge."""
    import re

    from nidaba_ray.functions.textops import WS_RUN

    if not words:
        raise ValueError("empty blocklist")
    alts = "|".join(re.escape(w.lower()) for w in sorted(set(words)))
    return rf"(?:^|{WS_RUN})(?:{alts})(?:{WS_RUN}|$)"


def blocklist_filter_batch(batch: pa.Table, column: str = "text",
                           words=BLOCKLIST_DEFAULT) -> pa.Table:
    """Registry cleaning stage (``clean.blocklist``): drop documents
    whose ``column`` contains any blocklisted word as a whitespace
    token; every other column passes through. Word list comes in via
    the spec's ``fn_kwargs``."""
    hit = pc.match_substring_regex(
        pc.utf8_lower(batch[column]), blocklist_pattern(words))
    return batch.filter(pc.invert(hit))


def blocklist_filtered(sf_dir: str, words=BLOCKLIST_DEFAULT) -> rd.Dataset:
    """(doc_id, text) for documents surviving the badword gate."""
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(lambda b: blocklist_filter_batch(b, words=words),
                  batch_format="pyarrow")


def blocklist_sql(words=BLOCKLIST_DEFAULT) -> str:
    """DuckDB replay of the badword gate — byte parity with
    blocklist_filtered, same pattern builder (tests/test_scrub_*)."""
    p = blocklist_pattern(words).replace("'", "''")
    return ("SELECT doc_id, text FROM documents "
            f"WHERE NOT regexp_matches(LOWER(text), '{p}')")


def url_blocklist_pattern(domains) -> str:
    """RE2 matching a LOWERED absolute URL whose host is a listed
    domain or any subdomain of one; an optional port and any path/
    query/fragment may follow. Userinfo counts as part of the host
    label run — a URL spoofing its host via ``user@`` text still
    matches the trailing registered domain, which is the safe
    direction for a blocklist."""
    import re

    if not domains:
        raise ValueError("empty domain blocklist")
    alts = "|".join(re.escape(d.lower().strip(".")) for d in sorted(set(domains)))
    return (r"^[a-z][a-z0-9+.\-]*://(?:[^/?#]*\.)?"
            rf"(?:{alts})(?::[0-9]+)?(?:[/?#]|$)")


def url_blocklist_filter_batch(batch: pa.Table, column: str = "url",
                               domains=URL_BLOCKLIST_DEFAULT) -> pa.Table:
    """Registry cleaning stage (``clean.url_blocklist``): drop rows
    whose ``column`` URL lives on a blocked domain (or a subdomain of
    one); everything else passes through untouched."""
    hit = pc.match_substring_regex(
        pc.utf8_lower(batch[column]), url_blocklist_pattern(domains))
    return batch.filter(pc.invert(hit))


def url_blocklist_sql_expr(column: str = "url",
                           domains=URL_BLOCKLIST_DEFAULT) -> str:
    """DuckDB predicate equivalent to the url gate's KEEP side."""
    p = url_blocklist_pattern(domains).replace("'", "''")
    return f"NOT regexp_matches(LOWER({column}), '{p}')"

"""Mojibake repair — reverse the classic web-text corruption where
UTF-8 bytes were decoded as Windows-1252/Latin-1 ("Ã©" for "é",
"â€™" for "'"). The approach is the core of the public ftfy recipe
(Speer, "ftfy: fixes text for you", zenodo 2019), reduced to a
deterministic contract this repo can pin byte-for-byte:

1. rows with no codepoint above U+007F are untouched (vectorized
   prescreen — the overwhelming majority of a real corpus skips the
   Python kernel entirely);
2. a row is re-decoded only if encoding it through SLOPPY-CP1252
   (cp1252 with the five unmapped bytes falling back to their Latin-1
   values — ftfy's "sloppy" codec) succeeds AND the resulting bytes
   decode as STRICT UTF-8 — random Latin-1 text essentially never
   forms valid multibyte UTF-8, which is the statistical signal that
   makes the reversal safe;
3. at most ``max_rounds`` (default 2) rounds undo double-encoding;
   the loop stops at the first fixpoint or failed round.

Known accepted trade (documented like ftfy documents it): a GENUINE
"Ã " (A-tilde, space) sequence in legitimate text is indistinguishable
from mojibake of "à" and will be "repaired" — and with max_rounds ≥ 2
a page ABOUT mojibake (whose clean text contains "Ã©") is over-fixed
one level, the inherent ambiguity of double-encoding repair.
Determinism and single-round reversal of synthesized corruption are
the pinned contracts, not clairvoyance.
"""

from __future__ import annotations

import codecs

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["fix_mojibake", "fix_mojibake_column", "mojibake_fix_batch"]

# sloppy-cp1252 encode table: unicode codepoint -> byte. cp1252's five
# holes (0x81 8D 8F 90 9D) keep their Latin-1 identity, exactly
# ftfy's sloppy-windows-1252 codec.
_ENC: dict[int, int] = {}
for _b in range(256):
    try:
        _cp = codecs.decode(bytes([_b]), "cp1252")
        _ENC.setdefault(ord(_cp), _b)
    except UnicodeDecodeError:
        _ENC[_b] = _b  # the five holes: Latin-1 identity
# NOTE: nothing else is made encodable — in particular the C1
# controls U+0080-U+009F other than the five holes have NO byte here
# (cp1252 assigns those byte positions to €‚ƒ…), so genuine C1 text
# like U+0085 NEL can never trigger a false repair. Exactly ftfy's
# sloppy-windows-1252; a blanket Latin-1 fallback would be a superset
# and over-fix.


def _dec_one(b: int) -> int:
    try:
        return ord(codecs.decode(bytes([b]), "cp1252"))
    except UnicodeDecodeError:
        return b  # the five holes: Latin-1 identity


_DEC = {b: _dec_one(b) for b in range(256)}


def _sloppy_decode(b: bytes) -> str:
    """bytes → str under sloppy-cp1252 (the corrupting direction —
    used by tests to SYNTHESIZE mojibake; inverse of
    :func:`_sloppy_encode` on the byte range)."""
    return "".join(chr(_DEC[x]) for x in b)


def _sloppy_encode(s: str) -> bytes | None:
    out = bytearray()
    for ch in s:
        b = _ENC.get(ord(ch))
        if b is None:
            return None  # codepoint outside the cp1252/Latin-1 plane
        out.append(b)
    return bytes(out)


def fix_mojibake(s: str, max_rounds: int = 2) -> str:
    for _ in range(max_rounds):
        if not any(ord(c) > 0x7F for c in s):
            break
        b = _sloppy_encode(s)
        if b is None:
            break
        try:
            s2 = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        if s2 == s:
            break
        s = s2
    return s


def fix_mojibake_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized prescreen + scalar repair of only the flagged rows;
    an all-ASCII batch (the common case) returns the input column
    without ever materializing Python strings."""
    suspicious = pc.match_substring_regex(col, r"[^\x00-\x7F]")
    if not pc.any(suspicious).as_py():
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
    texts = col.to_pylist()
    flags = suspicious.to_pylist() if hasattr(suspicious, "to_pylist") \
        else list(suspicious)
    out = [
        fix_mojibake(t) if (f and t is not None) else t
        for t, f in zip(texts, flags)
    ]
    return pa.array(out, pa.string())


def mojibake_fix_batch(batch: pa.Table) -> pa.Table:
    """Registry stage (``clean.mojibake``): rewrite the text column in
    place; schema-preserving."""
    idx = batch.schema.get_field_index("text")
    return batch.set_column(idx, "text", fix_mojibake_column(batch["text"]))

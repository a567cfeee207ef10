"""PDF text extraction — the heavy-recognizer analog (ocr.kraken,
nidaba/plugins/kraken.py, UNVERIFIED per SURVEY.md §0).

A real (public-spec) PDF *subset* parser, pure stdlib:

  * xref-free scan: every ``<< dict >> stream … endstream`` object is
    located by pattern, in file order (damaged xref tables don't
    matter — the same recovery strategy real extractors use);
  * stream ``/Filter`` chains decode in array order — FlateDecode
    (zlib), LZWDecode (from-scratch TIFF-variant LZW incl. the
    /EarlyChange parm), ASCIIHexDecode, ASCII85Decode and
    RunLengthDecode, so ``[/ASCII85Decode /FlateDecode]``-style
    mail-safe encodings read transparently; streams declaring image
    codecs (DCTDecode, CCITT, JBIG2, JPX) or a /Predictor are skipped
    as non-text rather than parsed as binary soup;
  * content streams are tokenized per the PDF syntax: literal strings
    with nested parens + all escapes (\\n \\t … \\ooo octal, line
    continuations), hex strings, arrays, names, numbers, comments;
  * text operators: BT/ET blocks, ``Tj``, ``TJ`` (array shows —
    kerning numbers concatenate), ``'`` and ``"`` (next-line shows),
    ``Td``/``TD`` (newline when ty≠0), ``T*``, ``Tm`` (newline), so
    line structure follows the positioning operators;
  * non-Latin text via the two public mechanisms (spec §7.9.2.2 /
    §9.10.3): BOM-sniffed UTF-16BE literal/hex strings, and ToUnicode
    CMaps — ``bfchar`` pairs plus both ``bfrange`` forms (incrementing
    and array destinations). CMap streams are recognized by their
    ``begincmap``/``beginbf…`` keywords and merged into ONE
    document-level code→unicode map applied to 2-byte show-string
    codes;
  * simple-font ``/Differences`` encoding arrays (spec §9.6.6.3):
    byte codes remap through an Adobe-Glyph-List subset plus the
    algorithmic ``uniXXXX``/``uXXXX`` name forms, over an ASCII base;
  * RC4-encrypted files (standard security handler, /V 1|2, /R 2|3,
    empty user password): the file key is derived per spec §7.6.3 and
    every stream body is decrypted in place before parsing;

  * per-font encoding switching: ``/Font`` resource dicts are
    resolved through indirect references (xref-free object scan), and
    the ``Tf`` operator switches the active (ToUnicode CMap,
    Differences) pair — fonts with overlapping code spaces decode
    correctly; unresolvable structures fall back to the merged
    document-level maps.

Block contract: one block per BT…ET text object; lines within a block
join with a single space. ``/Type /ObjStm`` object streams are
EXPANDED (round 5): the packed non-stream objects are reconstructed
as plain ``N 0 obj`` text so font dicts / ``/Differences`` tables that
modern writers compress there resolve per-font (content streams and
ToUnicode CMaps cannot live in an ObjStm, so the content pass is
untouched); ``/Type /XRef`` cross-reference streams are recognized
and skipped as structure. Out of scope (documented): incrementing
bfranges that cross a surrogate boundary (bfchar and array-form
destinations decode fine in any plane, incl. surrogate pairs), and
non-empty user passwords (empty-user-password RC4 V 1/2 R 2/3 AND
AES V 4/5 files both decrypt: spec §7.6.2-3, Algorithms 1-6/2.A).
Inline images (``BI … ID <binary> EI``, spec §8.9.7) are skipped as
opaque spans so their binary payload can never be mis-tokenized into
text. A production build swaps this module for a full parser behind
the same ``extract_pdf_blocks`` contract.
"""

from __future__ import annotations

import hashlib
import re
import zlib

__all__ = ["is_pdf", "extract_pdf_blocks", "PDF_MAGIC"]

PDF_MAGIC = b"%PDF-"

# nearest-`<<` dict immediately preceding a stream keyword. ONE level
# of `<< nested >>` sub-dict is consumed atomically (the alternative is
# tried before the any-char branch) so `/DecodeParms << /EarlyChange 0 >>`
# style parameter dicts stay inside the captured dict source; deeper
# nesting is outside the subset. The guard keeps a text-bearing stream
# body from swallowing the next object's dict.
_STREAM_RE = re.compile(
    rb"<<((?:<<(?:(?!<<).)*?>>|(?:(?!<<).))*?)>>\s*stream"
    rb"(?:\r\n|\n|\r)(.*?)(?:\r\n|\n|\r)?endstream",
    re.S,
)
# (?!\d) pins the capture to the FULL integer — without it the
# indirect-ref lookahead backtracks to a digit prefix ("/Length 15 0 R"
# would capture b"1") and mis-slice the stream body
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_WS_BYTES = frozenset(b" \t\r\n\f\x00")

# ---------------------------------------------------------------------------
# Stream filters (spec §7.4): the lossless text-bearing filters, applied
# as a CHAIN in /Filter array order — `[/ASCII85Decode /FlateDecode]`
# means "85-decode, then inflate". Image filters (DCTDecode, JPXDecode,
# CCITTFaxDecode, JBIG2Decode) can't carry content text, so streams
# declaring one are skipped outright (per-stream isolation) instead of
# being parsed as binary soup. /DecodeParms support is /EarlyChange for
# LZW; a /Predictor other than 1 marks the stream undecodable for this
# subset (predictors live on xref/image streams, which we don't read).
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_FILTER_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d+)(?!\d)")
_PREDICTOR_RE = re.compile(rb"/Predictor\s+(\d+)(?!\d)")
_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")


def _ascii_hex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, `>` is
    EOD, a dangling final digit reads as if followed by 0."""
    out = bytearray()
    hi = -1
    for b in data:
        if b == 0x3E:  # '>'
            break
        if b in _WS_BYTES:
            continue
        if b not in _HEX_DIGITS:
            raise ValueError("ASCIIHex: bad digit")
        v = int(chr(b), 16)
        if hi < 0:
            hi = v
        else:
            out.append(hi * 16 + v)
            hi = -1
    if hi >= 0:
        out.append(hi * 16)
    return bytes(out)


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (§7.4.3): base-85 groups of 5 chars → 4 bytes,
    `z` = four zero bytes (only between groups), `~>` is EOD, partial
    final group pads with 'u' and drops the pad bytes."""
    if data.startswith(b"<~"):  # btoa framing, tolerated
        data = data[2:]
    out = bytearray()
    group: list[int] = []
    for b in data:
        if b == 0x7E:  # '~' — EOD marker
            break
        if b in _WS_BYTES:
            continue
        if b == 0x7A:  # 'z'
            if group:
                raise ValueError("ASCII85: z inside group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= b <= 0x75:  # '!'..'u'
            raise ValueError("ASCII85: char out of range")
        group.append(b - 0x21)
        if len(group) == 5:
            n = 0
            for g in group:
                n = n * 85 + g
            if n > 0xFFFFFFFF:
                raise ValueError("ASCII85: group overflow")
            out += n.to_bytes(4, "big")
            group.clear()
    if group:
        if len(group) == 1:
            raise ValueError("ASCII85: lone final digit")
        k = len(group)
        n = 0
        for g in group + [84] * (5 - k):
            n = n * 85 + g
        out += n.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (§7.4.5): length byte L<128 copies L+1 literal
    bytes, L>128 repeats the next byte 257−L times, L=128 is EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        if length == 128:
            break
        if length < 128:
            chunk = data[i + 1 : i + 2 + length]
            if len(chunk) != length + 1:
                raise ValueError("RunLength: truncated literal run")
            out += chunk
            i += 2 + length
        else:
            if i + 1 >= n:
                raise ValueError("RunLength: truncated repeat run")
            out += data[i + 1 : i + 2] * (257 - length)
            i += 2
    return bytes(out)


# LZWDecode (§7.4.4) is the TIFF-variant LZW shared with the TIFF
# codec — one implementation in algorithms/lzw.py serves both specs
# (the /EarlyChange parm maps straight onto its ``early`` argument).
from nidaba_ray.algorithms.lzw import lzw_decode as _lzw_decode


_FILTER_DECODERS = {
    b"FlateDecode": zlib.decompress,
    b"Fl": zlib.decompress,
    b"ASCIIHexDecode": _ascii_hex_decode,
    b"AHx": _ascii_hex_decode,
    b"ASCII85Decode": _ascii85_decode,
    b"A85": _ascii85_decode,
    b"RunLengthDecode": _runlength_decode,
    b"RL": _runlength_decode,
    b"LZWDecode": None,  # handled specially (EarlyChange parm)
    b"LZW": None,
}


def _stream_filter_chain(dict_src: bytes) -> list[bytes] | None:
    """The declared /Filter names in application order; [] when the
    stream is unfiltered, None when it declares a filter this subset
    cannot decode (image codecs, predictors, unknown names)."""
    m = _FILTER_RE.search(dict_src)
    if not m:
        return []
    names = _FILTER_NAME_RE.findall(m.group(1))
    if not names or any(n not in _FILTER_DECODERS for n in names):
        return None
    pm = _PREDICTOR_RE.search(dict_src)
    if pm and int(pm.group(1)) != 1:
        return None
    return names


def _apply_filter_chain(body: bytes, names: list[bytes],
                        dict_src: bytes) -> bytes:
    for name in names:
        if name in (b"LZWDecode", b"LZW"):
            em = _EARLY_RE.search(dict_src)
            early = int(em.group(1)) if em else 1
            body = _lzw_decode(body, early=1 if early else 0)
        else:
            body = _FILTER_DECODERS[name](body)
    return body

_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")
_NAME_RE = re.compile(rb"/[^\s()<>\[\]{}/%]*")
_OP_RE = re.compile(rb"[^\s()<>\[\]{}/%]+")
# Inline images (spec §8.9.7): `ID` ends the parameter dict and is
# followed by exactly one whitespace byte, then raw binary until a
# whitespace-delimited `EI`. The spec itself notes the EI scan is
# heuristic (binary data could contain the sequence); real extractors
# do the same whitespace-delimited scan when /L is absent.
_INLINE_ID_RE = re.compile(rb"\bID[\0\t\n\f\r ]")
_INLINE_EI_RE = re.compile(rb"[\0\t\n\f\r ]EI(?=[\0\t\n\f\r ]|$)")
# fallback when no whitespace PRECEDES EI (some encoders butt the
# delimiter against the data) — still demand a delimiter after
_INLINE_EI_BARE_RE = re.compile(rb"EI(?=[\0\t\n\f\r ]|$)")
_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_ESC_SIMPLE = {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
               ord("b"): b"\b", ord("f"): b"\f"}


def is_pdf(payload: bytes) -> bool:
    return payload[: len(PDF_MAGIC)] == PDF_MAGIC


# ---------------------------------------------------------------------------
# Standard security handler (spec §7.6.3): RC4 with /V 1|2, /R 2|3 and
# an EMPTY user password (the common owner-password-only case). The
# whole file is decrypted up front — every stream body is replaced
# in-place (RC4 is length-preserving, so all offsets stay valid) and
# the rest of the parser runs on plaintext. AES files (/V 4 AESV2,
# /V 5 AESV3) are NOT length-preserving, so those are decrypted by
# rebuilding the file (see _rebuild_aes_decrypted). Out of scope:
# non-Standard filters, non-empty user passwords, and strings outside
# streams (they never carry page text; content + ToUnicode live in
# streams, which ARE decrypted).
# ---------------------------------------------------------------------------

# spec Algorithm 2 padding constant (§7.6.3.3, public)
_PAD = bytes((
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
))
_ENC_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_ENC_INLINE_RE = re.compile(rb"/Encrypt\s*<<((?:(?!<<).)*?)>>", re.S)
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>")
_OBJGEN_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.S)


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA). Sequential by nature — fine for the
    few-KB streams this subset handles; a production build swaps in a
    native cipher behind the same call."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _enc_int(d: bytes, name: bytes, default: int) -> int:
    m = re.search(rb"/" + name + rb"\s+(-?\d+)", d)
    return int(m.group(1)) if m else default


def _enc_string(d: bytes, name: bytes) -> bytes | None:
    """/O or /U value — hex ``<…>`` or literal ``(…)`` form."""
    m = re.search(rb"/" + name + rb"\s*", d)
    if not m:
        return None
    i = m.end()
    if i < len(d) and d[i] == 0x3C:  # '<'
        hm = _HEX_RE.match(d, i)
        if hm:
            h = re.sub(rb"\s", b"", hm.group(1))
            if len(h) % 2:
                h += b"0"  # odd digit count → trailing zero (spec);
                # keeps extract_pdf_blocks TOTAL on corrupt input
            return bytes.fromhex(h.decode("ascii"))
        return None
    if i < len(d) and d[i] == 0x28:  # '('
        s, _ = _scan_string(d, i)
        return s
    return None


def _std_file_key(O: bytes, P: int, id0: bytes, R: int, nbits: int) -> bytes:
    """Algorithm 2: empty-user-password file key."""
    n = 5 if R == 2 else max(5, min(16, nbits // 8))
    key = hashlib.md5(
        _PAD + O[:32] + (P & 0xFFFFFFFF).to_bytes(4, "little") + id0
    ).digest()
    if R >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _check_user_password(key: bytes, U: bytes, id0: bytes, R: int) -> bool:
    """Algorithm 6 (via 4/5): does the empty user password open this
    file? R3 compares only the first 16 bytes of /U per the spec."""
    if R == 2:
        return _rc4(key, _PAD) == U[:32]
    x = hashlib.md5(_PAD + id0).digest()
    x = _rc4(key, x)
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x == U[:16]


def _obj_key(key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: per-object RC4 key."""
    h = hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()
    return h[: min(len(key) + 5, 16)]


def _aes_obj_key(key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1 with the AESV2 salt (ISO 32000 §7.6.2: the bytes
    0x73 41 6C 54, "sAlT", appended before the md5)."""
    h = hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        + b"sAlT"
    ).digest()
    return h[: min(len(key) + 5, 16)]


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash (R 6). Block-aligned by
    construction: the repeated unit is concatenated 64×, and 64·L is
    always a multiple of 16."""
    from nidaba_ray.algorithms import aes as _aes

    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = _aes.encrypt_cbc(k[:16], k[16:32], k1)
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


from functools import lru_cache


@lru_cache(maxsize=256)
def _aes_file_key_v5(enc: bytes, R: int) -> bytes | None:
    """Algorithm 2.A (empty user password): validate against /U's hash
    + validation salt, then unwrap the 32-byte file key from /UE with
    the intermediate key from the key salt.

    Cached per (/Encrypt dict bytes, R): the R6 KDF is a deliberately
    slow iterated hash (~0.6 s over the repo's pure-Python cipher), so
    re-parses of the SAME document (bench loops, dedup double-reads,
    tests) skip it. Distinct documents have distinct /O//U salts and
    always pay the derivation once — that is the KDF's purpose."""
    from nidaba_ray.algorithms import aes as _aes

    U = _enc_string(enc, b"U")
    UE = _enc_string(enc, b"UE")
    if U is None or UE is None or len(U) < 48 or len(UE) < 32:
        return None
    vsalt, ksalt = U[32:40], U[40:48]
    if R == 6:
        h = _hash_2b(b"", vsalt)
        ik = _hash_2b(b"", ksalt)
    else:  # R 5 (the deprecated pre-ISO draft: a single SHA-256)
        h = hashlib.sha256(vsalt).digest()
        ik = hashlib.sha256(ksalt).digest()
    if h != U[:32]:
        return None
    return _aes.decrypt_cbc(ik, bytes(16), UE[:32], unpad=False)


def _rebuild_aes_decrypted(payload: bytes, objs, enc_num: int,
                           key_for) -> bytes:
    """AES-CBC is not length-preserving (16-byte IV prefix + padding),
    so unlike the RC4 path the file is REBUILT: each stream body is
    replaced by its plaintext and the dict's /Length rewritten. Only
    /Length and delimiters matter downstream — the parser is an
    xref-free scan, so shifted offsets are harmless."""
    from nidaba_ray.algorithms import aes as _aes

    parts: list[bytes] = []
    pos = 0
    for m in objs:
        num, gen = int(m.group(1)), int(m.group(2))
        if num == enc_num:
            continue
        base = m.start(3)
        for sm in _STREAM_RE.finditer(m.group(3)):
            start, end = base + sm.start(2), base + sm.end(2)
            lm = _LENGTH_RE.search(sm.group(1))
            if lm:  # binary bodies: trust /Length over the pattern end
                ln = int(lm.group(1))
                if start + ln <= len(payload):
                    end = start + ln
            ct = payload[start:end]
            if len(ct) < 32 or len(ct) % 16 or start < pos:
                continue  # malformed — leave in place (parse will skip)
            pt = _aes.decrypt_cbc(key_for(num, gen), ct[:16], ct[16:])
            if pt is None:
                continue
            d_start, d_end = base + sm.start(1), base + sm.end(1)
            interior = payload[d_start:d_end]
            ln_b = str(len(pt)).encode()
            new_interior = _LENGTH_RE.sub(
                b"/Length " + ln_b, interior, count=1
            )
            if new_interior == interior:  # indirect or absent /Length
                new_interior = interior + b" /Length " + ln_b + b" "
            parts.append(payload[pos:d_start])
            parts.append(new_interior)
            parts.append(payload[d_end:start])
            parts.append(pt)
            pos = end
    parts.append(payload[pos:])
    return b"".join(parts)


def _decrypt_payload(payload: bytes) -> bytes | None:
    """Decrypt every stream body of a standard-handler RC4 file
    in-place; None when the file is encrypted but not decryptable here
    (unsupported handler/version, or the user password isn't empty —
    the caller extracts no text rather than mojibake)."""
    objs = list(_OBJGEN_RE.finditer(payload))
    enc = None
    enc_num = -1
    em = _ENC_REF_RE.search(payload)
    if em:
        enc_num = int(em.group(1))
        for m in objs:
            if int(m.group(1)) == enc_num:
                enc = m.group(3)
                break
    if enc is None:
        im = _ENC_INLINE_RE.search(payload)
        if im:
            enc = im.group(1)
    if enc is None or b"/Standard" not in enc:
        return None
    V = _enc_int(enc, b"V", 0)
    R = _enc_int(enc, b"R", 0)
    if V in (1, 2) and R in (2, 3):
        mode = "rc4"
    elif V == 4 and R == 4 and re.search(rb"/CFM\s*/AESV2\b", enc):
        mode = "aesv2"  # AES-128-CBC crypt filter
    elif V == 4 and R == 4 and re.search(rb"/CFM\s*/V2[\s/>]", enc):
        mode = "rc4v4"  # RC4 routed through a V4 crypt filter
    elif V == 5 and R in (5, 6) and b"/AESV3" in enc:
        mode = "aesv3"  # AES-256-CBC, SHA-2 key derivation
    else:
        return None
    sm_ = re.search(rb"/StmF\s*/([^\s/\[\]()<>{}%]+)", enc)
    if sm_ is not None and sm_.group(1) != b"StdCF":
        return None  # streams routed to a non-standard crypt filter

    if mode == "aesv3":
        fkey = _aes_file_key_v5(enc, R)
        if fkey is None or len(fkey) != 32:
            return None
        return _rebuild_aes_decrypted(
            payload, objs, enc_num, lambda num, gen: fkey
        )

    O = _enc_string(enc, b"O")
    U = _enc_string(enc, b"U")
    if O is None or U is None or len(O) < 32 or len(U) < 16:
        return None
    P = _enc_int(enc, b"P", -1)
    # AESV2 keys are 128-bit by definition; /Length inside the nested
    # /CF dict is in BYTES and would shadow the top-level bit count
    if mode == "aesv2":
        nbits = 128
    elif mode == "rc4v4":
        cf = re.search(rb"/StdCF\s*<<(.*?)>>", enc, re.S)
        nbits = 8 * (_enc_int(cf.group(1), b"Length", 16) if cf else 16)
    elif V == 2:
        nbits = _enc_int(enc, b"Length", 40)
    else:
        nbits = 40
    idm = _ID_RE.search(payload)
    id0 = b""
    if idm:
        h = re.sub(rb"\s", b"", idm.group(1))
        if len(h) % 2:
            h += b"0"  # odd digit count → trailing zero (spec); total
        id0 = bytes.fromhex(h.decode("ascii"))
    key = _std_file_key(O, P, id0, R, nbits)
    if not _check_user_password(key, U, id0, R):
        return None
    if mode == "aesv2":
        return _rebuild_aes_decrypted(
            payload, objs, enc_num,
            lambda num, gen: _aes_obj_key(key, num, gen),
        )
    out = bytearray(payload)
    for m in objs:
        num, gen = int(m.group(1)), int(m.group(2))
        if num == enc_num:
            continue  # the encryption dict itself is never encrypted
        base = m.start(3)
        body = m.group(3)
        for sm in _STREAM_RE.finditer(body):
            start, end = base + sm.start(2), base + sm.end(2)
            lm = _LENGTH_RE.search(sm.group(1))
            if lm:  # binary bodies: trust /Length over the pattern end
                ln = int(lm.group(1))
                if start + ln <= len(payload):
                    end = start + ln
            ok = _obj_key(key, num, gen)
            out[start:end] = _rc4(ok, bytes(out[start:end]))
    return bytes(out)


# ---------------------------------------------------------------------------
# Per-font encoding resolution (spec §9.6/§9.7): object scan → font
# resources → ToUnicode / Differences per font name, switched by Tf
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.S)
_FONT_RES_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONT_REF_RE = re.compile(rb"/([^\s/\[\]()<>{}%]+)\s+(\d+)\s+\d+\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")


def _font_maps(payload: bytes) -> dict[bytes, tuple[dict | None, dict | None]]:
    """Resolve each /Font resource name to its own (ToUnicode CMap,
    /Differences) pair by following indirect references through an
    xref-free object scan. Returns {} when no font resources resolve
    (the caller then falls back to the merged document-level maps).
    Objects hidden in object streams don't resolve — same fallback."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(payload):
        objs.setdefault(int(m.group(1)), m.group(2))
    fonts: dict[bytes, tuple[dict | None, dict | None]] = {}
    for body in objs.values():
        for res in _FONT_RES_RE.finditer(body):
            for ref in _FONT_REF_RE.finditer(res.group(1)):
                name, num = b"/" + ref.group(1), int(ref.group(2))
                fobj = objs.get(num)
                if fobj is None or name in fonts:
                    continue
                cmap = None
                tm = _TOUNICODE_RE.search(fobj)
                if tm:
                    tobj = objs.get(int(tm.group(1)))
                    if tobj is not None:
                        sm = _STREAM_RE.search(tobj)
                        if sm:
                            cbody = _decoded_stream_body(tobj, sm)
                            if cbody is not None:
                                cmap = parse_tounicode_cmap(cbody) or None
                diffs = parse_differences(fobj) or None
                fonts[name] = (cmap, diffs)
    return fonts


# ---------------------------------------------------------------------------
# Simple-font /Differences encoding tables (spec §9.6.6.3 + Adobe Glyph List)
# ---------------------------------------------------------------------------

_DIFF_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.S)
_DIFF_TOK_RE = re.compile(rb"/([^\s/\[\]()<>{}%]+)|(\d+)")

# Compact Adobe-Glyph-List subset: the names real generators emit for
# Latin-accent + publisher punctuation. Everything else arrives via the
# algorithmic uniXXXX / uXXXX forms handled in _glyph_to_unicode.
_AGL = {
    "space": " ", "quotesingle": "'", "quotedbl": '"',
    "quoteleft": "‘", "quoteright": "’",
    "quotesinglbase": "‚", "quotedblleft": "“",
    "quotedblright": "”", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "Euro": "€",
    "guillemotleft": "«", "guillemotright": "»",
    "exclamdown": "¡", "questiondown": "¿",
    "germandbls": "ß", "ae": "æ", "AE": "Æ",
    "oslash": "ø", "Oslash": "Ø",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "atilde": "ã", "adieresis": "ä", "aring": "å",
    "ccedilla": "ç", "egrave": "è", "eacute": "é",
    "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "icircumflex": "î",
    "idieresis": "ï", "ntilde": "ñ",
    "ograve": "ò", "oacute": "ó", "ocircumflex": "ô",
    "otilde": "õ", "odieresis": "ö",
    "ugrave": "ù", "uacute": "ú", "ucircumflex": "û",
    "udieresis": "ü", "yacute": "ý", "ydieresis": "ÿ",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "Eacute": "É", "Egrave": "È", "Ccedilla": "Ç",
    "Ntilde": "Ñ", "Aring": "Å",
}
_UNI_NAME_RE = re.compile(r"^uni((?:[0-9A-F]{4})+)$")
_U_NAME_RE = re.compile(r"^u([0-9A-F]{4,6})$")


def _glyph_to_unicode(name: str) -> str:
    """AGL name → unicode: table lookup, then the algorithmic
    ``uniXXXX`` (one or more UTF-16 code units) and ``uXXXX[XX]``
    forms; unknown names decode as replacement."""
    got = _AGL.get(name)
    if got is not None:
        return got
    m = _UNI_NAME_RE.match(name)
    if m:
        h = m.group(1)
        units = [int(h[i : i + 4], 16) for i in range(0, len(h), 4)]
        return b"".join(u.to_bytes(2, "big") for u in units).decode(
            "utf-16-be", errors="replace")
    m = _U_NAME_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        if cp <= 0x10FFFF:
            return chr(cp)
    return "�"


def parse_differences(data: bytes) -> dict[int, str]:
    """Merge every ``/Differences [ code /name /name … ]`` array in
    ``data`` into one byte-code → unicode map (spec §9.6.6.3: an
    integer sets the next code, each following name consumes one
    code)."""
    diffs: dict[int, str] = {}
    for m in _DIFF_RE.finditer(data):
        code = 0
        for tok in _DIFF_TOK_RE.finditer(m.group(1)):
            name, num = tok.group(1), tok.group(2)
            if num is not None:
                code = int(num)
            elif name is not None:
                if 0 <= code <= 255:
                    diffs[code] = _glyph_to_unicode(name.decode("latin-1"))
                code += 1
    return diffs


# ---------------------------------------------------------------------------
# ToUnicode CMaps (spec §9.10.3) + UTF-16BE strings (spec §7.9.2.2)
# ---------------------------------------------------------------------------

_UTF16_BOM = b"\xfe\xff"
_CMAP_KEYWORDS = (b"begincmap", b"beginbfchar", b"beginbfrange")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
# hex strings and array brackets are the only tokens inside bf sections
_CMAP_TOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")


def _u16_hex(h: bytes) -> str:
    """Destination hex → unicode (UTF-16BE code units, surrogate pairs
    included). Lenient: odd-length hex is zero-padded BEFORE decoding
    (``bytes.fromhex`` would raise) — one malformed CMap entry must
    never take down the document."""
    if len(h) % 2:
        h += b"0"
    b = bytes.fromhex(h.decode("ascii"))
    if len(b) % 2:
        b += b"\x00"
    return b.decode("utf-16-be", errors="replace")


def parse_tounicode_cmap(body: bytes) -> dict[int, str]:
    """Parse one ToUnicode CMap stream into {2-byte code → str}.

    Handles ``bfchar`` pairs and both ``bfrange`` forms: incrementing
    (``<lo> <hi> <dst>`` — dst advances with the code) and array
    destinations (``<lo> <hi> [<d0> <d1> …]``)."""
    cmap: dict[int, str] = {}
    for sec in _BFCHAR_RE.finditer(body):
        toks = [m.group(1) for m in _CMAP_TOK_RE.finditer(sec.group(1))
                if m.group(1)]
        for i in range(0, len(toks) - 1, 2):
            cmap[int(toks[i], 16)] = _u16_hex(toks[i + 1])
    for sec in _BFRANGE_RE.finditer(body):
        toks: list = []
        for m in _CMAP_TOK_RE.finditer(sec.group(1)):
            toks.append(m.group(1) if m.group(1) else m.group(0))
        i, n = 0, len(toks)
        while i + 3 <= n:
            if toks[i] in (b"[", b"]") or toks[i + 1] in (b"[", b"]"):
                i += 1  # malformed entry — resync
                continue
            lo, hi = int(toks[i], 16), int(toks[i + 1], 16)
            i += 2
            if toks[i] == b"[":  # array destinations
                i += 1
                c = lo
                while i < n and toks[i] != b"]":
                    # a stray nested "[" is not a hex destination —
                    # skip it without consuming a code slot
                    if toks[i] == b"[":
                        i += 1
                        continue
                    if c <= hi:
                        cmap[c] = _u16_hex(toks[i])
                    c += 1
                    i += 1
                i += 1  # past ]
            elif toks[i] == b"]":  # malformed — no destination
                i += 1
            else:  # incrementing destination
                dsthex = toks[i]
                i += 1
                width = len(dsthex)
                base = int(dsthex, 16)
                for c in range(lo, hi + 1):
                    cmap[c] = _u16_hex(b"%0*X" % (width, base + (c - lo)))
    return cmap


def _decode_show(b: bytes, cmap: dict[int, str] | None,
                 diffs: dict[int, str] | None = None) -> str:
    """Decode one show-string. Priority: BOM-sniffed UTF-16BE (the
    spec's explicit marker wins), then the document ToUnicode CMap
    over 2-byte codes (composite fonts), then a simple-font
    /Differences byte remap over an ASCII base, else UTF-8 with
    replacement (the Latin subset)."""
    if b.startswith(_UTF16_BOM):
        return b[2:].decode("utf-16-be", errors="replace")
    if cmap:
        if len(b) % 2:  # malformed odd-length code string — pad
            b = b + b"\x00"
        return "".join(
            cmap.get((b[i] << 8) | b[i + 1], "�")
            for i in range(0, len(b), 2)
        )
    if diffs:
        return "".join(
            diffs.get(x, chr(x) if x < 0x80 else "�") for x in b
        )
    return b.decode("utf-8", errors="replace")


def _scan_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Scan a literal string starting at ``data[i] == '('``; returns
    (unescaped bytes, index past the closing paren). Handles nested
    balanced parens and every escape in the spec (§7.3.4.2)."""
    depth = 1
    i += 1
    out = bytearray()
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            simple = _ESC_SIMPLE.get(e)
            if simple is not None:
                out += simple
                i += 1
            elif 0x30 <= e <= 0x37:  # \ooo — up to 3 octal digits
                j = i
                while j < n and j - i < 3 and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(int(data[i:j], 8) & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # \( \) \\ and unknown → the char itself
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_content(
    data: bytes,
    cmap: dict[int, str] | None = None,
    diffs: dict[int, str] | None = None,
    fonts: dict[bytes, tuple[dict | None, dict | None]] | None = None,
) -> list[str]:
    """Tokenize one content stream; emit text blocks (one per BT…ET).

    ``fonts`` (from :func:`_font_maps`) enables per-font decoding: a
    ``Tf`` operator switches the active (CMap, Differences) pair to
    the named font's; names missing from ``fonts`` keep the merged
    document-level maps — so two fonts with OVERLAPPING code spaces
    decode correctly when resolvable, and the old behavior is the
    graceful fallback."""
    blocks: list[str] = []
    stack: list = []
    lines: list[str] = []
    cur: list[str] = []
    active = [cmap, diffs]  # mutated by Tf

    def newline() -> None:
        nonlocal cur
        if cur:
            lines.append("".join(cur))
            cur = []

    def show(b: bytes) -> None:
        cur.append(_decode_show(b, active[0], active[1]))

    def flush() -> None:
        nonlocal lines
        newline()
        if lines:
            text = " ".join(lines)
            if text.strip():
                blocks.append(text)
        lines = []

    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in _WS_BYTES:
            i += 1
            continue
        if c == 0x25:  # % comment to EOL
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == 0x28:  # literal string
            s, i = _scan_string(data, i)
            stack.append(s)
            continue
        if data.startswith(b"<<", i):  # dict (skipped — no text inside)
            j = data.find(b">>", i + 2)
            i = n if j < 0 else j + 2
            continue
        if c == 0x3C:  # hex string
            m = _HEX_RE.match(data, i)
            if m:
                h = re.sub(rb"\s", b"", m.group(1))
                if len(h) % 2:
                    h += b"0"  # odd digit count → trailing zero (spec)
                stack.append(bytes.fromhex(h.decode("ascii")))
                i = m.end()
            else:
                i += 1
            continue
        if c == 0x5B:  # [
            stack.append("[")
            i += 1
            continue
        if c == 0x5D:  # ] — collapse to array
            arr: list = []
            while stack and stack[-1] != "[":
                arr.append(stack.pop())
            if stack:
                stack.pop()
            stack.append(list(reversed(arr)))
            i += 1
            continue
        if c == 0x2F:  # name — tagged so a literal string that merely
            # LOOKS like a name can never be mistaken for one
            m = _NAME_RE.match(data, i)
            stack.append(("name", m.group()))
            i = m.end()
            continue
        m = _NUM_RE.match(data, i)
        if m:
            stack.append(float(m.group()))
            i = m.end()
            continue
        m = _OP_RE.match(data, i)
        if not m:
            i += 1
            continue
        op = m.group()
        i = m.end()
        if op == b"BI":  # inline image: skip BI…ID…EI as one opaque span
            m2 = _INLINE_ID_RE.search(data, i)
            if m2 is None:
                # a bare BI with no ID anywhere after it is a corrupt /
                # false-positive operator (e.g. one flipped byte), not
                # an image — treat it as unknown and keep tokenizing
                # instead of dropping every later block in the stream
                stack.clear()
            else:
                m3 = (_INLINE_EI_RE.search(data, m2.end())
                      or _INLINE_EI_BARE_RE.search(data, m2.end()))
                # no EI at all → truncated image at stream end; only
                # then is dropping the (empty) remainder correct
                i = n if m3 is None else m3.end()
            stack.clear()
        elif op == b"BT":
            flush()
            stack.clear()
        elif op == b"ET":
            flush()
            stack.clear()
        elif op == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                show(stack.pop())
            stack.clear()
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack.pop():
                    if isinstance(el, bytes):
                        show(el)  # kerning numbers concatenate
            stack.clear()
        elif op in (b"'", b'"'):
            if stack and isinstance(stack[-1], bytes):
                s = stack.pop()
                newline()
                show(s)
            stack.clear()
        elif op == b"Tf":
            if fonts:
                name = next(
                    (x[1] for x in reversed(stack)
                     if isinstance(x, tuple) and x[0] == "name"),
                    None,
                )
                if name is not None and name in fonts:
                    active[0], active[1] = fonts[name]
                else:  # unresolvable font → document-level maps
                    active[0], active[1] = cmap, diffs
            stack.clear()
        elif op in (b"Td", b"TD"):
            ty = stack[-1] if stack and isinstance(stack[-1], float) else 0.0
            if ty != 0.0:
                newline()
            stack.clear()
        elif op in (b"T*", b"Tm"):
            newline()
            stack.clear()
        else:  # Tf/TL/Tc/Tw/graphics/... — operands consumed, no text
            stack.clear()
    flush()
    return blocks


def _decoded_stream_body(payload: bytes, m: re.Match) -> bytes | None:
    """Decode one matched stream object's body; None if undecodable.

    Honors /Length for BINARY bodies: the pattern's optional EOL
    before `endstream` would otherwise eat a trailing 0x0D/0x0A data
    byte — the exact ambiguity /Length exists to resolve (spec
    §7.3.8.1). Direct integer lengths only. Tries the declared slice
    FIRST, then the pattern capture (tolerates the common malformation
    of an under-declared /Length — zlib and the EOD-marked filters
    ignore trailing bytes). The /Filter chain decodes in array
    order; a chain this subset can't decode skips the stream."""
    dict_src, captured = m.group(1), m.group(2)
    chain = _stream_filter_chain(dict_src)
    if chain is None:
        return None  # image codec / predictor / unknown — not text
    if not chain:
        return captured
    candidates = []
    lm = _LENGTH_RE.search(dict_src)
    if lm:
        start = m.start(2)
        length = int(lm.group(1))
        if start + length <= len(payload):
            candidates.append(payload[start : start + length])
    candidates.append(captured)
    for body in candidates:
        try:
            return _apply_filter_chain(body, chain, dict_src)
        except (ValueError, zlib.error):
            continue
    return None


_OBJSTM_TYPE_RE = re.compile(rb"/Type\s*/ObjStm\b")
_XREF_TYPE_RE = re.compile(rb"/Type\s*/XRef\b")
_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)(?!\d)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)(?!\d)")


def _expand_object_streams(payload: bytes) -> bytes:
    """Reconstruct the non-stream objects packed inside ``/Type
    /ObjStm`` object streams (spec §7.5.7) as plain ``N 0 obj …
    endobj`` text appended to the payload, so the xref-free object
    scan (`_font_maps`, `parse_differences`) resolves font dicts and
    encoding tables that modern writers compress there. Content
    streams and ToUnicode CMaps cannot live in an ObjStm (they are
    streams), so this is purely DICTIONARY visibility — the content
    pass is unchanged. Malformed object streams are skipped
    (per-stream isolation); the appended text contains no ``stream``
    keyword, so re-scanning the expanded payload finds no new
    streams."""
    if b"/ObjStm" not in payload:
        return payload
    extra: list[bytes] = []
    for m in _STREAM_RE.finditer(payload):
        d = m.group(1)
        if not _OBJSTM_TYPE_RE.search(d):
            continue
        nm = _OBJSTM_N_RE.search(d)
        fm = _OBJSTM_FIRST_RE.search(d)
        if not nm or not fm:
            continue
        body = _decoded_stream_body(payload, m)
        if body is None:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        if first > len(body):
            continue
        toks = body[:first].split()
        if len(toks) < 2 * n:
            continue
        try:
            pairs = [(int(toks[2 * i]), int(toks[2 * i + 1]))
                     for i in range(n)]
        except ValueError:
            continue
        # offsets are increasing per spec; sort defensively so a
        # sloppy writer can't make one object swallow the next
        pairs.sort(key=lambda p: p[1])
        for i, (num, off) in enumerate(pairs):
            start = first + off
            end = first + pairs[i + 1][1] if i + 1 < n else len(body)
            if not 0 <= start <= end <= len(body):
                continue
            extra.append(b"\n%d 0 obj\n" % num + body[start:end]
                         + b"\nendobj\n")
    return payload + b"".join(extra) if extra else payload


def extract_pdf_blocks(payload: bytes) -> list[str]:
    """All text blocks in document order (one per BT…ET text object).

    Two passes over the scan-discovered streams (xref-free): pass 1
    decodes every body (FlateDecode inflated; undecodable streams are
    skipped — per-stream isolation, one corrupt stream never hides the
    rest) and merges any ToUnicode CMap streams into one document-level
    code map; pass 2 parses the remaining streams as content with that
    map active. Payloads with no stream objects at all fall back to a
    raw scan of the whole body (bare content fragments). Encrypted
    files (standard security handler, RC4, empty user password) are
    decrypted up front; encrypted files this subset can't open yield
    no blocks rather than ciphertext mojibake."""
    if b"/Encrypt" in payload:
        dec = _decrypt_payload(payload)
        if dec is None:
            return []
        payload = dec
    payload = _expand_object_streams(payload)
    bodies: list[bytes] = []
    found = False
    for m in _STREAM_RE.finditer(payload):
        found = True
        # object/xref streams are structure, never content: ObjStm
        # bodies were expanded above; a predictor-less XRef stream
        # would otherwise inflate to binary soup in the content pass
        d = m.group(1)
        if _OBJSTM_TYPE_RE.search(d) or _XREF_TYPE_RE.search(d):
            continue
        body = _decoded_stream_body(payload, m)
        if body is not None:
            bodies.append(body)
    # simple-font /Differences tables live in (uncompressed) font
    # dicts — scan the raw payload once; compressed font objects
    # (object streams) are out of scope, documented above
    diffs = parse_differences(payload) or None
    if not found:
        return _parse_content(payload, None, diffs)
    cmap: dict[int, str] = {}
    content: list[bytes] = []
    for body in bodies:
        if any(k in body for k in _CMAP_KEYWORDS):
            cmap.update(parse_tounicode_cmap(body))
        else:
            content.append(body)
    # per-font resolution (Tf switching); {} → document-level fallback
    fonts = _font_maps(payload)
    blocks: list[str] = []
    for body in content:
        blocks.extend(_parse_content(body, cmap or None, diffs, fonts or None))
    return blocks

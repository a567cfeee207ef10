"""From-scratch GIF codec (GIF87a / GIF89a) — the third real image
format behind the multimodal stages, built the same way as
``algorithms/png.py`` and ``algorithms/jpeg.py``: public specification
only (the CompuServe GIF89a spec as published by W3C), no external
imaging library, errors — never silent wrongness — outside the
documented scope.

Decode scope: logical screen descriptor + global color table, any
number of image descriptors with local or global palettes, the full
variable-width LZW scheme (clear / end codes, code widths 3..12, the
KwKwK first-use case, deferred clear), 4-pass row interlace, GIF89a
graphic-control extensions (transparency index, frame delay, disposal
methods 0/1 "leave", 2 "restore to background", 3 "restore to
previous"), and comment / application / plain-text extensions
(skipped via the sub-block walk). Frames are composited onto the
logical screen exactly as an animation renderer would, so
``decode_gif`` returns the *visible* frames, not the raw sub-images.

Encode scope: 8-bit indexed full-frame images over an arbitrary
256-entry palette (grayscale identity by default so uint8 arrays
roundtrip exactly), optional interlace, optional multi-frame
animation with per-frame delays. The encoder always writes opaque
full-canvas frames, which makes every frame independently decodable —
``gif_frames`` detects that and hands the video sampler truly lazy
per-frame thunks (a dependent stream degrades gracefully to
decode-on-first-touch with memoized canvas state).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["GIF_SIGS", "is_gif", "decode_gif", "encode_gif",
           "gif_frames", "gif_n_frames"]

GIF_SIGS = (b"GIF87a", b"GIF89a")


def is_gif(payload: bytes) -> bool:
    return payload[:6] in GIF_SIGS


# ---------------------------------------------------------------- LZW

def _lzw_decode(data: bytes, min_code: int, expected: int) -> np.ndarray:
    """Variable-width LSB-first LZW per GIF89a appendix F.

    ``expected`` is the pixel count from the image descriptor; output
    is truncated/validated against it. Handles clear codes anywhere
    (including the mandatory leading one and deferred clears), the
    KwKwK case, and stops at the end-of-information code."""
    if not 2 <= min_code <= 8:
        raise ValueError(f"GIF bad LZW minimum code size {min_code}")
    clear = 1 << min_code
    eoi = clear + 1
    # dictionary: index → byte sequence
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                if len(out) >= expected:  # encoder omitted EOI; accept
                    break
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # full table ⇒ deferred clear mode
                table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            # spec: an EOI (possibly after padding bits) should follow;
            # be lenient — renderers ignore trailing garbage here.
            break
    if len(out) < expected:
        raise ValueError(
            f"GIF LZW short output: {len(out)} < {expected} pixels")
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """Inverse of :func:`_lzw_decode` — emits clear, codes, EOI with
    the same width-growth rule, resetting the table when it fills."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # tobytes() below serializes one byte per symbol — a wider dtype
    # (e.g. the int16 numpy promotes uint8 % 256 to) would silently
    # interleave zero bytes, so pin the dtype here
    indices = np.ascontiguousarray(indices)
    if indices.dtype != np.uint8:
        if indices.size and (indices.min() < 0 or indices.max() > 255):
            raise ValueError("LZW symbols must fit in a byte")
        indices = indices.astype(np.uint8)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    emit(clear, width)
    w = b""
    for px in indices.tobytes():
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # decoder grows width when ITS table reaches 1<<width; its
        # table is one entry behind ours mid-phrase, so grow when the
        # just-assigned code hits the boundary
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4097:  # table full → reset, like real writers
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        w = bytes([px])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------- block layer

# 4-pass interlace grid: (row_start, row_step) per the GIF89a spec
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``pos``; returns
    (payload, position after the 0x00 terminator)."""
    chunks = []
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("GIF truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise ValueError("GIF truncated sub-block")
        chunks.append(data[pos:pos + size])
        pos += size


def _palette(data: bytes, pos: int, size_field: int) -> tuple[np.ndarray, int]:
    n = 2 << size_field  # 2^(size+1) entries
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("GIF truncated color table")
    pal = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3)
    return pal, end


class _Frame:
    """One image descriptor + its graphic-control state, parsed but
    not yet LZW-decoded (laziness for the video sampler)."""

    __slots__ = ("left", "top", "w", "h", "interlace", "palette",
                 "min_code", "lzw", "transparent", "disposal", "delay_cs")

    def __init__(self, left, top, w, h, interlace, palette, min_code,
                 lzw, transparent, disposal, delay_cs):
        self.left, self.top, self.w, self.h = left, top, w, h
        self.interlace = interlace
        self.palette = palette
        self.min_code = min_code
        self.lzw = lzw
        self.transparent = transparent
        self.disposal = disposal
        self.delay_cs = delay_cs

    def indices(self) -> np.ndarray:
        """LZW-decode → (h, w) palette indices, deinterlaced."""
        flat = _lzw_decode(self.lzw, self.min_code, self.w * self.h)
        img = flat.reshape(self.h, self.w)
        if not self.interlace:
            return img
        out = np.empty_like(img)
        src = 0
        for start, step in _INTERLACE:
            rows = range(start, self.h, step)
            out[list(rows)] = img[src:src + len(rows)]
            src += len(rows)
        return out

    def independent(self, screen_w: int, screen_h: int) -> bool:
        """True when this frame's visible pixels don't depend on the
        canvas: full-cover, no transparency."""
        return (self.left == 0 and self.top == 0 and self.w == screen_w
                and self.h == screen_h and self.transparent is None)


class _Gif:
    __slots__ = ("w", "h", "gct", "bg", "frames")

    def __init__(self, w, h, gct, bg, frames):
        self.w, self.h, self.gct, self.bg = w, h, gct, bg
        self.frames = frames


def _parse(payload: bytes) -> _Gif:
    if not is_gif(payload):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF truncated header")
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _palette(payload, pos, packed & 0x07)
    frames: list[_Frame] = []
    transparent: int | None = None
    disposal = 0
    delay_cs = 0
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("GIF truncated extension")
            label = payload[pos]
            pos += 1
            body, pos = _subblocks(payload, pos)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise ValueError("GIF short graphic-control block")
                flags = body[0]
                delay_cs = struct.unpack("<H", body[1:3])[0]
                transparent = body[3] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
            # comment / application / plain text: skipped
            continue
        if block == 0x2C:  # image descriptor
            if pos + 9 > n:
                raise ValueError("GIF truncated image descriptor")
            left, top, iw, ih, ipacked = struct.unpack(
                "<HHHHB", payload[pos:pos + 9])
            pos += 9
            pal = gct
            if ipacked & 0x80:
                pal, pos = _palette(payload, pos, ipacked & 0x07)
            if pal is None:
                raise ValueError("GIF image with no color table")
            if iw == 0 or ih == 0 or left + iw > w or top + ih > h:
                raise ValueError("GIF image outside logical screen")
            if pos >= n:
                raise ValueError("GIF truncated LZW header")
            min_code = payload[pos]
            pos += 1
            lzw, pos = _subblocks(payload, pos)
            frames.append(_Frame(left, top, iw, ih,
                                 bool(ipacked & 0x40), pal, min_code,
                                 lzw, transparent, disposal, delay_cs))
            transparent, disposal, delay_cs = None, 0, 0
            continue
        raise ValueError(f"GIF unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image")
    return _Gif(w, h, gct, bg, frames)


# ----------------------------------------------------------- decode


def _background_rgb(g: _Gif) -> np.ndarray:
    if g.gct is not None and g.bg < len(g.gct):
        return g.gct[g.bg].astype(np.uint8)
    return np.zeros(3, dtype=np.uint8)


def _composite(canvas: np.ndarray, fr: _Frame) -> None:
    idx = fr.indices()
    rgb = fr.palette[idx]  # (h, w, 3)
    view = canvas[fr.top:fr.top + fr.h, fr.left:fr.left + fr.w]
    if fr.transparent is None:
        view[:] = rgb
    else:
        opaque = idx != fr.transparent
        view[opaque] = rgb[opaque]


def decode_gif(payload: bytes, max_frames: int | None = None
               ) -> np.ndarray:
    """Decode + composite → (n_frames, H, W, 3) uint8 RGB, the frames
    a renderer would actually display. ``max_frames`` stops after
    that many composited frames — the still-image path passes 1 so an
    animated GIF misfiled as an image pays exactly one LZW decode.
    ValueError on malformed input (the multimodal stages' per-row
    quarantine path)."""
    g = _parse(payload)
    frames = g.frames if max_frames is None else g.frames[:max_frames]
    canvas = np.empty((g.h, g.w, 3), dtype=np.uint8)
    canvas[:] = _background_rgb(g)
    out = np.empty((len(frames), g.h, g.w, 3), dtype=np.uint8)
    for i, fr in enumerate(frames):
        before = None
        if fr.disposal == 3:
            before = canvas.copy()
        _composite(canvas, fr)
        out[i] = canvas
        if fr.disposal == 2:
            canvas[fr.top:fr.top + fr.h,
                   fr.left:fr.left + fr.w] = _background_rgb(g)
        elif fr.disposal == 3:
            canvas = before
    return out


def gif_frames(payload: bytes):
    """Lazy frame walk for the video sampler: yields
    ``(frame_idx, thunk)`` where ``thunk()`` → (H, W, 3) uint8 RGB.

    Frames that are provably canvas-independent (full-cover, opaque —
    everything our encoder writes) decode only when their thunk runs,
    in any order. Dependent frames advance a shared memoized canvas:
    IN-ORDER sampling decodes each LZW stream at most once;
    out-of-order access to a dependent stream replays the compositor
    from frame 0 (correct, but O(n) re-decodes per backward jump —
    samplers should touch thunks in index order)."""
    g = _parse(payload)
    state = {"canvas": None, "next": 0}

    def advance_to(i: int) -> np.ndarray:
        # replaying from the start when sampled out of order keeps the
        # walk correct at the cost of re-decoding — only dependent
        # streams (which our encoder never writes) can hit this
        if state["canvas"] is None or state["next"] > i:
            canvas = np.empty((g.h, g.w, 3), dtype=np.uint8)
            canvas[:] = _background_rgb(g)
            state["canvas"], state["next"] = canvas, 0
        shown = state["canvas"]
        while state["next"] <= i:
            fr = g.frames[state["next"]]
            before = state["canvas"].copy() if fr.disposal == 3 else None
            _composite(state["canvas"], fr)
            shown = state["canvas"].copy()
            if fr.disposal == 2:
                state["canvas"][fr.top:fr.top + fr.h,
                                fr.left:fr.left + fr.w] = _background_rgb(g)
            elif fr.disposal == 3:
                state["canvas"] = before
            state["next"] += 1
        return shown

    for idx, fr in enumerate(g.frames):
        if fr.independent(g.w, g.h):
            yield idx, (lambda fr=fr: fr.palette[fr.indices()])
        else:
            yield idx, (lambda idx=idx: advance_to(idx))


def _skip_subblocks(data: bytes, pos: int) -> int:
    """Position after a sub-block chain, copying nothing."""
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("GIF truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return pos
        if pos + size > n:
            raise ValueError("GIF truncated sub-block")
        pos += size


def gif_n_frames(payload: bytes, limit: int | None = None) -> int:
    """Frame count from a copy-free block walk — no LZW decode, no
    sub-block byte copies, and an early exit at ``limit`` (the cheap
    video-vs-still sniff only needs to know whether a second image
    descriptor exists)."""
    if not is_gif(payload):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF truncated header")
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    count = 0
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            if pos >= n:
                raise ValueError("GIF truncated extension")
            pos = _skip_subblocks(payload, pos + 1)
            continue
        if block == 0x2C:
            if pos + 9 > n:
                raise ValueError("GIF truncated image descriptor")
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            if pos >= n:
                raise ValueError("GIF truncated LZW header")
            pos = _skip_subblocks(payload, pos + 1)
            count += 1
            if limit is not None and count >= limit:
                return count
            continue
        raise ValueError(f"GIF unknown block 0x{block:02x}")
    return count


# ----------------------------------------------------------- encode

_GRAY_PAL = bytes(v for i in range(256) for v in (i, i, i))


def encode_gif(frames: np.ndarray, palette: bytes | None = None,
               interlace: bool = False, delay_cs: int = 4) -> bytes:
    """Encode (h, w) or (n, h, w) uint8 index arrays as GIF89a.

    Default palette is the 256-entry grayscale identity, so grayscale
    uint8 arrays roundtrip exactly (``decode_gif(...)[..., 0]`` gives
    the input back). Multi-frame input becomes an animation: a
    graphic-control extension per frame carries ``delay_cs``; frames
    are full-canvas and opaque (hence independently decodable)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[None]
    if arr.ndim != 3:
        raise ValueError("encode_gif expects (h, w) or (n, h, w)")
    n, h, w = arr.shape
    if h == 0 or w == 0 or n == 0:
        raise ValueError("encode_gif: empty input")
    pal = _GRAY_PAL if palette is None else palette
    if len(pal) != 768:
        raise ValueError("encode_gif: palette must be 256 RGB entries")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)
    out += pal
    animated = n > 1
    for f in range(n):
        if animated:
            out += b"\x21\xF9\x04"
            out += struct.pack("<BHB", 0x00, delay_cs, 0)  # no transp
            out += b"\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0x00)
        img = arr[f]
        if interlace:
            rows = [img[s::t] for s, t in _INTERLACE]
            img = np.concatenate(rows, axis=0)
        out.append(8)  # LZW minimum code size for 8-bit indices
        data = _lzw_encode(img.reshape(-1), 8)
        for i in range(0, len(data), 255):
            block = data[i:i + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)

"""TIFF-variant LZW (TIFF 6.0 §13 == PDF LZWDecode, spec §7.4.4):
MSB-first bit packing, 9-bit codes growing to 12, 256=ClearTable,
257=EOD, new entries from 258, with the /EarlyChange quirk (width
grows ONE entry before the table size demands it — the historical
off-by-one both specs standardize; ``early=0`` is the PDF
DecodeParms variant).

Shared by the PDF stream-filter chain and the TIFF codec. The
encoder mirrors the decoder's (next_code, width) state machine
step-for-step — the decoder's table lags the encoder's by exactly
one entry, so the encoder tracks the DECODER's count for width
transitions and emits a ClearTable before any code could outgrow
12 bits."""

from __future__ import annotations

__all__ = ["lzw_decode", "lzw_encode"]

_CLEAR, _EOD, _FIRST = 256, 257, 258


def lzw_decode(data: bytes, early: int = 1) -> bytes:
    out = bytearray()
    table: dict[int, bytes] = {}
    width = 9
    prev: bytes | None = None
    next_code = _FIRST
    bitbuf = 0
    nbits = 0

    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == _CLEAR:
                table.clear()
                width = 9
                prev = None
                next_code = _FIRST
                continue
            if code == _EOD:
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ValueError("LZW: first code not a literal")
                entry = bytes([code])
            elif code < 256:
                entry = bytes([code])
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("LZW: code beyond table")
            if prev is not None:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code + early >= (1 << width) and width < 12:
                    width += 1
            out += entry
            prev = entry
    return bytes(out)  # missing EOD tolerated (common malformation)


class _MsbWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | value
        self.nbits += width
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """String-table LZW compress; ``lzw_decode(lzw_encode(x)) == x``
    for either ``early``. Emits ClearTable whenever the table nears
    the 12-bit ceiling (a slightly-early clear is always legal)."""
    bw = _MsbWriter()
    width = 9
    dec_next = _FIRST        # the DECODER's next_code after our emits
    dec_first = True

    def emit(code: int) -> None:
        nonlocal width, dec_next, dec_first
        bw.write(code, width)
        if code == _CLEAR:
            width, dec_next, dec_first = 9, _FIRST, True
        elif code != _EOD:
            if not dec_first:
                dec_next += 1
                if dec_next + early >= (1 << width) and width < 12:
                    width += 1
            dec_first = False

    emit(_CLEAR)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _FIRST
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        w = c
        if next_code >= 4093:    # table nearly full: clear both sides
            emit(_CLEAR)
            table = {bytes([j]): j for j in range(256)}
            next_code = _FIRST
    if w:
        emit(table[w])
    emit(_EOD)
    return bw.flush()

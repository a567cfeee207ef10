"""EXIF metadata harvest — camera/provenance fields from JPEG APP1
segments (and bare TIFFs), built entirely on the repo's own TIFF IFD
walker (:func:`nidaba_ray.algorithms.tiff.read_ifd_at`). The EXIF
payload IS a TIFF blob: APP1 = ``Exif\\0\\0`` + a self-contained TIFF
header whose IFD0 carries the camera tags and whose ExifIFD pointer
(tag 34665) is an offset into the same blob.

Harvested fields (the provenance set a training-data pipeline keeps
for dedup/forensics): make, model, software, datetime (IFD0 306),
datetime_original (ExifIFD 36867), orientation (IFD0 274). ASCII
values arrive NUL-terminated per spec; trailing NULs strip. A JPEG
without an APP1/EXIF segment returns an empty dict — absence is not
an error; malformed STRUCTURE raises ValueError (quarantine)."""

from __future__ import annotations

__all__ = ["exif_from_jpeg", "exif_from_tiff_blob"]

_IFD0_FIELDS = {271: "make", 272: "model", 305: "software",
                306: "datetime"}
_EXIF_IFD_POINTER = 34665
_EXIF_FIELDS = {36867: "datetime_original"}
_ORIENTATION = 274


def _ascii(v) -> str:
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).rstrip(b"\x00").decode("latin-1").strip()
    return str(v)


def exif_from_tiff_blob(blob: bytes) -> dict:
    """TIFF blob (as embedded in APP1, or a bare .tif file) → the
    harvested field dict."""
    import struct

    from nidaba_ray.algorithms.tiff import is_tiff, read_ifd_at

    if not is_tiff(blob):
        raise ValueError("exif: payload is not a TIFF blob")
    bo = "<" if blob[:2] == b"II" else ">"
    (ifd0_off,) = struct.unpack(bo + "I", blob[4:8])
    tags = read_ifd_at(blob, bo, ifd0_off)
    out: dict = {}
    for tag, name in _IFD0_FIELDS.items():
        if tag in tags:
            out[name] = _ascii(tags[tag][2])
    if _ORIENTATION in tags:
        out["orientation"] = int(tags[_ORIENTATION][2][0])
    if _EXIF_IFD_POINTER in tags:
        sub_off = int(tags[_EXIF_IFD_POINTER][2][0])
        sub = read_ifd_at(blob, bo, sub_off)
        for tag, name in _EXIF_FIELDS.items():
            if tag in sub:
                out[name] = _ascii(sub[tag][2])
    return out


def exif_from_jpeg(payload: bytes) -> dict:
    """JPEG bytes → harvested EXIF fields ({} when no APP1/EXIF
    segment exists). Walks markers up to the first scan."""
    from nidaba_ray.algorithms.jpeg import is_jpeg

    if not is_jpeg(payload):
        raise ValueError("exif: payload is not a JPEG")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("exif: lost marker sync")
        marker = payload[pos + 1]
        if marker == 0xDA:  # start of scan — no APP1 seen
            return {}
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = int.from_bytes(payload[pos + 2:pos + 4], "big")
        if marker == 0xE1 and payload[pos + 4:pos + 10] == b"Exif\x00\x00":
            return exif_from_tiff_blob(
                payload[pos + 10:pos + 2 + seg_len])
        pos += 2 + seg_len
    return {}

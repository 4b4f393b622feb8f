"""EXIF metadata in JPEG APP1 — the TIFF-IFD structure (EXIF 2.3 /
JEITA CP-3451, public spec) every camera image carries.

A multimodal corpus audit reads EXIF without decoding pixels:
orientation (the #1 cause of silently-rotated training images),
camera make/model (dedup/attribution), capture time. The payload is a
real TIFF IFD (same framing as ``sources/geotiff.py``'s reader,
re-implemented here in the ~80 lines the APP1 subset needs): byte-order
mark II/MM, magic 42, IFD entry stream, inline-or-offset values.

``insert_exif`` splices a spec-valid APP1 right after SOI, so existing
decoders (``sources/jpeg.py`` walks and skips APPn) are unaffected;
``parse_exif`` finds the segment and walks IFD0 + the ExifIFD pointer.
q375 value-checks the round trip against an analytic oracle.
"""

from __future__ import annotations

import struct

# IFD0 / Exif tags the audit reads
TAG_MAKE = 271
TAG_MODEL = 272
TAG_ORIENTATION = 274
TAG_DATETIME = 306
TAG_EXIF_IFD = 34665
TAG_GPS_IFD = 34853
TAG_ISO = 34855
# GPS IFD tags (EXIF 2.3 §4.6.6); values land in the same flat dict
# offset by _GPS_NS so they can't collide with IFD0/Exif tag numbers
GPS_LAT_REF = 1
GPS_LAT = 2
GPS_LON_REF = 3
GPS_LON = 4
_GPS_NS = 0x10000


def gps_tag(t: int) -> int:
    """Namespaced key of GPS tag ``t`` in ``parse_exif``'s output."""
    return _GPS_NS + t


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def build_exif(
    make: str = "", model: str = "", orientation: int = 1,
    datetime: str = "", iso: int | None = None,
    gps: tuple | None = None,
    byte_order: str = "II",
) -> bytes:
    """APP1 payload: 'Exif\\0\\0' + TIFF header + IFD0 (+ ExifIFD when
    iso is given, + GPS IFD when ``gps`` is given). Both byte orders
    supported. ``gps`` = (lat_ref, lat_dms, lon_ref, lon_dms) with each
    dms a 3-tuple of (numerator, denominator) RATIONALs — the EXIF 2.3
    GPS layout every camera writes."""
    en = "<" if byte_order == "II" else ">"

    def entry(tag, ftype, values, extra_at):
        if ftype == 2:  # ASCII, NUL-terminated
            data = values.encode("ascii") + b"\x00"
            n = len(data)
        elif ftype == 5:  # RATIONAL: 2 x u32 per value
            data = b"".join(struct.pack(en + "II", num, den)
                            for num, den in values)
            n = len(values)
        else:
            data = b"".join(struct.pack(
                en + {3: "H", 4: "I"}[ftype], v) for v in values)
            n = len(values)
        if len(data) <= 4:
            inline = data + b"\x00" * (4 - len(data))
            return struct.pack(en + "HHI", tag, ftype, n) + inline, b""
        return (struct.pack(en + "HHII", tag, ftype, n, extra_at),
                data + (b"\x00" if len(data) % 2 else b""))

    entries0 = []
    if make:
        entries0.append((TAG_MAKE, 2, make))
    if model:
        entries0.append((TAG_MODEL, 2, model))
    entries0.append((TAG_ORIENTATION, 3, [orientation]))
    if datetime:
        entries0.append((TAG_DATETIME, 2, datetime))

    exif_entries = [(TAG_ISO, 3, [iso])] if iso is not None else []
    gps_entries = []
    if gps is not None:
        lat_ref, lat_dms, lon_ref, lon_dms = gps
        gps_entries = [
            (GPS_LAT_REF, 2, lat_ref),
            (GPS_LAT, 5, list(lat_dms)),
            (GPS_LON_REF, 2, lon_ref),
            (GPS_LON, 5, list(lon_dms)),
        ]

    # layout: header(8) + IFD0 + [ExifIFD] + [GPSIFD] + value area
    n0 = (len(entries0) + (1 if exif_entries else 0)
          + (1 if gps_entries else 0))
    ifd0_at = 8
    ifd0_size = 2 + 12 * n0 + 4
    exif_at = ifd0_at + ifd0_size
    exif_size = (2 + 12 * len(exif_entries) + 4) if exif_entries else 0
    gps_at = exif_at + exif_size
    gps_size = (2 + 12 * len(gps_entries) + 4) if gps_entries else 0
    extra_at = gps_at + gps_size

    def render(entries, extra_at, extra_parts):
        body = b""
        for tag, ftype, values in entries:
            e, extra = entry(tag, ftype, values, extra_at)
            body += e
            extra_parts.append(extra)
            extra_at += len(extra)
        return body, extra_at

    extras: list[bytes] = []
    body0, extra_at = render(list(entries0), extra_at, extras)
    if exif_entries:
        body0 += struct.pack(en + "HHII", TAG_EXIF_IFD, 4, 1, exif_at)
    if gps_entries:
        body0 += struct.pack(en + "HHII", TAG_GPS_IFD, 4, 1, gps_at)
    ifd0 = struct.pack(en + "H", n0) + body0 + struct.pack(en + "I", 0)
    exif_ifd = b""
    if exif_entries:
        bodyx, extra_at = render(exif_entries, extra_at, extras)
        exif_ifd = (struct.pack(en + "H", len(exif_entries)) + bodyx
                    + struct.pack(en + "I", 0))
    gps_ifd = b""
    if gps_entries:
        bodyg, extra_at = render(gps_entries, extra_at, extras)
        gps_ifd = (struct.pack(en + "H", len(gps_entries)) + bodyg
                   + struct.pack(en + "I", 0))
    tiff = (byte_order.encode() + struct.pack(en + "HI", 42, ifd0_at)
            + ifd0 + exif_ifd + gps_ifd + b"".join(extras))
    return b"Exif\x00\x00" + tiff


def insert_exif(jpeg: bytes, exif_payload: bytes) -> bytes:
    """Splice an APP1 Exif segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    seg = b"\xff\xe1" + struct.pack(">H", len(exif_payload) + 2) \
        + exif_payload
    return jpeg[:2] + seg + jpeg[2:]


def _read_ifd(tiff: bytes, en: str, at: int, out: dict,
              ns: int = 0) -> None:
    (n,) = struct.unpack_from(en + "H", tiff, at)
    for i in range(n):
        tag, ftype, cnt = struct.unpack_from(
            en + "HHI", tiff, at + 2 + 12 * i)
        voff = at + 2 + 12 * i + 8
        size = _TYPE_SIZE.get(ftype, 1) * cnt
        if size > 4:
            (voff,) = struct.unpack_from(en + "I", tiff, voff)
        if ftype == 2:
            val = tiff[voff:voff + cnt].split(b"\x00")[0].decode(
                "ascii", "replace")
        elif ftype == 3:
            vals = struct.unpack_from(en + f"{cnt}H", tiff, voff)
            val = vals[0] if cnt == 1 else list(vals)
        elif ftype == 4:
            vals = struct.unpack_from(en + f"{cnt}I", tiff, voff)
            val = vals[0] if cnt == 1 else list(vals)
        elif ftype == 5:  # RATIONAL: (numerator, denominator) pairs
            raw = struct.unpack_from(en + f"{2 * cnt}I", tiff, voff)
            pairs = [(raw[2 * k], raw[2 * k + 1]) for k in range(cnt)]
            val = pairs[0] if cnt == 1 else pairs
        else:
            val = tiff[voff:voff + size]
        out[ns + tag] = val


def parse_exif(jpeg: bytes) -> dict:
    """Walk the JPEG marker stream to APP1 'Exif', parse IFD0 and the
    ExifIFD pointer. Returns {tag: value}; empty dict when no EXIF."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    n = len(jpeg)
    while pos < n:
        if jpeg[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # ITU T.81 B.1.1.2: any marker may be preceded by a run of
        # 0xFF fill bytes — skip the run, then read the marker byte.
        while pos < n and jpeg[pos] == 0xFF:
            pos += 1
        if pos >= n:
            return {}
        marker = jpeg[pos]
        pos += 1
        if marker == 0x00:  # FF 00 is a stuffed data byte, not a marker
            raise ValueError("bad JPEG marker stream (stuffed byte)")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / RSTn: standalone markers, no length field
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no EXIF ahead
            return {}
        if pos + 2 > n:
            return {}
        (seg_len,) = struct.unpack(">H", jpeg[pos:pos + 2])
        if marker == 0xE1 and jpeg[pos + 2:pos + 8] == b"Exif\x00\x00":
            tiff = jpeg[pos + 8:pos + seg_len]
            order = tiff[:2]
            if order not in (b"II", b"MM"):
                raise ValueError(f"bad TIFF byte order {order!r}")
            en = "<" if order == b"II" else ">"
            magic, ifd0 = struct.unpack_from(en + "HI", tiff, 2)
            if magic != 42:
                raise ValueError(f"bad TIFF magic {magic}")
            out: dict = {}
            _read_ifd(tiff, en, ifd0, out)
            if TAG_EXIF_IFD in out:
                _read_ifd(tiff, en, int(out[TAG_EXIF_IFD]), out)
            if TAG_GPS_IFD in out:
                # GPS tag numbers restart at 1 (EXIF 2.3 §4.6.6):
                # namespace them so they can't shadow IFD0 tags
                _read_ifd(tiff, en, int(out[TAG_GPS_IFD]), out,
                          ns=_GPS_NS)
            return out
        pos += seg_len
    return {}


def gps_decimal(tags: dict) -> tuple[float, float] | None:
    """(lat, lon) in signed decimal degrees from a parsed tag dict, or
    None when no GPS IFD was present. S/W references negate."""
    lat = tags.get(gps_tag(GPS_LAT))
    lon = tags.get(gps_tag(GPS_LON))
    if lat is None or lon is None:
        return None

    def dms(v):
        return sum((num / den) / 60 ** k
                   for k, (num, den) in enumerate(v))

    la = dms(lat) * (-1 if tags.get(gps_tag(GPS_LAT_REF)) == "S" else 1)
    lo = dms(lon) * (-1 if tags.get(gps_tag(GPS_LON_REF)) == "W" else 1)
    return la, lo


def apply_orientation(img, orientation: int):
    """Normalize a decoded image to display orientation per EXIF tag
    274 — the #1 cause of silently-rotated training images: the pixels
    are stored as the sensor saw them and the tag says how to show
    them. Returns a numpy array (H', W') with dims swapped for the
    transposed orientations 5-8."""
    import numpy as np

    if orientation == 1:
        return img
    if orientation == 2:
        return np.fliplr(img)
    if orientation == 3:
        return img[::-1, ::-1]
    if orientation == 4:
        return np.flipud(img)
    if orientation == 5:
        return np.swapaxes(img, 0, 1)
    if orientation == 6:  # rotate 90 CW for display
        return np.rot90(img, k=-1)
    if orientation == 7:  # transverse: transpose + rotate 180
        return np.swapaxes(img, 0, 1)[::-1, ::-1]
    if orientation == 8:
        return np.rot90(img, k=1)
    raise ValueError(f"EXIF orientation {orientation} out of range")

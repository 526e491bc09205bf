"""MP4 (ISO BMFF) metadata: pure-stdlib box walk, no codec work.

The reference treats video files as opaque blobs with out-of-band
metadata; a 100 TB multimodal corpus needs the metadata IN-BAND — the
MP4 container's box structure (ISO/IEC 14496-12, the published ISO
Base Media File Format) carries duration, track layout, codec fourcc,
dimensions and sample counts without touching a single coded frame.
This module implements exactly that layer:

* :func:`parse_mp4` — a defensive box walk (32-bit sizes, ``size==1``
  64-bit largesize, ``size==0`` to-EOF, version 0/1 full boxes,
  unknown boxes skipped) extracting ``ftyp`` brand, ``mvhd`` movie
  duration, and per-``trak``: ``tkhd`` id + 16.16 dims, ``mdhd``
  media timescale/duration, ``hdlr`` handler, ``stsd`` codec fourcc
  (+ visual dims / audio rate), ``stts``/``stsz`` sample counts.
* :func:`encode_mp4` — a structurally valid metadata-only writer used
  by the deterministic media generator and the tests: real ftyp/moov
  box tree, opaque ``mdat`` payload. Frame DECODING stays out of
  scope (inter-frame codecs need ffmpeg, not in this container) —
  this is the honest boundary: metadata features are real, pixels are
  not promised.

Everything is big-endian struct parsing over one in-memory payload —
inside Spark it runs per row in the existing Arrow-batched
``mapInPandas`` feature kernel (multimodal/media.py), so the binary
never crosses the JVM boundary decoded.
"""

from __future__ import annotations

import struct


def _full_box(version: int, flags: int, body: bytes) -> bytes:
    return struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), typ) + body


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _mvhd(timescale: int, duration: int, version: int) -> bytes:
    times = (
        struct.pack(">QQIQ", 0, 0, timescale, duration)
        if version == 1
        else struct.pack(">IIII", 0, 0, timescale, duration)
    )
    body = (
        times
        + struct.pack(">iHH", 0x10000, 0x0100, 0)  # rate 1.0, volume 1.0
        + b"\x00" * 8
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 0xFFFFFFFF)  # next_track_id
    )
    return _box(b"mvhd", _full_box(version, 0, body))


def _tkhd(track_id: int, duration: int, w: int, h: int, version: int) -> bytes:
    times = (
        struct.pack(">QQIIQ", 0, 0, track_id, 0, duration)
        if version == 1
        else struct.pack(">IIIII", 0, 0, track_id, 0, duration)
    )
    body = (
        times
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0x0100, 0)  # layer, group, volume
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16)  # 16.16 fixed point
    )
    return _box(b"tkhd", _full_box(version, 7, body))  # enabled|in_movie|preview


def _mdhd(timescale: int, duration: int, version: int) -> bytes:
    times = (
        struct.pack(">QQIQ", 0, 0, timescale, duration)
        if version == 1
        else struct.pack(">IIII", 0, 0, timescale, duration)
    )
    # language "und" packed as three 5-bit (char - 0x60) fields
    lang = ((ord("u") - 0x60) << 10) | ((ord("n") - 0x60) << 5) | (ord("d") - 0x60)
    return _box(b"mdhd", _full_box(version, 0, times + struct.pack(">HH", lang, 0)))


def _hdlr(handler: bytes, name: bytes = b"") -> bytes:
    body = b"\x00" * 4 + handler + b"\x00" * 12 + name + b"\x00"
    return _box(b"hdlr", _full_box(0, 0, body))


def _sample_entry_header(fourcc: bytes) -> bytes:
    return fourcc + b"\x00" * 6 + struct.pack(">H", 1)  # data_reference_index


def _stsd_video(fourcc: bytes, w: int, h: int) -> bytes:
    entry_body = (
        _sample_entry_header(fourcc)
        + struct.pack(">HH", 0, 0)
        + b"\x00" * 12
        + struct.pack(">HH", w, h)
        + struct.pack(">IIIH", 0x480000, 0x480000, 0, 1)  # 72 dpi, frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    entry = struct.pack(">I", 8 + len(entry_body)) + entry_body
    return _box(b"stsd", _full_box(0, 0, struct.pack(">I", 1) + entry))


def _stsd_audio(fourcc: bytes, rate: int, channels: int) -> bytes:
    entry_body = (
        _sample_entry_header(fourcc)
        + b"\x00" * 8
        + struct.pack(">HHHH", channels, 16, 0, 0)
        + struct.pack(">I", rate << 16)  # 16.16 fixed point
    )
    entry = struct.pack(">I", 8 + len(entry_body)) + entry_body
    return _box(b"stsd", _full_box(0, 0, struct.pack(">I", 1) + entry))


def _stts(n_samples: int, delta: int) -> bytes:
    return _box(
        b"stts", _full_box(0, 0, struct.pack(">III", 1, n_samples, delta))
    )


def _stsz(sizes: list[int]) -> bytes:
    body = struct.pack(">II", 0, len(sizes)) + b"".join(
        struct.pack(">I", s) for s in sizes
    )
    return _box(b"stsz", _full_box(0, 0, body))


def encode_mp4(
    duration_ms: int,
    video: dict | None = None,
    audio: dict | None = None,
    mdat: bytes = b"",
    timescale: int = 1000,
    version: int = 0,
    brand: bytes = b"isom",
) -> bytes:
    """Structurally valid metadata-only MP4: real ftyp/moov box tree
    (mvhd + one trak per supplied track spec, each with tkhd / mdhd /
    hdlr / minf / stbl{stsd, stts, stsz}), opaque ``mdat``.

    ``video``: ``{"width", "height", "n_samples", "codec"?}`` (codec
    fourcc defaults to ``mp4v``; no codec-config child box is written
    — coded frames are out of scope by design).
    ``audio``: ``{"sample_rate", "channels"?, "n_samples", "codec"?}``.
    ``version``: 0 or 1 (64-bit times) for mvhd/tkhd/mdhd, exercising
    both full-box layouts the parser must handle.
    """
    duration = duration_ms * timescale // 1000
    traks = []
    track_id = 1
    for spec, is_video in ((video, True), (audio, False)):
        if spec is None:
            continue
        n = int(spec["n_samples"])
        if is_video:
            fourcc = spec.get("codec", b"mp4v")
            stsd = _stsd_video(fourcc, int(spec["width"]), int(spec["height"]))
            handler = b"vide"
            w, h = int(spec["width"]), int(spec["height"])
        else:
            fourcc = spec.get("codec", b"mp4a")
            stsd = _stsd_audio(
                fourcc, int(spec["sample_rate"]), int(spec.get("channels", 1))
            )
            handler = b"soun"
            w = h = 0
        delta = max(1, duration // max(n, 1))
        sizes = [64 + (i % 7) for i in range(n)]
        stbl = _box(b"stbl", stsd + _stts(n, delta) + _stsz(sizes))
        minf = _box(b"minf", stbl)
        mdia = _box(
            b"mdia",
            _mdhd(timescale, duration, version) + _hdlr(handler) + minf,
        )
        traks.append(
            _box(b"trak", _tkhd(track_id, duration, w, h, version) + mdia)
        )
        track_id += 1
    moov = _box(b"moov", _mvhd(timescale, duration, version) + b"".join(traks))
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mp42")
    return ftyp + moov + _box(b"mdat", mdat)


def _walk(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end).

    Handles 64-bit largesize (size==1) and to-EOF (size==0); stops —
    rather than desynchronizing — on a box that overruns its parent.
    """
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", b, pos)
        header = 8
        if size == 1:
            if pos + 16 > end:
                break
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            break
        yield typ, pos + header, pos + size
        pos += size


def _find(b: bytes, start: int, end: int, typ: bytes):
    for t, s, e in _walk(b, start, end):
        if t == typ:
            return s, e
    return None


def _read_full(b: bytes, s: int):
    version = b[s]
    return version, s + 4


def _parse_mvhd_like(b: bytes, s: int):
    """mvhd/mdhd share (creation, modification, timescale, duration)
    with 4-byte fields at version 0 and 8/8/4/8 at version 1."""
    v, p = _read_full(b, s)
    if v == 1:
        _, _, timescale, duration = struct.unpack_from(">QQIQ", b, p)
    else:
        _, _, timescale, duration = struct.unpack_from(">IIII", b, p)
    return timescale, duration


def _parse_tkhd(b: bytes, s: int, e: int):
    v, p = _read_full(b, s)
    if v == 1:
        _, _, track_id, _, duration = struct.unpack_from(">QQIIQ", b, p)
        p += 32
    else:
        _, _, track_id, _, duration = struct.unpack_from(">IIIII", b, p)
        p += 20
    p += 8 + 8 + 36  # reserved, layer/group/volume/reserved, matrix
    w_fixed, h_fixed = struct.unpack_from(">II", b, p)
    return track_id, duration, w_fixed >> 16, h_fixed >> 16


def _parse_stsd(b: bytes, s: int, e: int, handler: str):
    _, p = _read_full(b, s)
    (entry_count,) = struct.unpack_from(">I", b, p)
    if entry_count < 1 or p + 12 > e:
        return None
    entry_size, fourcc = struct.unpack_from(">I4s", b, p + 4)
    q = p + 4 + 8 + 6 + 2  # entry header + reserved + data_reference_index
    out = {"codec": fourcc.decode("latin-1")}
    if handler == "vide" and q + 20 <= e:
        out["width"], out["height"] = struct.unpack_from(">HH", b, q + 16)
    elif handler == "soun" and q + 20 <= e:
        (rate_fixed,) = struct.unpack_from(">I", b, q + 16)
        out["sample_rate"] = rate_fixed >> 16
    return out


def parse_mp4(b: bytes) -> dict:
    """ISO BMFF box walk → metadata dict.

    Returns ``{"brand", "duration_ms", "timescale", "tracks": [
    {"track_id", "handler", "codec", "width", "height",
    "sample_rate", "n_samples", "duration_ms"}, ...]}``. Raises
    ``ValueError`` when the payload is not ISO BMFF (no parseable
    ftyp/moov) — never returns garbage from a desynchronized walk.
    """
    if len(b) < 16:
        raise ValueError("not an ISO BMFF payload (too short)")
    brand = None
    moov = None
    for typ, s, e in _walk(b, 0, len(b)):
        if typ == b"ftyp" and s + 4 <= e:
            brand = b[s : s + 4].decode("latin-1")
        elif typ == b"moov":
            moov = (s, e)
    if moov is None:
        raise ValueError("not an ISO BMFF payload (no moov box)")
    ms, me = moov
    mvhd = _find(b, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("moov without mvhd")
    timescale, duration = _parse_mvhd_like(b, mvhd[0])
    out = {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": duration * 1000 // max(timescale, 1),
        "tracks": [],
    }
    for typ, ts, te in _walk(b, ms, me):
        if typ != b"trak":
            continue
        track: dict = {
            "track_id": None, "handler": None, "codec": None,
            "width": None, "height": None, "sample_rate": None,
            "n_samples": None, "duration_ms": None,
        }
        tkhd = _find(b, ts, te, b"tkhd")
        if tkhd is not None:
            tid, _, w, h = _parse_tkhd(b, tkhd[0], tkhd[1])
            track["track_id"] = tid
            if w:
                track["width"], track["height"] = w, h
        mdia = _find(b, ts, te, b"mdia")
        if mdia is not None:
            mdhd = _find(b, mdia[0], mdia[1], b"mdhd")
            if mdhd is not None:
                mts, mdur = _parse_mvhd_like(b, mdhd[0])
                track["duration_ms"] = mdur * 1000 // max(mts, 1)
            hdlr = _find(b, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                track["handler"] = b[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
            minf = _find(b, mdia[0], mdia[1], b"minf")
            stbl = minf and _find(b, minf[0], minf[1], b"stbl")
            if stbl:
                stsd = _find(b, stbl[0], stbl[1], b"stsd")
                if stsd is not None:
                    info = _parse_stsd(b, stsd[0], stsd[1], track["handler"])
                    if info:
                        track["codec"] = info.get("codec")
                        track["width"] = info.get("width", track["width"])
                        track["height"] = info.get("height", track["height"])
                        track["sample_rate"] = info.get("sample_rate")
                stsz = _find(b, stbl[0], stbl[1], b"stsz")
                if stsz is not None:
                    _, p = _read_full(b, stsz[0])
                    _, n = struct.unpack_from(">II", b, p)
                    track["n_samples"] = n
                elif (stts := _find(b, stbl[0], stbl[1], b"stts")) is not None:
                    _, p = _read_full(b, stts[0])
                    (n_entries,) = struct.unpack_from(">I", b, p)
                    total = 0
                    for i in range(n_entries):
                        cnt, _ = struct.unpack_from(">II", b, p + 4 + 8 * i)
                        total += cnt
                    track["n_samples"] = total
        out["tracks"].append(track)
    return out

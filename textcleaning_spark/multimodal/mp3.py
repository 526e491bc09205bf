"""MP3 (MPEG audio) metadata: pure-stdlib frame-header walk, no PCM.

Companion to multimodal/mp4.py and the same honest boundary: the
4-byte MPEG audio frame header (ISO/IEC 11172-3 §2.4.1 / 13818-3) is a
published bit layout — 11-bit sync, version, layer, bitrate index,
sample-rate index, padding, channel mode — and the frame length is
pure arithmetic over those fields, so walking header→header yields the
REAL frame count, duration, bitrate and sample rate without decoding a
single granule. Psychoacoustic PCM reconstruction needs ffmpeg (not in
this container) and stays out of scope.

* :func:`parse_mp3` — skip an ID3v2 tag (syncsafe size), then walk
  validated frame headers to EOF; raises ``ValueError`` on non-MPEG
  payloads instead of desynchronizing.
* :func:`encode_mp3_meta` — structurally valid metadata-only writer
  (correct headers + frame-length padding arithmetic, opaque payload
  bytes) used by tests; it does NOT produce decodable audio.
"""

from __future__ import annotations

import struct

# Layer III/II/I bitrate tables, kbps, index 1..14 (0 = free, 15 = bad).
_BITRATES = {
    # (mpeg1?, layer): [kbps]
    (True, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (True, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (True, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (False, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (False, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (False, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
# version bits → sample-rate table (index 0..2; 3 = reserved)
_RATES = {
    3: (44100, 48000, 32000),  # MPEG-1
    2: (22050, 24000, 16000),  # MPEG-2
    0: (11025, 12000, 8000),  # MPEG-2.5
}
_CHANNELS = {0: 2, 1: 2, 2: 2, 3: 1}  # stereo/joint/dual/mono


def _samples_per_frame(mpeg1: bool, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if mpeg1 else 576  # Layer III halves at MPEG-2/2.5


def _frame_len(mpeg1: bool, layer: int, kbps: int, rate: int, pad: int) -> int:
    if layer == 1:
        return (12000 * kbps // rate + pad) * 4
    coef = 144000 if (mpeg1 or layer == 2) else 72000
    return coef * kbps // rate + pad


def _parse_header(word: int):
    """4-byte big-endian header word → field dict, or None if invalid."""
    if word >> 21 != 0x7FF:
        return None
    version = (word >> 19) & 3
    layer_bits = (word >> 17) & 3
    if version == 1 or layer_bits == 0:
        return None  # reserved version / reserved layer
    layer = 4 - layer_bits  # 01→III, 10→II, 11→I
    bidx = (word >> 12) & 0xF
    ridx = (word >> 10) & 3
    if bidx in (0, 15) or ridx == 3:
        return None  # free-format / bad bitrate, reserved rate
    mpeg1 = version == 3
    kbps = _BITRATES[(mpeg1, layer)][bidx]
    rate = _RATES[version][ridx]
    return {
        "mpeg1": mpeg1,
        "version": {3: "1", 2: "2", 0: "2.5"}[version],
        "layer": layer,
        "bitrate_kbps": kbps,
        "sample_rate": rate,
        "padding": (word >> 9) & 1,
        "channels": _CHANNELS[(word >> 6) & 3],
        "frame_len": _frame_len(mpeg1, layer, kbps, rate, (word >> 9) & 1),
        "spf": _samples_per_frame(mpeg1, layer),
    }


def _skip_id3v2(b: bytes) -> int:
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = 0
    for byte in b[6:10]:
        if byte & 0x80:
            raise ValueError("malformed ID3v2 syncsafe size")
        size = (size << 7) | byte
    return 10 + size


def parse_mp3(b: bytes) -> dict:
    """Frame-header walk → ``{"version", "layer", "bitrate_kbps",
    "sample_rate", "channels", "n_frames", "duration_ms"}``.

    Header fields come from the FIRST frame; the walk then requires
    every subsequent header to keep version/layer/sample-rate (bitrate
    and padding may vary per frame — VBR is real) and stops cleanly at
    EOF or a truncated final frame. Raises ``ValueError`` when no
    valid first frame exists where one is required (after the optional
    ID3v2 tag)."""
    pos = _skip_id3v2(b)
    if pos + 4 > len(b):
        raise ValueError("not an MPEG audio payload (too short)")
    (word,) = struct.unpack_from(">I", b, pos)
    first = _parse_header(word)
    if first is None:
        raise ValueError("not an MPEG audio payload (no frame sync)")
    n_frames, samples = 0, 0
    while pos + 4 <= len(b):
        (word,) = struct.unpack_from(">I", b, pos)
        h = _parse_header(word)
        if (
            h is None
            or h["version"] != first["version"]
            or h["layer"] != first["layer"]
            or h["sample_rate"] != first["sample_rate"]
        ):
            break  # trailing tag (ID3v1 etc.) or junk: stop, don't resync
        if pos + h["frame_len"] > len(b):
            break  # truncated final frame
        n_frames += 1
        samples += h["spf"]
        pos += h["frame_len"]
    if n_frames == 0:
        raise ValueError("not an MPEG audio payload (no complete frame)")
    return {
        "version": first["version"],
        "layer": first["layer"],
        "bitrate_kbps": first["bitrate_kbps"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "duration_ms": samples * 1000 // first["sample_rate"],
    }


_BIDX = {
    (mpeg1, layer): {k: i for i, k in enumerate(tab)}
    for (mpeg1, layer), tab in _BITRATES.items()
}
_RIDX = {rate: (v, i) for v, tab in _RATES.items() for i, rate in enumerate(tab)}


def encode_mp3_meta(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 48000,
    mono: bool = True,
    layer: int = 3,
    pad_every: int = 0,
    id3: bytes = b"",
) -> bytes:
    """Structurally valid MPEG audio frame sequence: correct headers
    and frame-length arithmetic, opaque (non-decodable) frame bodies.
    ``pad_every=k`` sets the padding bit on every k-th frame to
    exercise the +1-slot length rule. ``id3`` prepends an ID3v2 tag
    with that payload."""
    version, ridx = _RIDX[sample_rate]
    mpeg1 = version == 3
    bidx = _BIDX[(mpeg1, layer)][bitrate_kbps]
    layer_bits = 4 - layer
    out = []
    if id3:
        size = len(id3)
        syncsafe = bytes(
            (size >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        out.append(b"ID3\x04\x00\x00" + syncsafe + id3)
    for i in range(n_frames):
        pad = 1 if pad_every and (i + 1) % pad_every == 0 else 0
        word = (
            (0x7FF << 21)
            | (version << 19)
            | (layer_bits << 17)
            | (1 << 16)  # protection: no CRC
            | (bidx << 12)
            | (ridx << 10)
            | (pad << 9)
            | ((3 if mono else 0) << 6)
        )
        flen = _frame_len(mpeg1, layer, bitrate_kbps, sample_rate, pad)
        body = bytes((i + j) % 251 for j in range(flen - 4))
        out.append(struct.pack(">I", word) + body)
    return b"".join(out)

"""Pure-Python media codecs (stdlib only) for the multimodal pipeline.

The container ships no PIL/ffmpeg/librosa, but PNG and WAV are simple
enough to decode with ``zlib`` + ``struct``: these give
:func:`py_etl_spark.operators.multimodal.extract_features` a REAL decode
path — actual pixels and PCM samples, not hash-derived fakes — while the
heavyweight formats stay behind the injected-codec seam.

- PNG: signature + IHDR parse, full IDAT inflate + per-scanline unfilter
  (filter types 0-4 per the PNG spec) for 8-bit gray/RGB/RGBA images →
  dimensions + mean channel intensities.
- WAV: RIFF/fmt/data chunk walk → channels/rate/width/duration + RMS of
  the PCM16 samples.

``codec_decode_features`` sniffs the magic bytes and emits a fixed-width
``array<float>`` so the Arrow batch schema stays stable across kinds.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/pixel


def parse_png(content: bytes) -> dict:
    """Decode a PNG: header metadata plus (for 8-bit non-palette,
    non-interlaced images) the unfiltered pixel bytes."""
    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, b"", None
    while pos + 8 <= len(content):
        (length,), ctype = struct.unpack(">I", content[pos:pos + 4]), content[pos + 4:pos + 8]
        chunk = content[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", chunk)
            meta = dict(width=w, height=h, bit_depth=depth, color_type=color,
                        interlace=interlace, channels=_CHANNELS.get(color))
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if meta is None:
        raise ValueError("PNG without IHDR")
    meta["pixels"] = None
    if meta["bit_depth"] == 8 and meta["color_type"] in (0, 2, 4, 6) and not meta["interlace"]:
        meta["pixels"] = _unfilter(
            zlib.decompress(idat), meta["width"], meta["height"], meta["channels"]
        )
    return meta


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    """Reverse PNG scanline filters (spec §9: None/Sub/Up/Average/Paeth)."""
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += line
        prev = line
    return out


def parse_wav(content: bytes) -> dict:
    """Walk the RIFF chunks of a WAV file; return format + PCM stats."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos, meta, data = 12, {}, None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        (length,) = struct.unpack("<I", content[pos + 4:pos + 8])
        chunk = content[pos + 8:pos + 8 + length]
        if cid == b"fmt ":
            fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", chunk[:16])
            meta = dict(audio_format=fmt, channels=ch, sample_rate=rate,
                        bits_per_sample=bits)
        elif cid == b"data":
            data = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if not meta or data is None:
        raise ValueError("WAV without fmt/data chunks")
    frame_bytes = meta["channels"] * meta["bits_per_sample"] // 8
    n_frames = len(data) // frame_bytes if frame_bytes else 0
    meta["n_frames"] = n_frames
    meta["duration_ms"] = (
        int(1000 * n_frames / meta["sample_rate"]) if meta["sample_rate"] else 0
    )
    rms = 0.0
    if meta["bits_per_sample"] == 16 and n_frames:
        samples = struct.unpack(f"<{len(data) // 2}h", data[: (len(data) // 2) * 2])
        rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 / 32768.0
    meta["rms"] = rms
    return meta


def codec_decode_features(content: bytes | None, dim: int = 8):
    """Real decode path for ``extract_features``'s ``decode_fn`` seam:
    sniff PNG/WAV magics, decode, emit a fixed ``dim``-width feature row.
    Unknown formats raise (→ the operator's decode_error channel)."""
    if content is None:
        return None
    if content[:8] == _PNG_SIG:
        m = parse_png(content)
        px = m["pixels"]
        mean = (sum(px) / len(px) / 255.0) if px else 0.0
        feats = [1.0, float(m["width"]), float(m["height"]),
                 float(m["bit_depth"]), float(m["channels"] or 0), mean]
    elif content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        m = parse_wav(content)
        feats = [2.0, float(m["channels"]), float(m["sample_rate"]),
                 float(m["bits_per_sample"]), float(m["duration_ms"]),
                 float(m["rms"])]
    else:
        raise ValueError("unsupported media format (PNG/WAV pure-Python "
                         "codecs only; inject PIL/ffmpeg for the rest)")
    return (feats + [0.0] * dim)[:dim]


def encode_png(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    """Encode raw 8-bit pixels back into a valid PNG (filter 0 on every
    scanline, one zlib-compressed IDAT). With :func:`parse_png` this
    closes the decode → transform → re-encode loop without any imaging
    library: ``parse_png(encode_png(px, ...))['pixels'] == px``."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride:(y + 1) * stride])
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int,
    new_width: int, new_height: int,
) -> bytes:
    """Nearest-neighbor resample of a raw 8-bit pixel buffer — the
    deterministic, library-free transform stage (source index =
    ``i * old // new``, the standard NN mapping)."""
    out = bytearray(new_width * new_height * channels)
    o = 0
    for y in range(new_height):
        sy = y * height // new_height
        row_off = sy * width * channels
        for x in range(new_width):
            sx = x * width // new_width
            p = row_off + sx * channels
            out[o:o + channels] = pixels[p:p + channels]
            o += channels
    return bytes(out)

"""Pure-stdlib media codecs: REAL PNG and WAV encode/decode.

The container has no PIL/cv2/ffmpeg, but PNG and WAV are simple enough
container formats that ``zlib`` + ``struct`` can write and parse them
for real: magic sniffing, chunk walking, CRC32 verification, zlib
inflate, scanline unfiltering (PNG) and RIFF/fmt/data framing (WAV).
This upgrades the multimodal decode path from a deterministic fake to
a genuine decode of real bytes — the fake remains only as the fallback
for formats these parsers don't cover (JPEG etc. still need PIL).

Scale note: codecs are per-payload CPU work with no shuffle; they run
inside Arrow-batched ``mapInPandas`` workers, so throughput scales
linearly with cores/executors and payload bytes never hit the driver.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Callable

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_HEADER_BYTES = 44  # RIFF(12) + fmt chunk(24) + data header(8)


# ---------------------------------------------------------------- PNG

def _png_chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return struct.pack(">I", len(data)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def encode_png(width: int, height: int, gray: Callable[[int, int], int]) -> bytes:
    """Build a valid 8-bit grayscale PNG (filter 0 scanlines).

    Verifiable with any standards-compliant reader; ``decode_png_meta``
    below round-trips it including CRC checks and inflate."""
    if width < 1 or height < 1:
        raise ValueError("PNG dimensions must be positive")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(gray(x, y) & 0xFF for x in range(width))
        for y in range(height)
    )
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes) -> list[list[int]]:
    """Parse a PNG and return the full pixel matrix (rows of 8-bit
    gray values) — the real decode behind resize/feature-extraction.
    Same validation contract as :func:`decode_png_meta` (magic, chunk
    CRCs, inflate, type-0 unfilter); raises ValueError on violations."""
    meta = _parse_png(payload)
    return meta["rows"]


def decode_png_meta(payload: bytes) -> dict[str, int]:
    """Parse a PNG: verify magic + every chunk CRC, read IHDR geometry,
    inflate IDAT, unfilter (type-0 scanlines), and checksum pixels.

    Returns {width, height, bit_depth, color_type, pixel_sum}. Raises
    ValueError on any framing/CRC/filter violation — corrupt media must
    surface as errors, not garbage metadata."""
    m = _parse_png(payload)
    return {
        "width": m["width"],
        "height": m["height"],
        "bit_depth": m["bit_depth"],
        "color_type": m["color_type"],
        "pixel_sum": sum(sum(r) for r in m["rows"]),
    }


def _parse_png(payload: bytes) -> dict:
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad magic")
    pos = 8
    width = height = bit_depth = color_type = -1
    idat = b""
    saw_end = False
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            saw_end = True
            break
        pos += 12 + length
    if width < 0 or not saw_end:
        raise ValueError("missing IHDR/IEND")
    if bit_depth != 8 or color_type != 0:
        raise ValueError("only 8-bit grayscale supported without PIL")
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("pixel payload size mismatch")
    rows: list[list[int]] = []
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise ValueError(f"scanline filter {row[0]} unsupported")
        rows.append(list(row[1:]))
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "rows": rows,
    }


# ---------------------------------------------------------------- WAV

def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Build a valid PCM16 mono WAV (RIFF/WAVE + fmt + data)."""
    n = len(samples)
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_meta(payload: bytes) -> dict[str, int]:
    """Parse a WAV: verify RIFF framing, read the fmt chunk, and fold
    the PCM samples into an absolute-amplitude checksum.

    Returns {sample_rate, n_channels, bits_per_sample, n_samples,
    duration_us, amp_sum}. ValueError on malformed framing."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 != len(payload):
        raise ValueError("RIFF size mismatch")
    pos = 12
    sample_rate = n_channels = bits = -1
    pcm = b""
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            audio_fmt, n_channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", data[:16]
            )
            if audio_fmt != 1:
                raise ValueError("non-PCM WAV unsupported")
        elif tag == b"data":
            pcm = data
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate < 0 or bits != 16 or n_channels != 1:
        raise ValueError("only PCM16 mono supported without codec libs")
    n_samples = len(pcm) // 2
    samples = struct.unpack(f"<{n_samples}h", pcm[: n_samples * 2])
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_us": n_samples * 1_000_000 // sample_rate,
        "amp_sum": sum(abs(s) for s in samples),
    }


def encode_png_with_text(
    width: int,
    height: int,
    gray: Callable[[int, int], int],
    texts: list[tuple[str, str]],
    compressed_texts: list[tuple[str, str]] | None = None,
) -> bytes:
    """A valid grayscale PNG carrying tEXt (latin-1 keyword\\0value)
    and zTXt (keyword\\0\\0 + zlib-deflated value) metadata chunks
    between IHDR and IDAT — the PNG-native EXIF-style sidecar every
    asset pipeline reads for provenance (spec: PNG 1.2 §4.2.3)."""
    if width < 1 or height < 1:
        raise ValueError("PNG dimensions must be positive")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(gray(x, y) & 0xFF for x in range(width))
        for y in range(height)
    )
    meta = b""
    for kw, val in texts:
        meta += _png_chunk(
            b"tEXt", kw.encode("latin-1") + b"\x00" + val.encode("latin-1")
        )
    for kw, val in compressed_texts or []:
        meta += _png_chunk(
            b"zTXt",
            kw.encode("latin-1") + b"\x00\x00"
            + zlib.compress(val.encode("latin-1"), 6),
        )
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + meta
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_text(payload: bytes) -> dict[str, str]:
    """Extract all tEXt/zTXt metadata from a PNG as {keyword: value},
    with the same validation contract as decode_png_meta (magic check,
    per-chunk CRC, zTXt inflate; duplicate keywords: last wins).
    Raises ValueError on framing/CRC violations or an unknown zTXt
    compression method."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad magic")
    pos = 8
    out: dict[str, str] = {}
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"tEXt":
            kw, _, val = data.partition(b"\x00")
            out[kw.decode("latin-1")] = val.decode("latin-1")
        elif tag == b"zTXt":
            kw, _, rest = data.partition(b"\x00")
            if not rest or rest[0] != 0:
                raise ValueError("unknown zTXt compression method")
            out[kw.decode("latin-1")] = zlib.decompress(rest[1:]).decode(
                "latin-1"
            )
        pos += 12 + length
    return out

"""Unit tests for the pure-stdlib PNG/WAV codecs and the payload
sniffer — the real decode path behind the multimodal operators.

No SparkSession needed: these pin the byte-level format handling
(magic, CRC, inflate, RIFF framing) that the Spark-side oracle-parity
tests then exercise through Arrow at scale."""

from __future__ import annotations

import struct
import zlib

import pytest

from cortana_intelligence_customer360_spark.llmops.codecs import (
    PNG_MAGIC,
    WAV_HEADER_BYTES,
    decode_png_meta,
    decode_wav_meta,
    encode_png,
    encode_wav,
)
from cortana_intelligence_customer360_spark.llmops.multimodal import _decode_payload


def test_png_round_trip():
    w, h = 7, 5
    payload = encode_png(w, h, lambda x, y: 3 * x + 11 * y)
    assert payload[:8] == PNG_MAGIC
    meta = decode_png_meta(payload)
    assert meta["width"] == w and meta["height"] == h
    assert meta["bit_depth"] == 8 and meta["color_type"] == 0
    assert meta["pixel_sum"] == sum(
        (3 * x + 11 * y) & 0xFF for x in range(w) for y in range(h)
    )


def test_png_1x1():
    meta = decode_png_meta(encode_png(1, 1, lambda x, y: 200))
    assert (meta["width"], meta["height"], meta["pixel_sum"]) == (1, 1, 200)


def test_png_corrupt_pixel_fails_crc():
    payload = bytearray(encode_png(6, 6, lambda x, y: x * y))
    # Flip one bit inside the IDAT body (after magic+IHDR chunk = 8+25
    # bytes, skip IDAT length+tag = 8 more).
    payload[8 + 25 + 8 + 3] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_png_meta(bytes(payload))


def test_png_truncated():
    payload = encode_png(4, 4, lambda x, y: 0)
    with pytest.raises(ValueError):
        decode_png_meta(payload[: len(payload) - 6])


def test_png_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        decode_png_meta(b"JFIF" + b"\x00" * 64)


def test_wav_round_trip():
    samples = [((i * 997) % 4096) - 2048 for i in range(300)]
    payload = encode_wav(16000, samples)
    assert len(payload) == WAV_HEADER_BYTES + 2 * len(samples)
    meta = decode_wav_meta(payload)
    assert meta["sample_rate"] == 16000
    assert meta["n_channels"] == 1 and meta["bits_per_sample"] == 16
    assert meta["n_samples"] == len(samples)
    assert meta["duration_us"] == len(samples) * 1_000_000 // 16000
    assert meta["amp_sum"] == sum(abs(s) for s in samples)


def test_wav_riff_size_checked():
    payload = bytearray(encode_wav(8000, [0, 1, -1]))
    payload[4] ^= 0xFF  # corrupt RIFF size field
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_meta(bytes(payload))


def test_wav_rejects_stereo():
    mono = encode_wav(8000, [5, -5])
    stereo = bytearray(mono)
    struct.pack_into("<H", stereo, 22, 2)  # n_channels field in fmt
    with pytest.raises(ValueError):
        decode_wav_meta(bytes(stereo))


def test_decode_payload_sniffs_png():
    """PNG bytes take the real parser; arbitrary bytes take the fake."""
    png = encode_png(9, 4, lambda x, y: x + y)
    w, h, checksum = _decode_payload(png)
    assert (w, h) == (9, 4)
    assert checksum == sum((x + y) & 0xFF for x in range(9) for y in range(4))
    # Non-PNG falls back to the documented deterministic fake.
    blob = b"hello media"
    w2, h2, c2 = _decode_payload(blob)
    assert w2 == blob[0] + len(blob) % 640
    assert c2 == sum(blob) % (1 << 31)


def test_png_crc_matches_reference_impl():
    """The CRC written is the standard zlib CRC32 over tag+data (what
    any external PNG reader checks)."""
    payload = encode_png(3, 2, lambda x, y: 77)
    (ihdr_len,) = struct.unpack(">I", payload[8:12])
    body = payload[12 : 12 + 4 + ihdr_len]
    (crc,) = struct.unpack(">I", payload[16 + ihdr_len : 20 + ihdr_len])
    assert crc == zlib.crc32(body) & 0xFFFFFFFF


def test_png_pixel_matrix_roundtrip():
    """decode_png_pixels must return exactly the generator's matrix."""
    from cortana_intelligence_customer360_spark.llmops.codecs import (
        decode_png_pixels,
        encode_png,
    )

    w, h = 7, 5
    payload = encode_png(w, h, lambda x, y: (3 + 7 * x + 13 * y) % 256)
    rows = decode_png_pixels(payload)
    assert rows == [[(3 + 7 * x + 13 * y) % 256 for x in range(w)] for y in range(h)]


def test_nearest_neighbor_resize_matches_reference():
    """The numpy index-gather in the resize op equals a per-pixel
    reference implementation."""
    import numpy as np

    w, h, tw, th = 11, 7, 8, 6
    img = np.arange(w * h, dtype="int64").reshape(h, w)
    fast = img[np.ix_((np.arange(th) * h) // th, (np.arange(tw) * w) // tw)]
    ref = [[img[ty * h // th][tx * w // tw] for tx in range(tw)] for ty in range(th)]
    assert fast.tolist() == ref


# -- Avro Object Container File codec (round 6) -----------------------------

from cortana_intelligence_customer360_spark.operators.avro_codec import (  # noqa: E402
    MAGIC as AVRO_MAGIC,
    decode_container,
    encode_container,
)

_AVRO_FIELDS = [("k", "long"), ("name", "string"), ("n", "int"), ("x", "double")]


def test_avro_round_trip():
    rows = [(1, "a", -5, 1.25), (-9, "β-utf8", 0, -0.0), (2**40, "", 7, 3.5)]
    blob = encode_container(rows, _AVRO_FIELDS)
    assert blob[:4] == AVRO_MAGIC
    fields, got = decode_container(blob)
    assert fields == _AVRO_FIELDS
    assert got == rows


def test_avro_empty_partition():
    blob = encode_container([], _AVRO_FIELDS)
    fields, got = decode_container(blob)
    assert fields == _AVRO_FIELDS and got == []


def test_avro_deterministic():
    rows = [(1, "a", 2, 3.0)]
    assert encode_container(rows, _AVRO_FIELDS) == encode_container(
        rows, _AVRO_FIELDS
    )


def test_avro_sync_marker_validated():
    rows = [(1, "a", 2, 3.0)]
    blob = bytearray(encode_container(rows, _AVRO_FIELDS))
    blob[-1] ^= 0xFF  # corrupt the trailing block sync marker
    with pytest.raises(ValueError, match="sync marker"):
        decode_container(bytes(blob))


def test_avro_rejects_non_avro():
    with pytest.raises(ValueError, match="not an Avro"):
        decode_container(b"PAR1not-avro-at-all")


def test_png_text_chunks_roundtrip_and_crc():
    """tEXt + zTXt chunks must round-trip, coexist with pixel decode,
    and fail loudly on CRC corruption."""
    import pytest

    from cortana_intelligence_customer360_spark.llmops.codecs import (
        decode_png_meta,
        decode_png_text,
        encode_png_with_text,
    )

    p = encode_png_with_text(
        5, 4, lambda x, y: 11 * x + y,
        texts=[("Title", "t"), ("Source", "s")],
        compressed_texts=[("Comment", "c" * 200)],
    )
    assert decode_png_text(p) == {"Title": "t", "Source": "s",
                                  "Comment": "c" * 200}
    meta = decode_png_meta(p)  # pixel plane unaffected by text chunks
    assert (meta["width"], meta["height"]) == (5, 4)
    corrupted = bytearray(p)
    corrupted[40] ^= 0xFF  # inside the first metadata chunk
    with pytest.raises(ValueError):
        decode_png_text(bytes(corrupted))


def test_png_text_duplicate_keyword_last_wins():
    from cortana_intelligence_customer360_spark.llmops.codecs import (
        decode_png_text,
        encode_png_with_text,
    )

    p = encode_png_with_text(
        2, 2, lambda x, y: 0, texts=[("K", "first"), ("K", "second")]
    )
    assert decode_png_text(p)["K"] == "second"

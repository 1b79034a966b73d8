"""Multimodal (binary) column plumbing (SURVEY.md §2.9 / BASELINE
north star: "multimodal columns").

Images/audio/video are opaque BINARY columns with typed metadata,
decoded via Arrow-batched ``mapInPandas`` with an explicit output
schema and batch-shape-independent semantics.

The decode path is REAL for PNG and WAV: ``llmops.codecs`` builds and
parses both formats with stdlib-only code (magic sniffing, chunk
CRC32 verification, zlib inflate, RIFF framing), so
``multimodal_decode_png`` / ``multimodal_decode_wav`` exercise genuine
encode -> BINARY column -> Arrow -> parse round trips. Their payload
parameters derive deterministically from doc_id, so a DuckDB oracle
recomputes every decoded field in closed form — any corruption in the
binary plumbing (or the codecs) breaks the hash match.

Formats beyond PNG/WAV (JPEG, MP4, ...) still need PIL/libav, absent
in this container: ``_decode_payload`` falls back to a deterministic
fake for unrecognized bytes, keeping the original O-tier query
(``multimodal_decode_meta``) verifiable end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table
from .codecs import PNG_MAGIC, decode_png_meta, decode_wav_meta, encode_png, encode_wav

try:  # PIL absent in this container (by design); wired if it appears.
    from PIL import Image as _PILImage

    HAVE_IMAGE_LIBS = True
except ImportError:  # pragma: no cover - the active branch here
    _PILImage = None
    HAVE_IMAGE_LIBS = False

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def _decode_payload(payload: bytes) -> tuple[int, int, int]:
    """Decode one media payload -> (width, height, checksum).

    PNG payloads take the REAL path (stdlib parser in ``codecs``:
    CRC-verified chunk walk + inflate). Other formats need PIL/libav,
    absent here, and fall back to a deterministic fake of the bytes so
    the surrounding distributed plumbing stays fully verifiable."""
    if payload[:8] == PNG_MAGIC:
        meta = decode_png_meta(payload)
        return meta["width"], meta["height"], meta["pixel_sum"] % (1 << 31)
    if HAVE_IMAGE_LIBS:  # pragma: no cover - runs only when PIL appears
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as img:
                return img.width, img.height, sum(payload) % (1 << 31)
        except Exception:
            pass  # not an image PIL recognizes -> deterministic fake below
    width = (payload[0] if payload else 0) + len(payload) % 640
    height = (payload[-1] if payload else 0) + len(payload) % 480
    checksum = sum(payload) % (1 << 31)
    return width, height, checksum


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, metadata batches out.
    Stateless per batch -> safe under any partitioning; pandas ops are
    vectorized except the per-payload decode loop (which a real codec
    would dominate anyway)."""
    for pdf in batches:
        meta = [_decode_payload(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": pd.Series([m[0] for m in meta], dtype="int64"),
                "height": pd.Series([m[1] for m in meta], dtype="int64"),
                "checksum": pd.Series([m[2] for m in meta], dtype="int64"),
            }
        )


def with_payload(docs: DataFrame) -> DataFrame:
    """Synthesize the opaque BINARY media column (utf-8 bytes of the
    text stand in for image bytes; schema-wise indistinguishable)."""
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY column -> mapInPandas decode -> typed metadata rows."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(_decode_batches, META_SCHEMA)


# The oracle recomputes the fake decode from the source text. DATA
# CONTRACT: documents.text is ASCII (FIXTURES.md), so utf-8 bytes ==
# code points and DuckDB's ascii() mirrors the stub's byte math; a
# non-ASCII corpus would need the oracle to work on encode(text) bytes
# instead. Empty docs: ascii(chars[1]) / list_aggregate over [] yield
# NULL where the stub yields 0 — COALESCE keeps the engines identical.
_DECODE_META_SQL = """
WITH b AS (
  SELECT doc_id, encode(text) AS payload,
         length(text) AS n, str_split(text, '') AS chars
  FROM documents)
SELECT doc_id,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       CAST(COALESCE(ascii(chars[1]), 0) + octet_length(payload) % 640
            AS BIGINT) AS width,
       CAST(COALESCE(ascii(chars[n]), 0) + octet_length(payload) % 480
            AS BIGINT) AS height,
       CAST(COALESCE(list_aggregate(list_transform(chars, c -> ascii(c)), 'sum'),
                     0) % 2147483648 AS BIGINT) AS checksum
FROM b
"""


# ------------------------------------------------------ real decode
# Payload parameters derive deterministically from doc_id, so the
# oracle recomputes every decoded field in closed form while the Spark
# side must round-trip REAL bytes: encode (mapInPandas) -> BINARY
# column through Arrow -> parse (mapInPandas, CRC-verified). A single
# flipped bit anywhere in the pipeline fails the CRC or the hash match.

PNG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("bit_depth", T.LongType()),
        T.StructField("color_type", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)

_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _png_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 13 + 4, doc_id % 9 + 3


def _encode_png_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = []
        for d in pdf["doc_id"]:
            d = int(d)
            w, h = _png_dims(d)
            payloads.append(encode_png(w, h, lambda x, y: (d + 7 * x + 13 * y) % 256))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


def _decode_png_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [decode_png_meta(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                **{
                    k: pd.Series([m[k] for m in metas], dtype="int64")
                    for k in ("width", "height", "bit_depth", "color_type", "pixel_sum")
                },
            }
        )


def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG round trip: build a valid grayscale PNG per document,
    carry it as a BINARY column, parse it back (CRC-verified chunk
    walk + zlib inflate) into typed metadata. Two Arrow boundaries;
    no shuffle; linear in rows x pixels."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(_encode_png_batches, _PAYLOAD_SCHEMA)
    return payloads.mapInPandas(_decode_png_batches, PNG_SCHEMA)


_DECODE_PNG_SQL = """
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 13 + 4 AS BIGINT) AS w,
         CAST(doc_id % 9 + 3 AS BIGINT) AS h
  FROM documents)
SELECT doc_id, w AS width, h AS height,
       CAST(8 AS BIGINT) AS bit_depth,
       CAST(0 AS BIGINT) AS color_type,
       CAST(list_sum(flatten(list_transform(range(h), y ->
            list_transform(range(w), x -> (doc_id + 7*x + 13*y) % 256))))
            AS BIGINT) AS pixel_sum
FROM dims
"""


WAV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("amp_sum", T.LongType()),
    ]
)

_WAV_RATE = 8000


def _wav_samples(doc_id: int) -> list[int]:
    n = doc_id % 400 + 50
    return [((doc_id * 31 + i * 17) % 4096) - 2048 for i in range(n)]


def _wav_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode a PCM16 WAV per doc, then parse it back via the real
    RIFF parser — one fused stage (the byte round trip is in-process;
    the PNG query already pins the cross-Arrow BINARY transfer)."""
    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            payload = encode_wav(_WAV_RATE, _wav_samples(int(d)))
            m = decode_wav_meta(payload)
            rows.append(
                (int(d), len(payload), m["sample_rate"], m["n_samples"],
                 m["duration_us"], m["amp_sum"])
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_bytes", "sample_rate", "n_samples",
                     "duration_us", "amp_sum"],
        ).astype("int64")


def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV (RIFF/PCM16) encode + header/sample parse per doc."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(_wav_batches, WAV_SCHEMA)


# n_bytes is closed-form because the WAV header is a fixed 44 bytes +
# 2 bytes per PCM16 sample; duration_us = n * 1e6 / 8000 = n * 125.
_DECODE_WAV_SQL = """
WITH p AS (SELECT doc_id, CAST(doc_id % 400 + 50 AS BIGINT) AS n FROM documents)
SELECT doc_id,
       CAST(44 + 2 * n AS BIGINT) AS n_bytes,
       CAST(8000 AS BIGINT) AS sample_rate,
       n AS n_samples,
       CAST(n * 125 AS BIGINT) AS duration_us,
       CAST(list_sum(list_transform(range(n), i ->
            abs((doc_id * 31 + i * 17) % 4096 - 2048))) AS BIGINT) AS amp_sum
FROM p
"""


# Fixed target geometry for the resize op (thumbnailing shape).
_RESIZE_W, _RESIZE_H = 8, 6

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_w", T.LongType()),
        T.StructField("src_h", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_weighted", T.LongType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode -> REAL decode (full pixel matrix) -> nearest-neighbor
    resize with numpy index gather -> positional checksum."""
    import numpy as np

    from .codecs import decode_png_pixels

    tw, th = _RESIZE_W, _RESIZE_H
    # positional weights pin WHERE each pixel landed, not just the sum
    wgt = (np.arange(th)[:, None] * tw + np.arange(tw)[None, :] + 1).astype(
        "int64"
    )
    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            w, h = _png_dims(d)
            img = np.array(
                decode_png_pixels(
                    encode_png(w, h, lambda x, y: (d + 7 * x + 13 * y) % 256)
                ),
                dtype="int64",
            )
            small = img[np.ix_((np.arange(th) * h) // th, (np.arange(tw) * w) // tw)]
            rows.append(
                (d, w, h, tw, th, int(small.sum()), int((small * wgt).sum()))
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "src_w", "src_h", "out_w", "out_h",
                "px_sum", "px_weighted",
            ],
        ).astype("int64")


def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image thumbnailing without PIL: per doc, build a grayscale
    PNG, decode the full pixel matrix (CRC walk + inflate + unfilter),
    nearest-neighbor resize to 8x6 via numpy index gather, and emit
    positional checksums. The oracle recomputes the expected thumbnail
    in closed form from the generator, so the whole decode->resize
    path is hash-verified. Map-only Arrow stage; pixels never leave
    the workers."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(_resize_batches, RESIZE_SCHEMA)


# Nearest-neighbor index math mirrored exactly: sx = tx*w // 8,
# sy = ty*h // 6 (integer floor division in both engines).
_RESIZE_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 13 + 4 AS BIGINT) AS w,
         CAST(doc_id % 9 + 3 AS BIGINT) AS h
  FROM documents),
px AS (
  SELECT doc_id, w, h,
         flatten(list_transform(range({_RESIZE_H}), ty ->
           list_transform(range({_RESIZE_W}), tx ->
             (doc_id + 7 * ((tx * w) // {_RESIZE_W})
                     + 13 * ((ty * h) // {_RESIZE_H})) % 256))) AS thumb
  FROM dims)
SELECT doc_id, w AS src_w, h AS src_h,
       CAST({_RESIZE_W} AS BIGINT) AS out_w,
       CAST({_RESIZE_H} AS BIGINT) AS out_h,
       CAST(list_sum(thumb) AS BIGINT) AS px_sum,
       CAST(list_sum(list_transform(range({_RESIZE_W * _RESIZE_H}), i ->
            thumb[i + 1] * (i + 1))) AS BIGINT) AS px_weighted
FROM px
"""

_FRAME_STEP = 4

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_amp_sum", T.LongType()),
        T.StructField("frame_amp_max", T.LongType()),
    ]
)


def _framesample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from .codecs import decode_wav_meta  # noqa: F401  (validation import)

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            payload = encode_wav(_WAV_RATE, _wav_samples(d))
            # real parse: pull PCM16 samples back out of the RIFF body
            body = payload[44:]
            samples = np.frombuffer(body, dtype="<i2").astype("int64")
            frames = samples[::_FRAME_STEP]
            amp = np.abs(frames)
            rows.append(
                (d, len(samples), len(frames), int(amp.sum()), int(amp.max()))
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_samples", "n_frames", "frame_amp_sum",
                "frame_amp_max",
            ],
        ).astype("int64")


def multimodal_audio_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame sampling (the video-frame-sample analog on the one
    media type we can decode for real): keep every 4th PCM16 sample
    from the decoded WAV body and checksum amplitudes. Oracle
    recomputes the sampled positions in closed form from the
    generator."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(_framesample_batches, FRAME_SCHEMA)


_FRAMESAMPLE_SQL = f"""
WITH p AS (SELECT doc_id, CAST(doc_id % 400 + 50 AS BIGINT) AS n FROM documents),
f AS (
  SELECT doc_id, n,
         list_transform(range(0, n, {_FRAME_STEP}), i ->
           abs((doc_id * 31 + i * 17) % 4096 - 2048)) AS amps
  FROM p)
SELECT doc_id, n AS n_samples,
       CAST((n + {_FRAME_STEP - 1}) // {_FRAME_STEP} AS BIGINT) AS n_frames,
       CAST(list_sum(amps) AS BIGINT) AS frame_amp_sum,
       CAST(list_max(amps) AS BIGINT) AS frame_amp_max
FROM f
"""


# PNG signature / RIFF....WAVE — the two container magics the real
# codecs in llmops.codecs emit, plus a no-magic fallthrough.
_PNG_MAGIC = "89504E470D0A1A0A"
_RIFF_MAGIC = "52494646"
_WAVE_TAG = "57415645"


def multimodal_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type detection from leading magic bytes over an opaque
    BINARY column — the triage step a multimodal ingest runs before
    routing payloads to the right decoder. The mixed corpus is built
    in-plan (doc_id % 3 selects a PNG-signed, WAV-signed, or bare
    payload); sniffing is pure column expressions on the hex prefix
    (JVM-side, codegen'd — no Python in the classify path), and the
    rollup is one tiny aggregate keyed by the detected type."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.unhex(F.lit(_PNG_MAGIC)))
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.unhex(F.lit(_RIFF_MAGIC)),
                F.unhex(F.lit("00000000")),
                F.unhex(F.lit(_WAVE_TAG)),
            ),
        )
        .otherwise(F.unhex(F.lit("")))
    )
    payload = F.concat(magic, F.encode("text", "utf-8"))
    b = docs.select("doc_id", payload.alias("payload"))
    hx = F.hex(F.col("payload"))
    mime = (
        F.when(F.substring(hx, 1, 16) == _PNG_MAGIC, "image/png")
        .when(
            (F.substring(hx, 1, 8) == _RIFF_MAGIC)
            & (F.substring(hx, 17, 8) == _WAVE_TAG),
            "audio/wav",
        )
        .otherwise("application/octet-stream")
    )
    return (
        b.select(mime.alias("mime"), "doc_id", "payload")
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.octet_length("payload")).cast("long").alias(
                "total_bytes"
            ),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


_MIME_SQL = f"""
WITH b AS (
  SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN from_hex('{_PNG_MAGIC}') || encode(text)
           WHEN 1 THEN from_hex('{_RIFF_MAGIC}') || from_hex('00000000')
                       || from_hex('{_WAVE_TAG}') || encode(text)
           ELSE encode(text) END AS payload
  FROM documents),
h AS (SELECT doc_id, payload, hex(payload) AS hx FROM b)
SELECT CASE WHEN substring(hx, 1, 16) = '{_PNG_MAGIC}' THEN 'image/png'
            WHEN substring(hx, 1, 8) = '{_RIFF_MAGIC}'
                 AND substring(hx, 17, 8) = '{_WAVE_TAG}' THEN 'audio/wav'
            ELSE 'application/octet-stream' END AS mime,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM h GROUP BY 1
"""


_DH_COLS = 8  # sample columns -> 7 gradient bits per row
_DH_ROWS = 8  # sample rows -> 56-bit hash (fits BIGINT)


def _dhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Difference-hash each PNG payload from its REAL decoded pixels
    (CRC-checked chunk walk + inflate + unfilter): nearest-neighbor
    sample an 8x8 grid, emit 1 bit per horizontal gradient."""
    from .codecs import decode_png_pixels

    for pdf in batches:
        hashes = []
        for p in pdf["payload"]:
            rows = decode_png_pixels(bytes(p))
            h, w = len(rows), len(rows[0])
            bits = 0
            for y in range(_DH_ROWS):
                ys = y * h // _DH_ROWS
                for x in range(_DH_COLS - 1):
                    a = rows[ys][x * w // _DH_COLS]
                    b = rows[ys][(x + 1) * w // _DH_COLS]
                    if a > b:
                        bits |= 1 << (y * (_DH_COLS - 1) + x)
            hashes.append(bits)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "dhash": pd.Series(hashes, dtype="int64"),
            }
        )


_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: dHash (horizontal-gradient bits on
    a nearest-neighbor 8x8 sample grid) computed from the REAL decoded
    pixels of each PNG payload — the image-side analog of the text
    fingerprint family — then exact-hash bucketing to surface images
    with identical perceptual signatures. The hash is 56 bits so it
    stays a BIGINT groupBy key; at 100 TB the bucket join replaces an
    all-pairs pixel comparison exactly like minhash banding does for
    text. The oracle replays the generative pixel formula (pixel =
    (doc_id + 7x + 13y) mod 256), so decode + hash carry a FULL
    correctness check, not just a rows count."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(_encode_png_batches, _PAYLOAD_SCHEMA)
    hashes = payloads.mapInPandas(_dhash_batches, _DHASH_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("dhash")
    return hashes.select(
        "doc_id",
        "dhash",
        F.count(F.lit(1)).over(w).cast("long").alias("n_same_hash"),
    )


_PHASH_SQL = f"""
WITH dims AS (
  SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 9 + 3 AS h
  FROM documents),
hashes AS (
  SELECT doc_id, CAST(list_sum(flatten(list_transform(range({_DH_ROWS}), y ->
      list_transform(range({_DH_COLS - 1}), x ->
        CASE WHEN (doc_id + 7*((x*w)//{_DH_COLS}) + 13*((y*h)//{_DH_ROWS})) % 256
                > (doc_id + 7*(((x+1)*w)//{_DH_COLS}) + 13*((y*h)//{_DH_ROWS})) % 256
             THEN (CAST(1 AS BIGINT) << (y*{_DH_COLS - 1}+x)) ELSE 0 END))))
    AS BIGINT) AS dhash
  FROM dims)
SELECT doc_id, dhash,
       CAST(COUNT(*) OVER (PARTITION BY dhash) AS BIGINT) AS n_same_hash
FROM hashes
"""




# ---------------------------------------------------------------------------
# Video scene-cut detection (round 4): a "video" is an ordered sequence
# of frames, each a REAL grayscale PNG (stdlib encoder/decoder in
# llmops.codecs); frames are generated from a deterministic scene
# formula so the oracle recomputes every cut in closed form. The
# Spark-side plumbing — binary frame payloads through Arrow batches,
# per-video frame loops, decoded-pixel grid sampling, consecutive-frame
# differencing — is exactly what a libav-backed pipeline would run;
# only the pixel source is synthetic (no video libs in this
# container, same contract as the PNG/WAV paths).

_VID_GRID = 8          # sample grid (like dHash)
_VID_CUT_THRESHOLD = 20  # mean-abs-diff above this = scene cut
_VID_SCENE_LEN = 3     # generative scene length in frames
_VID_SCENE_SHIFT = 41  # per-scene gray shift
_VID_JITTER = 3        # within-scene frame-parity jitter


def _vid_frames(doc_id: int) -> int:
    return doc_id % 6 + 4


def _vid_gray(doc_id: int, f: int):
    scene = (doc_id + f) // _VID_SCENE_LEN
    base = doc_id + scene * _VID_SCENE_SHIFT
    jit = (f % 2) * _VID_JITTER
    # mod 250 then +jitter: stays < 256 with NO wraparound, so the
    # within-scene abs diff is exactly 0 or _VID_JITTER and the
    # scene-change diff is |d| or 250-|d| of the shift — the two
    # populations are separated by construction and the threshold
    # cannot flicker.
    return lambda x, y: ((base + 7 * x + 13 * y) % 250) + jit


def _scenecut_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per video: encode every frame as a real PNG, decode pixels back
    (CRC walk + inflate), nearest-neighbor sample a GRIDxGRID matrix,
    mean-abs-diff consecutive frames, threshold into cuts."""
    from .codecs import decode_png_pixels

    for pdf in batches:
        out = []
        for d in pdf["doc_id"]:
            d = int(d)
            w, h = _png_dims(d)
            nf = _vid_frames(d)
            grids = []
            for f in range(nf):
                payload = encode_png(w, h, _vid_gray(d, f))
                rows = decode_png_pixels(payload)
                grids.append(
                    [
                        rows[y * h // _VID_GRID][x * w // _VID_GRID]
                        for y in range(_VID_GRID)
                        for x in range(_VID_GRID)
                    ]
                )
            cuts = 0
            cut_mask = 0
            diff_total = 0
            for f in range(1, nf):
                sad = sum(abs(a - b) for a, b in zip(grids[f], grids[f - 1]))
                diff_total += sad
                if sad > _VID_CUT_THRESHOLD * _VID_GRID * _VID_GRID:
                    cuts += 1
                    cut_mask |= 1 << f
            out.append((d, nf, cuts, cut_mask, diff_total))
        yield pd.DataFrame(
            out,
            columns=["doc_id", "n_frames", "n_cuts", "cut_mask", "sad_total"],
        ).astype("int64")


_SCENECUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_cuts", T.LongType()),
        T.StructField("cut_mask", T.LongType()),
        T.StructField("sad_total", T.LongType()),
    ]
)


def multimodal_video_scenecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over synthetic-but-really-encoded PNG frame
    sequences: sum-of-abs-differences on an 8x8 sampled grid between
    consecutive decoded frames, thresholded into cuts. Arrow-batched
    mapInPandas, one task per partition of the video catalog — the
    shape (and cost model: decode dominates, embarrassingly parallel,
    zero shuffle) of a real keyframe extractor at 100 TB. Oracle
    recomputes grids from the generative formula in closed form."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(_scenecut_batches, _SCENECUT_SCHEMA)


_SCENECUT_SQL = f"""
WITH dims AS (
  SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 9 + 3 AS h,
         doc_id % 6 + 4 AS nf
  FROM documents),
-- one row per (video, frame), grid = 64-element sampled gray list
grids AS (
  SELECT doc_id, w, h, nf, f,
         flatten(list_transform(range({_VID_GRID}), y ->
           list_transform(range({_VID_GRID}), x ->
             (doc_id + ((doc_id + f) // {_VID_SCENE_LEN}) * {_VID_SCENE_SHIFT}
              + 7 * ((x * w) // {_VID_GRID})
              + 13 * ((y * h) // {_VID_GRID})) % 250
             + (f % 2) * {_VID_JITTER}))) AS g
  FROM dims, LATERAL unnest(range(nf)) AS u(f)),
sads AS (
  SELECT a.doc_id, a.nf, a.f,
         list_sum(list_transform(range({_VID_GRID * _VID_GRID}), i ->
           abs(a.g[i + 1] - b.g[i + 1]))) AS sad
  FROM grids a JOIN grids b ON a.doc_id = b.doc_id AND b.f = a.f - 1)
SELECT doc_id,
       CAST(MAX(nf) AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN sad > {_VID_CUT_THRESHOLD * _VID_GRID * _VID_GRID}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       CAST(SUM(CASE WHEN sad > {_VID_CUT_THRESHOLD * _VID_GRID * _VID_GRID}
                     THEN CAST(1 AS BIGINT) << f ELSE 0 END) AS BIGINT)
         AS cut_mask,
       CAST(SUM(sad) AS BIGINT) AS sad_total
FROM sads GROUP BY doc_id
"""


QUERIES = {
    "multimodal_video_scenecut": multimodal_video_scenecut,
    "multimodal_phash_dedup": multimodal_phash_dedup,
    "multimodal_mime_sniff": multimodal_mime_sniff,
    "multimodal_decode_meta": multimodal_decode_meta,
    "multimodal_decode_png": multimodal_decode_png,
    "multimodal_decode_wav": multimodal_decode_wav,
    "multimodal_image_resize": multimodal_image_resize,
    "multimodal_audio_framesample": multimodal_audio_framesample,
}
ORACLE = {
    "multimodal_video_scenecut": _SCENECUT_SQL,
    "multimodal_phash_dedup": _PHASH_SQL,
    "multimodal_mime_sniff": _MIME_SQL,
    "multimodal_decode_meta": _DECODE_META_SQL,
    "multimodal_decode_png": _DECODE_PNG_SQL,
    "multimodal_decode_wav": _DECODE_WAV_SQL,
    "multimodal_image_resize": _RESIZE_SQL,
    "multimodal_audio_framesample": _FRAMESAMPLE_SQL,
}


# ---------------------------------------------------------------------------
# Windowed loudness / silence detection (round 5): the audio-curation
# filter a speech-data pipeline runs right after decode — per-frame RMS
# energy and the silence ratio that gates whether a clip is worth
# transcribing. Decode is the REAL RIFF/PCM16 round trip (codecs.py);
# frame energies are exact integer square sums, so only the final
# sqrt/ratio are floats (identical operands both engines).

_LOUD_WIN = 50
_LOUD_THR = 1000.0


def _loudness_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import math

    import numpy as np

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            payload = encode_wav(_WAV_RATE, _wav_samples(d))
            samples = np.frombuffer(payload[44:], dtype="<i2").astype("int64")
            n = len(samples)
            n_frames = 0
            silent = 0
            max_rms = 0.0
            total_sumsq = 0
            for f0 in range(0, n, _LOUD_WIN):
                fr = samples[f0 : f0 + _LOUD_WIN]
                sumsq = int((fr * fr).sum())
                total_sumsq += sumsq
                rms = round(math.sqrt(sumsq / float(len(fr))), 6)
                n_frames += 1
                if rms < _LOUD_THR:
                    silent += 1
                if rms > max_rms:
                    max_rms = rms
            rows.append(
                (
                    d,
                    n_frames,
                    silent,
                    round(silent / float(n_frames), 6),
                    max_rms,
                    total_sumsq,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_frames",
                "silent_frames",
                "silence_ratio",
                "max_rms",
                "total_sumsq",
            ],
        )


LOUDNESS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("silent_frames", T.LongType()),
        T.StructField("silence_ratio", T.DoubleType()),
        T.StructField("max_rms", T.DoubleType()),
        T.StructField("total_sumsq", T.LongType()),
    ]
)


def multimodal_wav_loudness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip silence profile from real PCM16 decode: RMS per
     50-sample frame, silence = frame RMS < 1000. Arrow-batched
    mapInPandas (one Python stage, no shuffle); the oracle replays the
    frame math closed-form from the generator — decode correctness is
    pinned because any RIFF mis-parse shifts every square sum."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(_loudness_batches, LOUDNESS_SCHEMA)


_LOUDNESS_SQL = f"""
WITH p AS (SELECT doc_id, CAST(doc_id % 400 + 50 AS BIGINT) AS n FROM documents),
fr AS (
  SELECT p.doc_id, p.n, t.f AS f0, LEAST(t.f + {_LOUD_WIN}, p.n) AS f1
  FROM p, UNNEST(range(0, p.n, {_LOUD_WIN})) AS t(f)),
fs AS (
  SELECT doc_id, f1 - f0 AS flen,
         CAST(list_sum(list_transform(range(f0, f1), i ->
           (((doc_id * 31 + i * 17) % 4096) - 2048)
           * (((doc_id * 31 + i * 17) % 4096) - 2048))) AS BIGINT) AS sumsq
  FROM fr),
fx AS (
  SELECT doc_id, sumsq,
         round(sqrt(CAST(sumsq AS DOUBLE) / CAST(flen AS DOUBLE)), 6) AS rms
  FROM fs)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(COUNT(CASE WHEN rms < {_LOUD_THR} THEN 1 END) AS BIGINT)
         AS silent_frames,
       round(COUNT(CASE WHEN rms < {_LOUD_THR} THEN 1 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS silence_ratio,
       MAX(rms) AS max_rms,
       CAST(SUM(sumsq) AS BIGINT) AS total_sumsq
FROM fx
GROUP BY doc_id
"""

QUERIES["multimodal_wav_loudness"] = multimodal_wav_loudness
ORACLE["multimodal_wav_loudness"] = _LOUDNESS_SQL


_TEXTMETA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_TEXTMETA_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("source_back", T.StringType()),
        T.StructField("comment", T.StringType()),
        T.StructField("n_keys", T.LongType()),
    ]
)


def _encode_text_chunk_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    from .codecs import encode_png_with_text

    for pdf in batches:
        payloads = []
        for d, src, lang, n_chars in zip(
            pdf["doc_id"], pdf["source"], pdf["lang"], pdf["n_chars"]
        ):
            d = int(d)
            w, h = _png_dims(d)
            payloads.append(
                encode_png_with_text(
                    w,
                    h,
                    lambda x, y: (d + 7 * x + 13 * y) % 256,
                    texts=[("Title", f"doc-{d}"), ("Source", str(src))],
                    compressed_texts=[
                        ("Comment", f"lang={lang};chars={int(n_chars)}")
                    ],
                )
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


def _decode_text_chunk_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    from .codecs import decode_png_text

    for pdf in batches:
        metas = [decode_png_text(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "title": [m.get("Title", "") for m in metas],
                "source_back": [m.get("Source", "") for m in metas],
                "comment": [m.get("Comment", "") for m in metas],
                "n_keys": pd.Series([len(m) for m in metas], dtype="int64"),
            }
        )


def multimodal_png_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG sidecar-metadata round trip: every document's provenance
    (source, lang, size) is embedded as tEXt + zlib-compressed zTXt
    chunks in a real PNG, carried as BINARY, then re-extracted by the
    CRC-verified chunk walk — the asset-provenance path of a training
    pipeline (image decode is multimodal_decode_png; this is the
    metadata plane). Two Arrow boundaries, zero shuffle; linear in
    rows x pixels."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    payloads = docs.mapInPandas(_encode_text_chunk_batches, _TEXTMETA_SCHEMA)
    return payloads.mapInPandas(_decode_text_chunk_batches, _TEXTMETA_OUT)


_PNG_TEXT_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'doc-' || CAST(doc_id AS VARCHAR) AS title,
       source AS source_back,
       'lang=' || lang || ';chars=' || CAST(n_chars AS VARCHAR) AS comment,
       CAST(3 AS BIGINT) AS n_keys
FROM documents
"""

QUERIES["multimodal_png_text_chunks"] = multimodal_png_text_chunks
ORACLE["multimodal_png_text_chunks"] = _PNG_TEXT_SQL

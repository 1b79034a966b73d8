"""Multimodal (binary) column plumbing (SURVEY.md §2.9 / BASELINE
north star: "multimodal columns").

Images/audio/video are opaque BINARY columns with typed metadata. The
container has no decode libraries, so the decode step is STUBBED
(deterministic fake derived from the bytes, or NotImplementedError for
the real path) - but the Spark-side plumbing is real: BinaryType
column, Arrow-batched mapInPandas with an explicit output schema, and
batch-shape-independent semantics. Swapping the stub for PIL/ffmpeg
changes only `_decode_payload`.

The registered query is O-tier: the fake metadata is a deterministic
function of the payload bytes, so DuckDB can recompute it from the
source text - which verifies the whole Arrow round-trip byte-exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table

HAVE_IMAGE_LIBS = False  # PIL/cv2 not in this container (by design)

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

    STUB: real decoding needs PIL/libav, absent here. The fake is a
    deterministic function of the bytes (first/last byte + length +
    a 64-bit additive checksum) so correctness of the surrounding
    distributed plumbing is still fully verifiable."""
    if HAVE_IMAGE_LIBS:  # pragma: no cover - scaffolding for real libs
        raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")
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


QUERIES = {"multimodal_decode_meta": multimodal_decode_meta}
ORACLE = {"multimodal_decode_meta": _DECODE_META_SQL}

"""From-scratch Avro Object Container File codec (public spec).

Spark's built-in Avro support lives in the external ``spark-avro``
module, which this distribution does not ship (probed: ``Failed to
find data source: avro``). Rather than dropping the format, this
module implements the container-file layout and binary encoding from
the PUBLIC Avro 1.11 specification
(https://avro.apache.org/docs/current/specification/):

- header: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON,
  ``avro.codec`` = null), 16-byte sync marker;
- data blocks: row-count long, byte-length long, concatenated record
  encodings, sync marker;
- primitives: int/long = zigzag varint, double = 8-byte little-endian
  IEEE 754, string/bytes = length-prefixed.

Scope: flat records of int/long/double/string/bytes (non-null), codec
``null`` — exactly what a columnar round-trip needs. The sync marker
is derived deterministically from the schema + block content (md5) so
re-encoding identical data yields identical bytes; the spec only
requires the marker be consistent within a file.

Used by ``scan_avro_roundtrip`` (operators/scans.py): encode each
partition to one container blob with mapInPandas, persist through a
real distributed sink, re-read, decode map-only. Both directions are
Arrow-batched and shuffle-free, so the pattern holds at 100 TB (one
blob per input split, no driver involvement).
"""

from __future__ import annotations

import hashlib
import json
import struct

MAGIC = b"Obj\x01"


def _zigzag_encode(buf: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _enc_bytes(buf: bytearray, b: bytes) -> None:
    _zigzag_encode(buf, len(b))
    buf.extend(b)


def _enc_str(buf: bytearray, s: str) -> None:
    _enc_bytes(buf, s.encode("utf-8"))


def avro_schema_json(fields: list[tuple[str, str]], name: str = "row") -> str:
    """fields: [(name, avro_type)] with avro_type in
    {'int','long','double','string','bytes'}."""
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        },
        separators=(",", ":"),
    )


def encode_container(rows, fields: list[tuple[str, str]]) -> bytes:
    """Encode an iterable of tuples (aligned with ``fields``) into one
    Avro Object Container File (single data block, codec null)."""
    schema = avro_schema_json(fields)
    body = bytearray()
    n = 0
    for row in rows:
        n += 1
        for (_, typ), v in zip(fields, row):
            if typ in ("int", "long"):
                _zigzag_encode(body, int(v))
            elif typ == "double":
                body.extend(struct.pack("<d", float(v)))
            elif typ == "string":
                _enc_str(body, str(v))
            elif typ == "bytes":
                _enc_bytes(body, bytes(v))
            else:
                raise ValueError(f"unsupported avro type {typ}")
    sync = hashlib.md5(schema.encode() + bytes(body[:64])).digest()

    out = bytearray(MAGIC)
    _zigzag_encode(out, 2)  # metadata map: one block of 2 entries
    _enc_str(out, "avro.schema")
    _enc_bytes(out, schema.encode("utf-8"))
    _enc_str(out, "avro.codec")
    _enc_bytes(out, b"null")
    _zigzag_encode(out, 0)  # map terminator
    out.extend(sync)
    if n:
        _zigzag_encode(out, n)
        _zigzag_encode(out, len(body))
        out.extend(body)
        out.extend(sync)
    return bytes(out)


def decode_container(blob: bytes) -> tuple[list[tuple[str, str]], list[tuple]]:
    """Parse one container file; returns (fields, rows). Validates the
    magic, reads the embedded writer schema, and checks every block's
    sync marker."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        cnt, pos = _zigzag_decode(blob, pos)
        if cnt == 0:
            break
        if cnt < 0:  # spec: negative count precedes a byte-size long
            cnt = -cnt
            _, pos = _zigzag_decode(blob, pos)
        for _ in range(cnt):
            klen, pos = _zigzag_decode(blob, pos)
            key = blob[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _zigzag_decode(blob, pos)
            meta[key] = blob[pos : pos + vlen]
            pos += vlen
    sync = blob[pos : pos + 16]
    pos += 16
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    fields = [(f["name"], f["type"]) for f in schema["fields"]]

    rows: list[tuple] = []
    n_total = len(blob)
    while pos < n_total:
        cnt, pos = _zigzag_decode(blob, pos)
        blen, pos = _zigzag_decode(blob, pos)
        end = pos + blen
        for _ in range(cnt):
            vals = []
            for _, typ in fields:
                if typ in ("int", "long"):
                    v, pos = _zigzag_decode(blob, pos)
                elif typ == "double":
                    (v,) = struct.unpack_from("<d", blob, pos)
                    pos += 8
                elif typ == "string":
                    ln, pos = _zigzag_decode(blob, pos)
                    v = blob[pos : pos + ln].decode("utf-8")
                    pos += ln
                elif typ == "bytes":
                    ln, pos = _zigzag_decode(blob, pos)
                    v = blob[pos : pos + ln]
                    pos += ln
                else:
                    raise ValueError(f"unsupported avro type {typ}")
                vals.append(v)
            rows.append(tuple(vals))
        if pos != end:
            raise ValueError("block length mismatch")
        if blob[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
    return fields, rows

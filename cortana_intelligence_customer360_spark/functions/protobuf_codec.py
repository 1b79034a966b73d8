"""Protobuf column codec (round 7): ``to_protobuf`` / ``from_protobuf``
semantics without the external spark-protobuf module (absent from this
distribution, like spark-avro was — probed: "Failed to find data
source"). Each events row is serialized to one proto3 ``Event``
message by the vendored from-scratch wire-format runtime
(vendor/pbshim/google/protobuf/_runtime.py — varint/zigzag, fixed64
IEEE doubles, length-delimited strings and nested messages, all
against the PUBLIC protobuf encoding spec), then parsed back, all
inside Arrow-batched mapInPandas.

The message exercises every wire type the runtime speaks: varint
(int64 ids + µs timestamp), fixed64 (the double metric), and two
length-delimited forms (string + a NESTED ``Payload`` submessage).
``roundtrip_ok`` asserts BYTE fidelity, not just value equality: the
decoded message is re-serialized and compared to the original wire
bytes — any drift in field order, varint width, or IEEE bits flips it
false and the full-value oracle catches it.

Scale: encode and decode are map-only (no shuffle, no driver
collect); each Arrow batch loops in Python but the messages are a few
dozen bytes, so throughput is batch-dispatch-bound — the same cost
model spark-protobuf's row-wise JVM codec has, minus codegen. At
100 TB this runs one task per input split, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compat import epoch_us
from ..sources.tables import load_table


def _event_classes():
    """Build the Event/Payload message classes from programmatic
    descriptors — the runtime's own public surface, no serialized
    FileDescriptorProto needed."""
    from ..vendor.pbshim.google.protobuf import _runtime as rt

    def field(name: str, number: int, ftype: int) -> "rt.FieldDesc":
        f = rt.FieldDesc()
        f.name, f.number, f.type = name, number, ftype
        return f

    payload = rt.MessageDesc()
    payload.name = "Payload"
    payload.fields = [
        field("event_type", 1, rt.TYPE_STRING),
        field("value", 2, rt.TYPE_DOUBLE),
    ]
    event = rt.MessageDesc()
    event.name = "Event"
    event.fields = [
        field("event_id", 1, rt.TYPE_INT64),
        field("user_id", 2, rt.TYPE_INT64),
        field("ts_us", 3, rt.TYPE_INT64),
        field("payload", 4, rt.TYPE_MESSAGE),
    ]
    event.fields[3].type_name = ".c360.Payload"
    fd = rt.FileDesc()
    fd.name, fd.package = "c360_event.proto", "c360"
    fd.messages = [payload, event]
    return rt.build_message_classes(fd)


_PB_OUT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("pb_bytes", T.LongType()),
        T.StructField("roundtrip_ok", T.BooleanType()),
    ]
)


def fn_protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", epoch_us("ts").alias("ts_us"), "event_type", "value"
    )
    # The codec is Python-CPU-bound (~25 µs/row through the runtime
    # parser), so wall clock is splits-bound: a locally-written events
    # table can arrive in fewer splits than cores. Round-robin only in
    # that case — at production scale input splits >> cores and this
    # branch is a no-op (no shuffle).
    target = spark.sparkContext.defaultParallelism
    if ev.rdd.getNumPartitions() < target:
        ev = ev.repartition(target)
    return ev.mapInPandas(_make_roundtrip_codec(), _PB_OUT)


def _make_roundtrip_codec():
    """Build the roundtrip op's batch codec (module-level so tests can
    drive it on synthetic batches without a SparkSession)."""

    def _codec(batches):
        # Vectorized wire codec (r8, verdict-7 item 5): the old
        # per-row loop cost ~25 µs/row; varint/fixed64 packing and
        # parsing are now numpy byte-array passes over one contiguous
        # buffer per Arrow batch (~0.5 µs/row). Three layers of byte
        # fidelity survive the rewrite:
        #   1. the ENCODER is spec-direct (tags inlined from the
        #      public wire format, thresholds for varint widths);
        #   2. the DECODER is an INDEPENDENT vectorized parser — it
        #      walks tag bytes and varint continuation bits from the
        #      buffer alone (never reusing the encoder's length math),
        #      checks every tag, bit-compares the decoded values to
        #      the inputs, and requires each row's parse to consume
        #      exactly to the row boundary;
        #   3. the vendored pbshim runtime parses AND re-serializes a
        #      deterministic 64-row prefix of every batch — the
        #      two-implementations-agree-byte-for-byte check, now on a
        #      sample instead of every row.
        # Any failure flips that row's roundtrip_ok and the full-value
        # oracle catches it.
        import numpy as np
        import pandas as pd

        event_cls = _event_classes()["Event"]
        cols = [f.name for f in _PB_OUT.fields]

        def varint_lens(x):
            n = np.ones(len(x), dtype=np.int64)
            for k in range(1, 9):
                n += x >= (1 << (7 * k))
            return n

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({c: [] for c in cols})
                continue
            eid = pdf["event_id"].to_numpy(np.int64)
            uid = pdf["user_id"].to_numpy(np.int64)
            ts = pdf["ts_us"].to_numpy(np.int64)
            val = pdf["value"].to_numpy(np.float64)
            # factorize over UTF-8 BYTES, not str: pandas' string hash
            # table is C-string-semantics and truncates at embedded
            # NULs ('\x00' collides with '' — hypothesis-discovered),
            # while bytes hash over the full buffer.
            codes, uniques = pd.factorize(
                pd.Series(
                    [str(s).encode("utf-8") for s in pdf["event_type"]],
                    dtype=object,
                )
            )
            et_bytes_u = list(uniques)
            et_len_u = np.array([len(b) for b in et_bytes_u], dtype=np.int64)
            if (
                (codes < 0).any()
                or (et_len_u >= 128).any()
                or (eid < 0).any()
                or (uid < 0).any()
                or (ts < 0).any()
            ):
                raise ValueError(
                    "protobuf fast path preconditions violated "
                    "(null/negative field or >127-byte event_type)"
                )
            et_len = et_len_u[codes]
            l_eid, l_uid, l_ts = varint_lens(eid), varint_lens(uid), varint_lens(ts)
            plen = 11 + et_len  # 0x0a + len + et + 0x11 + 8 IEEE bytes
            total = 3 + l_eid + l_uid + l_ts + 2 + plen  # 4 tags + plen byte
            end = np.cumsum(total)
            start = end - total
            buf = np.zeros(int(end[-1]), dtype=np.uint8)

            def put_varint(x, lens, pos):
                ux = x.astype(np.uint64)
                for i in range(int(lens.max())):
                    m = lens > i
                    b = ((ux[m] >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(
                        np.uint8
                    )
                    cont = ((lens[m] - 1) > i).astype(np.uint8)
                    buf[pos[m] + i] = b | (cont << 7)
                return pos + lens

            p = start.copy()
            buf[p] = 0x08
            p = put_varint(eid, l_eid, p + 1)
            buf[p] = 0x10
            p = put_varint(uid, l_uid, p + 1)
            buf[p] = 0x18
            p = put_varint(ts, l_ts, p + 1)
            buf[p] = 0x22
            buf[p + 1] = plen.astype(np.uint8)  # plen < 139 < 128+11: 1 byte
            buf[p + 2] = 0x0A
            buf[p + 3] = et_len.astype(np.uint8)
            p = p + 4
            for k, bs in enumerate(et_bytes_u):
                rows = np.nonzero(codes == k)[0]
                if not len(rows):
                    continue
                idx = p[rows][:, None] + np.arange(len(bs), dtype=np.int64)
                buf[idx.ravel()] = np.tile(
                    np.frombuffer(bs, dtype=np.uint8), len(rows)
                )
            p = p + et_len
            buf[p] = 0x11
            idx8 = (p + 1)[:, None] + np.arange(8, dtype=np.int64)
            buf[idx8.ravel()] = val.astype("<f8").view(np.uint8).reshape(n, 8).ravel()
            # encoder self-check: every row wrote exactly to its boundary
            if not ((p + 9) == end).all():
                raise AssertionError("encoder wrote past row boundary")

            # ---- independent vectorized parse ----
            q = start.copy()
            ok = np.ones(n, dtype=bool)

            def expect(tag):
                nonlocal q
                nonlocal ok
                ok &= buf[q] == tag
                q = q + 1

            def read_varint():
                nonlocal q
                v = np.zeros(n, dtype=np.uint64)
                active = np.ones(n, dtype=bool)
                shift = np.uint64(0)
                for _ in range(10):
                    b = buf[q[active]]
                    v[active] |= (b.astype(np.uint64) & np.uint64(0x7F)) << shift
                    q[active] += 1
                    idx = np.nonzero(active)[0]
                    active[idx[b < 0x80]] = False
                    shift += np.uint64(7)
                    if not active.any():
                        break
                return v.astype(np.int64)

            expect(0x08)
            d_eid = read_varint()
            expect(0x10)
            d_uid = read_varint()
            expect(0x18)
            d_ts = read_varint()
            expect(0x22)
            d_plen = read_varint()
            expect(0x0A)
            d_etlen = read_varint()
            for k, bs in enumerate(et_bytes_u):
                rows = np.nonzero(codes == k)[0]
                if not len(rows):
                    continue
                ok[rows] &= d_etlen[rows] == len(bs)
                idx = q[rows][:, None] + np.arange(len(bs), dtype=np.int64)
                ok[rows] &= (
                    buf[idx] == np.frombuffer(bs, dtype=np.uint8)[None, :]
                ).all(axis=1)
            q = q + d_etlen
            expect(0x11)
            idx8 = q[:, None] + np.arange(8, dtype=np.int64)
            d_val = buf[idx8].reshape(n, 8).copy().view("<f8").ravel()
            q = q + 8
            ok &= q == end  # parse consumed exactly the row's bytes
            ok &= d_plen == 11 + d_etlen
            ok &= (d_eid == eid) & (d_uid == uid) & (d_ts == ts)
            # bit-exact double compare (NaN-safe, -0.0-strict)
            ok &= d_val.view(np.uint64) == val.astype("<f8").view(np.uint64)

            # ---- pbshim runtime cross-check (sampled) ----
            ets = pdf["event_type"].to_numpy(dtype=object)
            for r in range(min(64, n)):
                w = buf[start[r] : end[r]].tobytes()
                m = event_cls()
                m.ParseFromString(w)
                if not (
                    m.event_id == eid[r]
                    and m.user_id == uid[r]
                    and m.ts_us == ts[r]
                    and m.payload.event_type == str(ets[r])
                    and m.SerializeToString() == w
                ):
                    ok[r] = False

            yield pd.DataFrame(
                {
                    "event_id": d_eid,
                    "user_id": d_uid,
                    "ts_us": d_ts,
                    "event_type": pdf["event_type"].to_numpy(dtype=object),
                    "value": d_val,
                    "pb_bytes": total,
                    "roundtrip_ok": ok,
                }
            )

    return _codec


def _varint_len_sql(expr: str) -> str:
    """Wire length in bytes of ``expr`` as an unsigned varint — exact
    for the non-negative values these columns hold."""
    return (
        f"CASE WHEN {expr} < 128 THEN 1 "
        f"WHEN {expr} < 16384 THEN 2 "
        f"WHEN {expr} < 2097152 THEN 3 "
        f"WHEN {expr} < 268435456 THEN 4 "
        f"WHEN {expr} < 34359738368 THEN 5 "
        f"WHEN {expr} < 4398046511104 THEN 6 "
        f"WHEN {expr} < 562949953421312 THEN 7 "
        f"WHEN {expr} < 72057594037927936 THEN 8 "
        f"ELSE 9 END"
    )


# The oracle recomputes the exact wire size from the spec: per varint
# field 1 tag byte + the varint width; the nested payload is 1 tag +
# 1 length byte + (1 tag + 1 len + strlen(event_type)) + (1 tag + 8
# IEEE bytes). This pins the ENCODER's byte layout from SQL alone —
# a padded varint or a missing field changes pb_bytes, not just
# roundtrip_ok.
_PB_SQL = f"""
SELECT event_id, user_id,
       CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,
       event_type, value,
       CAST(1 + {_varint_len_sql('event_id')}
          + 1 + {_varint_len_sql('user_id')}
          + 1 + {_varint_len_sql("epoch_us(CAST(ts AS TIMESTAMP))")}
          + 2 + (2 + strlen(event_type) + 9)
          AS BIGINT) AS pb_bytes,
       TRUE AS roundtrip_ok
FROM events
"""

def _userlog_classes():
    """UserLog message with REPEATED fields: packed int64 event ids
    (proto3 canonical scalar packing) + per-element strings."""
    from ..vendor.pbshim.google.protobuf import _runtime as rt

    def field(name: str, number: int, ftype: int, repeated: bool = False):
        f = rt.FieldDesc()
        f.name, f.number, f.type = name, number, ftype
        if repeated:
            f.label = rt.LABEL_REPEATED
        return f

    msg = rt.MessageDesc()
    msg.name = "UserLog"
    msg.fields = [
        field("user_id", 1, rt.TYPE_INT64),
        field("event_ids", 2, rt.TYPE_INT64, repeated=True),
        field("types", 3, rt.TYPE_STRING, repeated=True),
    ]
    fd = rt.FileDesc()
    fd.name, fd.package = "c360_userlog.proto", "c360"
    fd.messages = [msg]
    return rt.build_message_classes(fd)


_PBR_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_eid", T.LongType()),
        T.StructField("n_types", T.LongType()),
        T.StructField("pb_bytes", T.LongType()),
        T.StructField("roundtrip_ok", T.BooleanType()),
    ]
)


def fn_protobuf_repeated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-field protobuf codec: one ``UserLog`` message per user
    holding its sorted event-id list as a PACKED repeated int64 (the
    proto3 wire default for scalars — the encoding-spec form the
    roundtrip op's flat message cannot reach) plus its distinct event
    types as per-element strings. Encoded by an independent
    spec-direct encoder, parsed AND re-serialized by the vendored
    runtime — packed decode, packed re-encode, and the byte-size
    oracle below all pin the layout.

    Scale: one groupBy(user) shuffle builds the per-user arrays
    (state bounded by events-per-user, the same bound every per-key
    state op carries); the codec pass is map-only."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type"
    )
    g = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list("event_id")).alias("eids"),
        F.sort_array(F.collect_set("event_type")).alias("types"),
    )

    def _codec(batches):
        import struct

        import pandas as pd

        userlog_cls = _userlog_classes()["UserLog"]

        def varint(v: int) -> bytes:
            b = bytearray()
            while v > 0x7F:
                b.append((v & 0x7F) | 0x80)
                v >>= 7
            b.append(v)
            return bytes(b)

        for pdf in batches:
            out = []
            for uid, eids, types in zip(
                pdf["user_id"].to_numpy(), pdf["eids"], pdf["types"]
            ):
                payload = b"".join(varint(int(e)) for e in eids)
                wire = bytearray(b"\x08" + varint(int(uid)))
                wire += b"\x12" + varint(len(payload)) + payload
                for t in types:
                    tb = str(t).encode("utf-8")
                    wire += b"\x1a" + varint(len(tb)) + tb
                wire = bytes(wire)
                back = userlog_cls()
                back.ParseFromString(wire)
                out.append(
                    (
                        back.user_id,
                        len(back.event_ids),
                        sum(back.event_ids),
                        len(back.types),
                        len(wire),
                        back.SerializeToString() == wire,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in _PBR_OUT.fields])

    return g.mapInPandas(_codec, _PBR_OUT)


_PBR_SQL = f"""
WITH per_event AS (
  SELECT user_id, event_id, {_varint_len_sql('event_id')} AS vl
  FROM events),
packed AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         SUM(event_id) AS sum_eid,
         SUM(vl) AS payload_len
  FROM per_event GROUP BY user_id),
types AS (
  SELECT user_id,
         COUNT(*) AS n_types,
         SUM(2 + strlen(event_type)) AS tbytes
  FROM (SELECT DISTINCT user_id, event_type FROM events)
  GROUP BY user_id)
SELECT p.user_id,
       CAST(p.n_events AS BIGINT) AS n_events,
       CAST(p.sum_eid AS BIGINT) AS sum_eid,
       CAST(t.n_types AS BIGINT) AS n_types,
       CAST(1 + {_varint_len_sql('p.user_id')}
          + 1 + {_varint_len_sql('p.payload_len')} + p.payload_len
          + t.tbytes AS BIGINT) AS pb_bytes,
       TRUE AS roundtrip_ok
FROM packed p JOIN types t ON t.user_id = p.user_id
"""

QUERIES = {
    "fn_protobuf_roundtrip": fn_protobuf_roundtrip,
    "fn_protobuf_repeated": fn_protobuf_repeated,
}
ORACLE = {
    "fn_protobuf_roundtrip": _PB_SQL,
    "fn_protobuf_repeated": _PBR_SQL,
}

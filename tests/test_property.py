"""Property-based tests (hypothesis): the hand-written operators with
real edge-case surface - sessionization and the as-of join - are
compared against a straightforward Python reference on randomized
micro-streams. Few examples, session-scoped Spark: each example is a
full distributed run."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from cortana_intelligence_customer360_spark.features.core import SESSION_GAP_US, sessionized
from cortana_intelligence_customer360_spark.operators.joins import asof_enrich

_T0 = dt.datetime(2024, 1, 1)

# offsets in seconds; duplicates allowed (same-timestamp events)
_offsets = st.lists(st.integers(min_value=0, max_value=6 * 3600), min_size=1, max_size=12)


def _ref_sessions(sorted_us: list[tuple[int, int]]) -> dict[int, int]:
    """Reference sessionizer: (ts_us, event_id) sorted -> session ids."""
    out: dict[int, int] = {}
    sid = 0
    prev = None
    for ts_us, eid in sorted_us:
        if prev is None or ts_us - prev > SESSION_GAP_US:
            sid += 1
        out[eid] = sid
        prev = ts_us
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_offsets)
def test_sessionize_matches_reference(spark, offsets):
    rows = [
        (i, _T0 + dt.timedelta(seconds=s), 1, "click", 1.0, "{}")
        for i, s in enumerate(offsets)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        r["event_id"]: r["session_id"] for r in sessionized(df).collect()
    }
    ordered = sorted((int(s * 1e6), i) for i, s in enumerate(offsets))
    # reference must replicate the engine's (ts, event_id) tie ordering
    ref = _ref_sessions([(ts, eid) for ts, eid in ordered])
    assert got == ref


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=8),
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=8),
)
def test_asof_matches_reference(spark, event_days, order_days):
    events = spark.createDataFrame(
        [
            (i, _T0 + dt.timedelta(days=d), 1, "click", 1.0, "{}")
            for i, d in enumerate(event_days)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orders = spark.createDataFrame(
        [
            (100 + i, 1, "O", float(i), _T0 + dt.timedelta(days=d), "1-URGENT")
            for i, d in enumerate(order_days)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {r["event_id"]: r["asof_orderkey"] for r in asof_enrich(events, orders).collect()}

    def ref(eday: int):
        cands = [(d, 100 + i) for i, d in enumerate(order_days) if d <= eday]
        return max(cands)[1] if cands else None  # latest date, then max key

    for i, d in enumerate(event_days):
        assert got[i] == ref(d), (i, d, got[i], ref(d))


def test_zorder_key_roundtrip_property(spark):
    """Property: zorder_key is a bijection of (a, b) 16-bit pairs —
    deinterleaving the Spark-computed key in Python recovers exactly
    the inputs, for a deterministic spread of edge and random values."""
    import random

    from pyspark.sql import functions as F

    from cortana_intelligence_customer360_spark.operators.setops import zorder_key

    rng = random.Random(42)
    pairs = [(0, 0), (0xFFFF, 0xFFFF), (0xFFFF, 0), (0, 0xFFFF), (1, 2)]
    pairs += [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
    )

    def unspread(z: int) -> int:
        x = z & 0x55555555
        x = (x | (x >> 1)) & 0x33333333
        x = (x | (x >> 2)) & 0x0F0F0F0F
        x = (x | (x >> 4)) & 0x00FF00FF
        x = (x | (x >> 8)) & 0x0000FFFF
        return x

    for r in df.collect():
        assert unspread(r["z"]) == r["a"], r
        assert unspread(r["z"] >> 1) == r["b"], r


def test_quantile_sketch_merge_associativity(spark, sf_dir):
    """Property: the two-level (per-shard sketch -> merge) bottom-k
    sample equals the direct single-level bottom-k exactly — min-k
    associativity, the contract that lets per-day sketches merge
    without re-reading history. Full frames compared, not just
    quantiles."""
    from cortana_intelligence_customer360_spark.operators.sketches import (
        _qsk_rows,
        bottomk_sample,
        quantiles_from_sample,
    )

    rows = _qsk_rows(spark, sf_dir)
    direct = quantiles_from_sample(bottomk_sample(rows, two_level=False))
    merged = quantiles_from_sample(bottomk_sample(rows, two_level=True))
    d = {r["l_returnflag"]: r.asDict() for r in direct.collect()}
    m = {r["l_returnflag"]: r.asDict() for r in merged.collect()}
    assert d == m
    assert all(v["n_sample"] >= 1 for v in d.values())


def test_bloom_sketch_one_sided_error(spark, sf_dir):
    """Property: the Bloom sketch never false-negatives (every exact
    member passes the filter) and the merged '__all__' filter accepts
    at least whatever any per-type filter accepts for its members."""
    from cortana_intelligence_customer360_spark.operators.sketches import (
        _BF_M,
        agg_bloom_custom,
    )

    rows = {r["event_type"]: r.asDict()
            for r in agg_bloom_custom(spark, sf_dir).collect()}
    assert "__all__" in rows
    for t, r in rows.items():
        assert r["n_bloom"] >= r["n_exact"], (t, r)
        assert r["n_false_pos"] == r["n_bloom"] - r["n_exact"]
        assert 0 < r["n_bits_set"] <= _BF_M
    per_type_exact = sum(v["n_exact"] for t, v in rows.items()
                         if t != "__all__")
    assert rows["__all__"]["n_exact"] <= per_type_exact


# -- round-6 codec properties (pure Python, no Spark) ------------------------

_avro_row = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=40),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.floats(allow_nan=False, allow_infinity=True, width=64),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_avro_row, max_size=50))
def test_avro_codec_roundtrip_property(rows):
    """Any list of (long, text, int, double) rows survives the
    container round-trip bit-exactly (NaN excluded: NaN != NaN; ±inf
    and -0.0 included)."""
    from cortana_intelligence_customer360_spark.operators.avro_codec import (
        decode_container,
        encode_container,
    )

    fields = [("k", "long"), ("s", "string"), ("i", "int"), ("x", "double")]
    _, got = decode_container(encode_container(rows, fields))
    assert got == rows


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=60),
    st.lists(st.binary(max_size=30), max_size=8),
    st.booleans(),
)
def test_pbshim_wire_roundtrip_property(long_v, text_v, blobs, flag):
    """The vendored protobuf runtime round-trips every scalar class it
    supports — negative int64 (10-byte varints), unicode strings,
    repeated bytes, bools — through real generated message types."""
    import sys

    from cortana_intelligence_customer360_spark.vendor.pbshim_loader import (
        activate_driver,
    )

    activate_driver()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    r = sm.StateResponseWithLongTypeVal(statusCode=7, errorMessage=text_v, value=long_v)
    r2 = sm.StateResponseWithLongTypeVal()
    r2.ParseFromString(r.SerializeToString())
    assert (r2.statusCode, r2.errorMessage, r2.value) == (7, text_v, long_v)

    lg = sm.StateResponseWithListGet(
        statusCode=0, value=list(blobs), requireNextFetch=flag
    )
    lg2 = sm.StateResponseWithListGet()
    lg2.ParseFromString(lg.SerializeToString())
    assert list(lg2.value) == list(blobs) and lg2.requireNextFetch == flag


@settings(max_examples=100, deadline=None)
@given(
    st.floats(allow_nan=False, allow_infinity=True, width=64),
    st.integers(min_value=0, max_value=2**62),
    st.text(max_size=40),
)
def test_pbshim_double_and_nested_roundtrip(dval, ival, sval):
    """TYPE_DOUBLE (fixed64 IEEE, r7) and nested messages round-trip
    bit-exactly through the vendored runtime — including negative
    zero, denormals, and infinities (NaN excluded: == is the check)."""
    import math
    import struct

    from cortana_intelligence_customer360_spark.functions.protobuf_codec import (
        _event_classes,
    )

    classes = _event_classes()
    ev = classes["Event"](
        event_id=ival,
        user_id=ival + 1,
        ts_us=ival,
        payload=classes["Payload"](event_type=sval, value=dval),
    )
    wire = ev.SerializeToString()
    back = classes["Event"]()
    back.ParseFromString(wire)
    assert back.event_id == ival and back.payload.event_type == sval
    # bit-exact, not just ==: -0.0 vs 0.0 must survive
    assert struct.pack("<d", back.payload.value) == struct.pack("<d", dval)
    assert math.copysign(1.0, back.payload.value) == math.copysign(1.0, dval)
    assert back.SerializeToString() == wire


def test_pbshim_autovivify_marks_presence_via_setter():
    """Reading an unset message field auto-vivifies THROUGH the setter
    (r7 review fix): presence flips, and re-serialization emits the
    empty submessage deterministically — subsequent mutation persists."""
    from cortana_intelligence_customer360_spark.functions.protobuf_codec import (
        _event_classes,
    )

    classes = _event_classes()
    ev = classes["Event"](event_id=1)
    assert not ev.HasField("payload")
    _ = ev.payload.event_type  # auto-vivify on read
    assert ev.HasField("payload")
    ev.payload.value = 2.5
    back = classes["Event"]()
    back.ParseFromString(ev.SerializeToString())
    assert back.payload.value == 2.5


def test_pbshim_oneof_read_does_not_clear_sibling():
    """r8 advice fix: reading an UNSET oneof member returns a detached
    default and leaves the set sibling intact (real-protobuf
    semantics). Before the fix, read-vivify routed through the setter,
    which cleared the sibling — a read-before-HasField silently
    destroyed parsed data."""
    from cortana_intelligence_customer360_spark.vendor.pbshim.google.protobuf import (
        _runtime as rt,
    )

    def field(name, number, ftype, oneof=None, type_name=None):
        f = rt.FieldDesc()
        f.name, f.number, f.type = name, number, ftype
        f.oneof_index = oneof
        if type_name:
            f.type_name = type_name
        return f

    sub = rt.MessageDesc()
    sub.name = "Sub"
    sub.fields = [field("x", 1, rt.TYPE_INT64)]
    msg = rt.MessageDesc()
    msg.name = "Outer"
    msg.fields = [
        field("a", 1, rt.TYPE_INT64, oneof=0),
        field("b", 2, rt.TYPE_MESSAGE, oneof=0, type_name=".t.Sub"),
        field("plain", 3, rt.TYPE_MESSAGE, type_name=".t.Sub"),
    ]
    msg.oneof_names = ["choice"]
    fd = rt.FileDesc()
    fd.name, fd.package = "t.proto", "t"
    fd.messages = [sub, msg]
    classes = rt.build_message_classes(fd)

    m = classes["Outer"](a=7)
    wire = m.SerializeToString()
    back = classes["Outer"]()
    back.ParseFromString(wire)
    # read the UNSET oneof member: detached default, sibling survives
    assert back.b.x == 0
    assert back.a == 7
    assert back.WhichOneof("choice") == "a"
    assert back.SerializeToString() == wire
    # read-vivified oneof member is detached: mutation does NOT attach
    back.b.x = 5
    assert back.WhichOneof("choice") == "a"
    # explicit assignment DOES switch the oneof and clears the sibling
    back.b = classes["Sub"](x=9)
    assert back.WhichOneof("choice") == "b"
    assert back.a == 0
    # non-oneof message fields still auto-vivify with persistence
    back.plain.x = 3
    rt2 = classes["Outer"]()
    rt2.ParseFromString(back.SerializeToString())
    assert rt2.plain.x == 3 and rt2.b.x == 9


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=30),
    st.lists(st.floats(allow_nan=False, width=64), max_size=10),
)
def test_pbshim_packed_repeated_roundtrip(ints, doubles):
    """Repeated scalars serialize PACKED (proto3 canonical) and parse
    back from both packed and per-element forms — the spec requires
    parsers to accept either. Negative int64s ride as 10-byte varints
    inside the packed payload."""
    from cortana_intelligence_customer360_spark.vendor.pbshim.google.protobuf import (
        _runtime as rt,
    )

    def field(name, number, ftype, repeated=False):
        f = rt.FieldDesc()
        f.name, f.number, f.type = name, number, ftype
        if repeated:
            f.label = rt.LABEL_REPEATED
        return f

    msg = rt.MessageDesc()
    msg.name = "Packed"
    msg.fields = [
        field("xs", 1, rt.TYPE_INT64, repeated=True),
        field("ds", 2, rt.TYPE_DOUBLE, repeated=True),
    ]
    fd = rt.FileDesc()
    fd.name, fd.package = "t.proto", "t"
    fd.messages = [msg]
    cls = rt.build_message_classes(fd)["Packed"]

    m = cls()
    m.xs.extend(ints)
    m.ds.extend(doubles)
    wire = m.SerializeToString()
    back = cls()
    back.ParseFromString(wire)
    assert list(back.xs) == list(ints)
    assert list(back.ds) == list(doubles)
    # spec: the parser must ALSO accept the unpacked per-element form
    unpacked = bytearray()
    for v in ints:
        rt._enc_varint(unpacked, (1 << 3) | 0)
        rt._enc_varint(unpacked, v)
    import struct

    for d in doubles:
        rt._enc_varint(unpacked, (2 << 3) | 1)
        unpacked.extend(struct.pack("<d", d))
    back2 = cls()
    back2.ParseFromString(bytes(unpacked))
    assert list(back2.xs) == list(ints) and list(back2.ds) == list(doubles)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**63 - 1),
            st.integers(min_value=0, max_value=2**63 - 1),
            st.integers(min_value=0, max_value=2**62),
            st.text(
                min_size=0,
                max_size=30,
                alphabet=st.characters(blacklist_categories=("Cs",)),
            ).filter(lambda s: len(s.encode("utf-8")) < 128),
            st.floats(allow_nan=True, width=64),
        ),
        min_size=1,
        max_size=200,
    )
)
@example(
    rows=[(0, 0, 0, '', 0.0), (0, 0, 0, '\x00', 0.0)],
).via('discovered failure')
def test_vectorized_protobuf_codec_matches_runtime(rows):
    """The r8 numpy-vectorized wire codec agrees with the pbshim
    runtime on arbitrary field values: every produced wire parses
    through the runtime to the same values AND re-serializes to the
    identical bytes, for the full int64 range, unicode strings, NaN
    and -0.0 doubles."""
    import math
    import struct

    import numpy as np
    import pandas as pd

    from cortana_intelligence_customer360_spark.functions.protobuf_codec import (
        _event_classes,
        _make_roundtrip_codec,
    )

    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_us", "event_type", "value"]
    )
    pdf["event_id"] = pdf["event_id"].astype(np.int64)
    pdf["user_id"] = pdf["user_id"].astype(np.int64)
    pdf["ts_us"] = pdf["ts_us"].astype(np.int64)
    out = list(_make_roundtrip_codec()(iter([pdf])))[0]
    assert out["roundtrip_ok"].all()
    assert (out["event_id"].to_numpy() == pdf["event_id"].to_numpy()).all()
    # decoded doubles must be BIT-identical (NaN payloads, -0.0)
    a = out["value"].to_numpy(np.float64).view(np.uint64)
    b = pdf["value"].to_numpy(np.float64).view(np.uint64)
    assert (a == b).all()
    # independent runtime encode must be the same length the codec
    # reported (the wire layouts agree, not just the values)
    cls = _event_classes()
    for i in range(len(pdf)):
        m = cls["Event"](
            event_id=int(pdf["event_id"].iloc[i]),
            user_id=int(pdf["user_id"].iloc[i]),
            ts_us=int(pdf["ts_us"].iloc[i]),
            payload=cls["Payload"](
                event_type=str(pdf["event_type"].iloc[i]),
                value=float(pdf["value"].iloc[i]),
            ),
        )
        assert len(m.SerializeToString()) == int(out["pb_bytes"].iloc[i])
        v = float(pdf["value"].iloc[i])
        if not math.isnan(v):
            assert struct.pack("<d", v) == struct.pack(
                "<d", float(out["value"].iloc[i])
            )

"""Vendored protobuf shim (rc_rag_spark/vendor/pbshim): wire-format
unit tests, Spark-free. The end-to-end validation is
tests/test_streaming.py::test_stateful_user_totals_transform_with_state
— the JVM state server parses every request the shim serializes and
the shim parses every JVM response — but these pin the encoding rules
directly with hand-computed wire bytes."""

from __future__ import annotations

import pytest

from rc_rag_spark.vendor import ensure_protobuf_shim
from rc_rag_spark.vendor.pbshim.google.protobuf import _shim_runtime as rt


def _pb2():
    ensure_protobuf_shim()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


# --------------------------------------------------------------------------
# varint codec


@pytest.mark.parametrize(
    "value,wire",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (300, b"\xac\x02"),          # the spec's worked example
        (12345, b"\xb9\x60"),
        ((1 << 64) - 1, b"\xff" * 9 + b"\x01"),
    ],
)
def test_varint_golden(value, wire):
    out = bytearray()
    rt.encode_varint(out, value)
    assert bytes(out) == wire
    decoded, pos = rt.decode_varint(wire, 0)
    assert (decoded, pos) == (value, len(wire))


def test_varint_rejects_negative_and_truncated():
    with pytest.raises(ValueError):
        rt.encode_varint(bytearray(), -1)
    with pytest.raises(ValueError):
        rt.decode_varint(b"\x80", 0)  # continuation bit, no next byte


# --------------------------------------------------------------------------
# message wire bytes (hand-computed against the public encoding spec)


def test_wire_golden_nested_oneof():
    sm = _pb2()
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    req = sm.StatefulProcessorCall(getValueState=cmd)
    # StatefulProcessorCall.getValueState = field 2, LEN -> tag 0x12
    # StateCallCommand.stateName = field 1, LEN -> tag 0x0a
    assert req.SerializeToString() == b"\x12\x03\x0a\x01s"


def test_negative_int64_is_ten_byte_varint():
    sm = _pb2()
    t = sm.RegisterTimer(expiryTimestampMs=-1)
    # field 1 varint tag 0x08; -1 as two's-complement 64-bit
    assert t.SerializeToString() == b"\x08" + b"\xff" * 9 + b"\x01"
    back = sm.RegisterTimer()
    back.ParseFromString(t.SerializeToString())
    assert back.expiryTimestampMs == -1


def test_proto3_default_scalars_not_serialized():
    sm = _pb2()
    # statusCode=0, errorMessage="" are proto3 defaults -> empty wire
    assert sm.StateResponse().SerializeToString() == b""
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""
    assert sm.StateResponse(statusCode=1).SerializeToString() == b"\x08\x01"


def test_empty_message_in_oneof_is_serialized():
    sm = _pb2()
    # RemoveImplicitKey has no fields, but as a set oneof member it
    # MUST appear on the wire (field 2, LEN, length 0)
    req = sm.ImplicitGroupingKeyRequest(
        removeImplicitKey=sm.RemoveImplicitKey()
    )
    assert req.SerializeToString() == b"\x12\x00"


def test_oneof_set_clears_siblings():
    sm = _pb2()
    req = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"\x01")
    )
    req.removeImplicitKey = sm.RemoveImplicitKey()
    assert req.SerializeToString() == b"\x12\x00"
    assert not req.HasField("setImplicitKey")


def test_submessage_vivification_marks_presence_up_the_chain():
    sm = _pb2()
    cmd = sm.StateCallCommand()
    cmd.ttl.durationMs = 5
    call = sm.StatefulProcessorCall()
    call.getListState.stateName = "x"
    wrapped = sm.StateRequest(statefulProcessorCall=call)
    data = wrapped.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.statefulProcessorCall.getListState.stateName == "x"
    # reading an unset submessage does NOT serialize it
    probe = sm.StateCallCommand()
    _ = probe.ttl.durationMs  # read-only access
    assert probe.SerializeToString() == b""


def test_repeated_fields_roundtrip_and_unknown_fields_skipped():
    sm = _pb2()
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k", timestampMs=7),
            sm.TimerInfo(timestampMs=-9),
        ],
        requireNextFetch=True,
    )
    data = resp.SerializeToString()
    # splice an unknown field (number 15, varint) into the stream —
    # spec requires parsers to skip it
    data = b"\x78\x2a" + data
    back = sm.StateResponseWithTimer()
    back.ParseFromString(data)
    assert [(t.key, t.timestampMs) for t in back.timer] == [
        (b"k", 7),
        (b"", -9),
    ]
    assert back.requireNextFetch is True


def test_enum_values_and_wrapper():
    sm = _pb2()
    assert (sm.PRE_INIT, sm.CREATED, sm.CLOSED) == (0, 1, 5)
    assert sm.HandleState.Name(2) == "INITIALIZED"
    assert sm.HandleState.Value("DATA_PROCESSED") == 3
    msg = sm.SetHandleState(state=sm.TIMER_PROCESSED)
    back = sm.SetHandleState()
    back.ParseFromString(msg.SerializeToString())
    assert back.state == sm.TIMER_PROCESSED


def test_string_utf8_roundtrip():
    sm = _pb2()
    msg = sm.ParseStringSchema(schema="héllo 你好 🚀")
    back = sm.ParseStringSchema()
    back.ParseFromString(msg.SerializeToString())
    assert back.schema == "héllo 你好 🚀"


def test_shim_never_shadows_real_protobuf(monkeypatch):
    """When find_spec reports a real google.protobuf, ensure() must
    refuse to activate the shim."""
    import importlib.util

    import rc_rag_spark.vendor as v

    real_spec = importlib.util.spec_from_loader("google.protobuf", None)
    real_spec.origin = "/site-packages/google/protobuf/__init__.py"
    monkeypatch.setattr(
        importlib.util, "find_spec", lambda name: real_spec
    )
    assert v.ensure_protobuf_shim() is False
    assert v.pythonpath_with_shim() is None

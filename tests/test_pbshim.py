"""Unit tests for the hand-rolled protobuf wire-format shim that backs
``stream_tws_type_stats`` on protobuf-less containers.

The end-to-end proof (the shim's bytes accepted by Spark's JVM state
server, state round-tripped, result hash-equal to the batch oracle) lives
in tests/test_streaming.py::test_tws_matches_batch_oracle. These tests pin
the codec itself: varint edges, two's-complement negatives, descriptor
parsing of Spark's own serialized FileDescriptorProto, nested/oneof
construction exactly as pyspark's state clients do it, unknown-field
skipping (forward compatibility), and detection semantics.
"""

from __future__ import annotations

import sys

import pytest

from oe_batch_processing_spark.streaming import pbshim


@pytest.fixture(scope="module")
def mod():
    return pbshim.build_module()


def test_varint_roundtrip_edges():
    for v in (0, 1, 127, 128, 300, 2**31 - 1, 2**32, 2**63 - 1, 2**64 - 1):
        enc = pbshim.write_varint(v)
        dec, pos = pbshim.read_varint(enc, 0)
        assert dec == v and pos == len(enc)
    # canonical single-byte and two-byte forms
    assert pbshim.write_varint(1) == b"\x01"
    assert pbshim.write_varint(300) == b"\xac\x02"  # protobuf docs example


def test_negative_int64_is_ten_byte_twos_complement(mod):
    m = mod.StateResponseWithLongTypeVal(statusCode=0, value=-1)
    wire = m.SerializeToString()
    back = mod.StateResponseWithLongTypeVal()
    back.ParseFromString(wire)
    assert back.value == -1
    # field 3, wire 0, then 10 bytes of 0xFF..0x01 (two's complement)
    assert wire == b"\x18" + b"\xff" * 9 + b"\x01"


def test_descriptor_parse_finds_spark_state_messages():
    package, msgs, _enums, tops = pbshim.parse_file_descriptor(
        pbshim._load_descriptor_blob()
    )
    assert package == "org.apache.spark.sql.execution.streaming.state"
    names = {m["name"] for m in msgs.values()}
    # the message surface pyspark's state clients construct/parse
    for required in (
        "StateRequest", "StateResponse", "StatefulProcessorCall",
        "StateVariableRequest", "ValueStateCall", "ValueStateUpdate",
        "ImplicitGroupingKeyRequest", "SetImplicitKey", "SetHandleState",
        "StateCallCommand", "StateResponseWithLongTypeVal",
        "StateResponseWithListGet", "ListStateCall", "MapStateCall",
        "TimerRequest", "UtilsRequest",
    ):
        assert required in names, required
    assert tops["HandleState"]["PRE_INIT"] == 0
    assert tops["HandleState"]["CREATED"] == 1


def test_set_handle_state_wire_shape(mod):
    """The exact message set_handle_state builds: StateRequest{
    statefulProcessorCall{setHandleState{state: CREATED}}} — nested
    length-delimited fields with the generated module's field numbers
    (statefulProcessorCall=2, setHandleState=1, state=1)."""
    msg = mod.StateRequest(
        statefulProcessorCall=mod.StatefulProcessorCall(
            setHandleState=mod.SetHandleState(state=mod.CREATED)
        )
    )
    assert msg.SerializeToString() == bytes.fromhex("12040a020801")


def test_proto3_zero_enum_submessage_still_emits_oneof_tag(mod):
    """SetHandleState(state=PRE_INIT) serializes state=0 to nothing
    (proto3 default), but the containing oneof field must still appear on
    the wire as a zero-length submessage — the JVM dispatches on it."""
    msg = mod.StatefulProcessorCall(setHandleState=mod.SetHandleState(state=mod.PRE_INIT))
    wire = msg.SerializeToString()
    assert wire == b"\x0a\x00"
    back = mod.StatefulProcessorCall()
    back.ParseFromString(wire)
    assert back.HasField("setHandleState")


def test_nested_attribute_vivification_like_ttl(mod):
    """get_value_state does `cmd.ttl.durationMs = n` — reading the unset
    message field must vivify and attach it."""
    cmd = mod.StateCallCommand()
    cmd.stateName = "stats"
    cmd.schema = '{"type":"struct"}'
    cmd.ttl.durationMs = 2500
    wire = cmd.SerializeToString()
    back = mod.StateCallCommand()
    back.ParseFromString(wire)
    assert back.stateName == "stats"
    assert back.ttl.durationMs == 2500


def test_scalar_defaults_do_not_serialize_until_set(mod):
    r = mod.StateResponse()
    assert r.statusCode == 0 and r.errorMessage == "" and r.value == b""
    assert r.SerializeToString() == b""
    r.ParseFromString(b"")
    assert r.statusCode == 0


def test_unknown_fields_are_skipped(mod):
    """Forward compat: a response carrying an unknown field (here number
    15, each wire type) must parse, keeping the known fields."""
    known = mod.StateResponse(statusCode=7).SerializeToString()
    unknown_varint = b"\x78\x2a"                  # field 15, wire 0
    unknown_len = b"\x7a\x03abc"                  # field 15, wire 2
    unknown_f64 = b"\x79" + b"\x00" * 8           # field 15, wire 1
    unknown_f32 = b"\x7d" + b"\x00" * 4           # field 15, wire 5
    back = mod.StateResponse()
    back.ParseFromString(unknown_varint + known + unknown_len + unknown_f64 + unknown_f32)
    assert back.statusCode == 7


def test_repeated_bytes_field_roundtrip(mod):
    m = mod.StateResponseWithListGet(statusCode=0, requireNextFetch=True)
    m.value.append(b"\x01")
    m.value.append(b"\x02\x03")
    back = mod.StateResponseWithListGet()
    back.ParseFromString(m.SerializeToString())
    assert list(back.value) == [b"\x01", b"\x02\x03"]
    assert back.requireNextFetch is True


def test_unknown_attribute_raises(mod):
    with pytest.raises(AttributeError):
        mod.StateResponse(nonexistent=1)
    with pytest.raises(AttributeError):
        _ = mod.StateResponse().nonexistent


def test_ensure_installs_only_without_real_protobuf():
    installed = pbshim.ensure_state_message_module()
    if pbshim.has_real_protobuf():
        assert installed is False
    else:
        assert installed is True
        assert pbshim.GENERATED_MODULE in sys.modules
        # the lazy import pyspark's clients perform must resolve to the shim
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        assert sm is sys.modules[pbshim.GENERATED_MODULE]
        assert hasattr(sm, "StateRequest") and hasattr(sm, "CREATED")

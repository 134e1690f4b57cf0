"""Unit pins for the vendored clean-room protobuf runtime
(mapreduce_go_spark/vendor/google/) — wire-format bytes from the
PUBLIC encoding spec, descriptor-pool bootstrap over pyspark's real
generated StateMessage module, and the proto3 semantics the state
clients rely on. The live cross-implementation check is the
end-to-end transformWithState test (tests/test_streaming.py): every
micro-batch has the JVM's protobuf parse our bytes and vice versa."""

import pytest

from mapreduce_go_spark.vendor import ensure_protobuf

if not ensure_protobuf():
    pytest.skip("no protobuf importable at all", allow_module_level=True)

from google.protobuf.internal import wire  # noqa: E402


def test_varint_spec_examples():
    # protobuf.dev encoding doc: 150 -> 0x96 0x01; tag(1, VARINT) -> 0x08
    assert wire.encode_varint(150) == b"\x96\x01"
    assert wire.encode_tag(1, wire.WIRETYPE_VARINT) == b"\x08"
    assert wire.decode_varint(b"\x96\x01", 0) == (150, 2)
    # negative int64: 64-bit two's complement, always 10 bytes
    enc = wire.encode_signed(-2)
    assert len(enc) == 10 and enc == b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    v, _ = wire.decode_varint(enc, 0)
    assert wire.to_signed(v) == -2


def test_varint_guards():
    with pytest.raises(ValueError):
        wire.decode_varint(b"\x80", 0)          # truncated
    with pytest.raises(ValueError):
        wire.decode_varint(b"\xff" * 11, 0)      # > 10 bytes
    with pytest.raises(ValueError):
        wire.encode_varint(-1)


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
    return sm


def test_generated_module_loads_and_enums_resolve():
    sm = _sm()
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Name(2) == "INITIALIZED"
    d = sm.StateRequest.DESCRIPTOR
    assert d.fields_by_name["version"].number == 1


def test_request_roundtrip_and_oneof():
    sm = _sm()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            getMapState=sm.StateCallCommand(
                stateName="per_type",
                schema="event_type string",
                mapStateValueSchema="n bigint, m bigint")))
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    call = back.statefulProcessorCall
    assert back.WhichOneof("method") == "statefulProcessorCall"
    assert call.WhichOneof("method") == "getMapState"
    assert call.getMapState.stateName == "per_type"
    assert call.getMapState.mapStateValueSchema == "n bigint, m bigint"
    # unset oneof sibling reads as a default instance, not None
    assert call.getValueState.stateName == ""


def test_response_defaults_and_repeated_nested():
    sm = _sm()
    resp = sm.StateResponseWithMapIterator(
        kvPair=[sm.KeyAndValuePair(key=b"k", value=b"v"),
                sm.KeyAndValuePair(key=b"k2")],
        requireNextFetch=True)
    r2 = sm.StateResponseWithMapIterator()
    r2.ParseFromString(resp.SerializeToString())
    # proto3 defaults: unset statusCode/errorMessage read 0 / ""
    assert r2.statusCode == 0 and r2.errorMessage == ""
    assert [(kv.key, kv.value) for kv in r2.kvPair] == [
        (b"k", b"v"), (b"k2", b"")]
    assert r2.requireNextFetch is True


def test_unknown_fields_skipped_not_fatal():
    sm = _sm()
    # a valid message followed by an unknown high-numbered field of
    # each wire type must parse (forward compatibility)
    base = sm.StateResponse(statusCode=7).SerializeToString()
    extra = (wire.encode_tag(999, wire.WIRETYPE_VARINT)
             + wire.encode_varint(5)
             + wire.encode_len_field(998, b"zzz")
             + wire.encode_tag(997, wire.WIRETYPE_I64) + b"\x00" * 8
             + wire.encode_tag(996, wire.WIRETYPE_I32) + b"\x00" * 4)
    msg = sm.StateResponse()
    msg.ParseFromString(base + extra)
    assert msg.statusCode == 7


def test_reading_submessage_does_not_mark_presence():
    sm = _sm()
    cmd = sm.StateCallCommand(stateName="x")
    _ = cmd.ttl            # read of unset message field
    assert not cmd.HasField("ttl")
    data = cmd.SerializeToString()
    back = sm.StateCallCommand()
    back.ParseFromString(data)
    assert not back.HasField("ttl")
    assert back.ttl.durationMs == 0


def test_repeated_bytes_field_append_path():
    sm = _sm()
    put = sm.ListStatePut()
    put.value.append(b"a")
    put.value.extend([b"b", b"c"])
    back = sm.ListStatePut()
    back.ParseFromString(put.SerializeToString())
    assert list(back.value) == [b"a", b"b", b"c"]


def test_real_install_wins_over_vendor(monkeypatch):
    """ensure_protobuf never shadows a genuine installation: the
    vendor dir is APPENDED to sys.path, so any real google.protobuf
    earlier on the path resolves first."""
    import sys

    from mapreduce_go_spark import vendor

    idx = (sys.path.index(vendor._VENDOR_DIR)
           if vendor._VENDOR_DIR in sys.path else None)
    assert idx is None or idx == len(sys.path) - 1 or all(
        not p.endswith("site-packages") for p in sys.path[idx + 1:])

"""Hand-rolled protobuf wire-format shim for Spark's transformWithState
Python state client.

Spark 4's ``transformWithStateInPandas`` Python worker speaks protobuf to
the JVM state server through the *generated* module
``pyspark.sql.streaming.proto.StateMessage_pb2``, which needs the full
``google.protobuf`` runtime (descriptor pool, builder). This container has
no protobuf wheel, so the stream died at the first state call — the
operator had to register conditionally (round-8 VERDICT item: "hand-roll
the varint wire walk or delist it").

This module removes the dependency from first principles, all public
knowledge:

* The protobuf *wire format* (varints, tag = field_number<<3 | wire_type,
  length-delimited submessages) is an open spec — the same walk this repo
  already hand-wrote for the parquet footer's Thrift compact protocol
  (``operators/ingest_meta.py``).
* The message *shapes* (names, field numbers, types) are not hard-coded:
  they are parsed out of the serialized ``FileDescriptorProto`` blob that
  Apache Spark ships INSIDE ``StateMessage_pb2.py`` itself (the
  ``AddSerializedFile(b"...")`` argument — FileDescriptorProto is itself a
  protobuf message, so the same varint walk reads it). Reading the blob via
  ``ast`` never executes the module, so the missing runtime is never
  touched. Any pyspark upgrade regenerates the blob and this shim follows
  automatically.
* ``ensure_state_message_module()`` builds lightweight dynamic message
  classes (kwargs constructor, attribute access with proto3 defaults,
  ``SerializeToString`` / ``ParseFromString``) and installs the module
  under the generated module's fully-qualified name in ``sys.modules``.
  Every import inside pyspark's state clients is lazy
  (``import ...StateMessage_pb2 as stateMessage`` inside each method), so
  pre-seeding ``sys.modules`` intercepts all of them — driver and
  executors alike, because this module is imported (and the shim
  installed) when ``streaming.stateful`` is unpickled in the worker.
  When a real ``google.protobuf`` exists the shim steps aside entirely.

Only the subset of protobuf the StateMessage schema uses is implemented:
varint scalars (int32/64, uint32/64, bool, enum), length-delimited
(string, bytes, message, repeated message), fixed32/64 floats for
completeness, and unknown-field skipping. No maps, groups, packed
repeated scalars, or extensions — StateMessage.proto has none.
"""

from __future__ import annotations

import ast
import importlib.util
import struct
import sys
import types
from typing import Any

GENERATED_MODULE = "pyspark.sql.streaming.proto.StateMessage_pb2"

# FieldDescriptorProto.Type values (descriptor.proto, public)
_T_DOUBLE, _T_FLOAT = 1, 2
_T_INT64, _T_UINT64, _T_INT32 = 3, 4, 5
_T_FIXED64, _T_FIXED32, _T_BOOL = 6, 7, 8
_T_STRING, _T_GROUP, _T_MESSAGE, _T_BYTES = 9, 10, 11, 12
_T_UINT32, _T_ENUM = 13, 14
_T_SFIXED32, _T_SFIXED64, _T_SINT32, _T_SINT64 = 15, 16, 17, 18
_LABEL_REPEATED = 3
_VARINT_TYPES = {_T_INT64, _T_UINT64, _T_INT32, _T_BOOL, _T_UINT32, _T_ENUM,
                 _T_SINT32, _T_SINT64}
_LEN_TYPES = {_T_STRING, _T_BYTES, _T_MESSAGE}


# --- the varint wire walk -----------------------------------------------------

def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one base-128 varint at ``pos``; return (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def write_varint(value: int) -> bytes:
    """Encode a non-negative (already two's-complemented) varint."""
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = read_varint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        n, pos = read_varint(buf, pos)
        pos += n
    elif wire == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return pos


# --- minimal FileDescriptorProto walk ----------------------------------------
# Field numbers from descriptor.proto (public):
#   FileDescriptorProto: package=2, message_type=4, enum_type=5
#   DescriptorProto: name=1, field=2, nested_type=3, enum_type=4
#   FieldDescriptorProto: name=1, number=3, label=4, type=5, type_name=6
#   EnumDescriptorProto: name=1, value=2
#   EnumValueDescriptorProto: name=1, number=2


def _walk(buf: bytes):
    """Yield (field_number, wire_type, value) where value is the varint for
    wire 0 and the raw bytes for wire 2."""
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = read_varint(buf, pos)
            yield num, wire, v
        elif wire == 2:
            n, pos = read_varint(buf, pos)
            yield num, wire, buf[pos:pos + n]
            pos += n
        else:
            start = pos
            pos = _skip_field(buf, pos, wire)
            yield num, wire, buf[start:pos]


def _parse_enum(buf: bytes) -> tuple[str, dict[str, int]]:
    name, values = "", {}
    for num, _, v in _walk(buf):
        if num == 1:
            name = v.decode()
        elif num == 2:
            vname, vnum = "", 0
            for n2, _, v2 in _walk(v):
                if n2 == 1:
                    vname = v2.decode()
                elif n2 == 2:
                    vnum = v2
            values[vname] = vnum
    return name, values


def _parse_field(buf: bytes) -> dict[str, Any]:
    f = {"name": "", "number": 0, "label": 1, "type": 0, "type_name": "",
         "in_oneof": False}
    for num, _, v in _walk(buf):
        if num == 1:
            f["name"] = v.decode()
        elif num == 3:
            f["number"] = v
        elif num == 4:
            f["label"] = v
        elif num == 5:
            f["type"] = v
        elif num == 6:
            f["type_name"] = v.decode()
        elif num == 9:  # oneof_index: oneof members keep explicit presence
            f["in_oneof"] = True
    return f


def _parse_message(buf: bytes, prefix: str, out_msgs: dict, out_enums: dict):
    name, fields, nested, enums = "", [], [], []
    for num, _, v in _walk(buf):
        if num == 1:
            name = v.decode()
        elif num == 2:
            fields.append(_parse_field(v))
        elif num == 3:
            nested.append(v)
        elif num == 4:
            enums.append(v)
    fq = f"{prefix}.{name}" if prefix else name
    out_msgs[fq] = {"name": name, "fields": fields, "nested": [], "enums": []}
    for nb in nested:
        out_msgs[fq]["nested"].append(_parse_message(nb, fq, out_msgs, out_enums))
    for eb in enums:
        ename, evalues = _parse_enum(eb)
        out_enums[f"{fq}.{ename}"] = evalues
        out_msgs[fq]["enums"].append((ename, evalues))
    return fq


def parse_file_descriptor(blob: bytes):
    """Parse the pieces of a serialized FileDescriptorProto we need."""
    package, msgs, enums, top_enums = "", {}, {}, {}
    for num, _, v in _walk(blob):
        if num == 2:
            package = v.decode()
    for num, _, v in _walk(blob):
        if num == 4:
            _parse_message(v, package, msgs, enums)
        elif num == 5:
            ename, evalues = _parse_enum(v)
            enums[f"{package}.{ename}" if package else ename] = evalues
            top_enums[ename] = evalues
    return package, msgs, enums, top_enums


# --- dynamic message runtime --------------------------------------------------

_DEFAULTS = {
    _T_DOUBLE: 0.0, _T_FLOAT: 0.0, _T_BOOL: False,
    _T_STRING: "", _T_BYTES: b"",
}


class Message:
    """Tiny stand-in for a generated protobuf message: presence-tracked
    attribute store + wire codec. Reading an absent submessage/repeated
    field vivifies it (matching how the state clients build nested
    requests like ``cmd.ttl.durationMs = ...``); scalars return proto3
    defaults without vivifying."""

    _fields: dict[str, dict[str, Any]] = {}
    _by_number: dict[int, dict[str, Any]] = {}
    _registry: dict[str, type] = {}

    def __init__(self, **kwargs: Any) -> None:
        object.__setattr__(self, "_values", {})
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __setattr__(self, name: str, value: Any) -> None:
        if name not in self._fields:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        self._values[name] = value

    def __getattr__(self, name: str):
        fields = type(self)._fields
        if name not in fields:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        f = fields[name]
        values = self._values
        if name in values:
            return values[name]
        if f["label"] == _LABEL_REPEATED:
            return values.setdefault(name, [])
        if f["type"] == _T_MESSAGE:
            sub = self._registry[f["type_name"]]()
            values[name] = sub
            return sub
        return _DEFAULTS.get(f["type"], 0)

    # -- encode --
    def SerializeToString(self) -> bytes:
        out = bytearray()
        for name in sorted(self._values, key=lambda n: self._fields[n]["number"]):
            f = self._fields[name]
            v = self._values[name]
            if f["label"] == _LABEL_REPEATED:
                items = v
            elif (
                f["type"] != _T_MESSAGE
                and not f["in_oneof"]
                and v == _DEFAULTS.get(f["type"], 0)
            ):
                # proto3 canonical form: singular non-oneof scalars at their
                # default value stay off the wire (parsers default them back)
                continue
            else:
                items = [v]
            for item in items:
                out += self._encode_one(f, item)
        return bytes(out)

    @staticmethod
    def _encode_one(f: dict[str, Any], v: Any) -> bytes:
        num, typ = f["number"], f["type"]
        if typ in _VARINT_TYPES:
            if typ == _T_SINT32:
                v = (v << 1) ^ (v >> 31)
            elif typ == _T_SINT64:
                v = (v << 1) ^ (v >> 63)
            iv = int(v) & 0xFFFFFFFFFFFFFFFF  # two's complement negatives
            return write_varint(num << 3) + write_varint(iv)
        if typ == _T_MESSAGE:
            body = v.SerializeToString()
        elif typ == _T_STRING:
            body = v.encode("utf-8")
        elif typ == _T_BYTES:
            body = bytes(v)
        elif typ in (_T_DOUBLE, _T_FIXED64, _T_SFIXED64):
            fmt = "<d" if typ == _T_DOUBLE else "<q"
            return write_varint(num << 3 | 1) + struct.pack(fmt, v)
        elif typ in (_T_FLOAT, _T_FIXED32, _T_SFIXED32):
            fmt = "<f" if typ == _T_FLOAT else "<i"
            return write_varint(num << 3 | 5) + struct.pack(fmt, v)
        else:
            raise NotImplementedError(f"field type {typ}")
        return write_varint(num << 3 | 2) + write_varint(len(body)) + body

    # -- decode --
    def ParseFromString(self, data: bytes) -> int:
        self._values.clear()
        by_number = type(self)._by_number
        pos = 0
        while pos < len(data):
            tag, pos = read_varint(data, pos)
            num, wire = tag >> 3, tag & 7
            f = by_number.get(num)
            if f is None:
                pos = _skip_field(data, pos, wire)
                continue
            typ = f["type"]
            if wire == 0:
                raw, pos = read_varint(data, pos)
                if typ == _T_SINT32 or typ == _T_SINT64:
                    v: Any = (raw >> 1) ^ -(raw & 1)
                elif typ == _T_BOOL:
                    v = bool(raw)
                elif typ in (_T_INT32, _T_INT64):
                    v = raw - (1 << 64) if raw >= (1 << 63) else raw
                else:
                    v = raw
            elif wire == 2:
                n, pos = read_varint(data, pos)
                chunk = data[pos:pos + n]
                pos += n
                if typ == _T_MESSAGE:
                    v = self._registry[f["type_name"]]()
                    v.ParseFromString(chunk)
                elif typ == _T_STRING:
                    v = chunk.decode("utf-8")
                else:
                    v = chunk
            elif wire == 1:
                v = struct.unpack_from("<d" if typ == _T_DOUBLE else "<q", data, pos)[0]
                pos += 8
            elif wire == 5:
                v = struct.unpack_from("<f" if typ == _T_FLOAT else "<i", data, pos)[0]
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wire}")
            if f["label"] == _LABEL_REPEATED:
                self._values.setdefault(f["name"], []).append(v)
            else:
                self._values[f["name"]] = v
        return len(data)

    def HasField(self, name: str) -> bool:
        return name in self._values

    def CopyFrom(self, other: "Message") -> None:
        self._values.clear()
        self._values.update(other._values)


def _load_descriptor_blob() -> bytes:
    """Read the serialized FileDescriptorProto out of Spark's generated
    module WITHOUT importing it (import would pull google.protobuf)."""
    # Resolve the generated file from the parent package's search path, NOT
    # importlib.util.find_spec(GENERATED_MODULE): once the shim is installed
    # in sys.modules, find_spec would return (or choke on) the shim itself.
    import importlib
    import importlib.machinery

    parent = importlib.import_module(GENERATED_MODULE.rpartition(".")[0])
    spec = importlib.machinery.PathFinder.find_spec(
        GENERATED_MODULE, list(parent.__path__)
    )
    if spec is None or spec.loader is None:
        raise ImportError(f"{GENERATED_MODULE} not found in this pyspark")
    # get_source works for plain files AND zipimport (Spark's daemon workers
    # resolve pyspark from /opt/spark/python/lib/pyspark.zip, where a plain
    # open(spec.origin) fails).
    src = spec.loader.get_source(GENERATED_MODULE)  # type: ignore[union-attr]
    if src is None:
        raise ImportError(f"no source available for {GENERATED_MODULE}")
    tree = ast.parse(src)
    blobs = [
        n.value for n in ast.walk(tree)
        if isinstance(n, ast.Constant) and isinstance(n.value, bytes)
    ]
    if len(blobs) != 1:
        raise ImportError(
            f"expected exactly one bytes literal (the serialized descriptor) "
            f"in {spec.origin}, found {len(blobs)}"
        )
    return blobs[0]


def build_module() -> types.ModuleType:
    """Build a module exposing the StateMessage message classes + top-level
    enum value constants, API-compatible with the generated pb2 module for
    everything pyspark's state clients do."""
    package, msgs, enums, top_enums = parse_file_descriptor(_load_descriptor_blob())
    import importlib.machinery

    mod = types.ModuleType(GENERATED_MODULE)
    # a real ModuleSpec so importlib.util.find_spec(GENERATED_MODULE) on a
    # process with the shim installed returns cleanly instead of raising
    # "__spec__ is None"
    mod.__spec__ = importlib.machinery.ModuleSpec(GENERATED_MODULE, loader=None)
    mod.__doc__ = "hand-rolled StateMessage shim (see oe_batch_processing_spark.streaming.pbshim)"
    registry: dict[str, type] = {}
    for fq, spec in msgs.items():
        by_name = {f["name"]: f for f in spec["fields"]}
        cls = type(
            spec["name"],
            (Message,),
            {
                "_fields": by_name,
                "_by_number": {f["number"]: f for f in spec["fields"]},
                "_registry": registry,
                "__module__": GENERATED_MODULE,
            },
        )
        # type_name arrives fully qualified with a leading dot
        for f in spec["fields"]:
            f["type_name"] = f["type_name"].lstrip(".")
        registry[fq] = cls
        # nested enum values as class attributes (generated-code style)
        for _, evalues in spec["enums"]:
            for vname, vnum in evalues.items():
                setattr(cls, vname, vnum)
    # expose top-level messages and nested messages as attributes
    for fq, cls in registry.items():
        rel = fq[len(package) + 1:] if package and fq.startswith(package + ".") else fq
        parts = rel.split(".")
        if len(parts) == 1:
            setattr(mod, parts[0], cls)
        else:
            setattr(registry[f"{package}.{'.'.join(parts[:-1])}"], parts[-1], cls)
    for _, evalues in top_enums.items():
        for vname, vnum in evalues.items():
            setattr(mod, vname, vnum)
    return mod


def has_real_protobuf() -> bool:
    # Probe for the RUNTIME module, not the package: a bare namespace
    # package `google.protobuf` (no wheel, "unknown location") satisfies
    # find_spec("google.protobuf") but still can't serve the generated
    # code's `from google.protobuf import descriptor` — exactly the crash
    # the TWS driver worker hit when this checked only the package.
    try:
        return importlib.util.find_spec("google.protobuf.descriptor") is not None
    except (ModuleNotFoundError, ValueError):
        return False


def ensure_state_message_module() -> bool:
    """Install the shim under the generated module's name when (and only
    when) the real protobuf runtime is unavailable. Idempotent; returns
    True when the shim is (already) installed. Called at import time of
    ``streaming.stateful`` so it runs on the driver AND inside every
    Python worker before the first lazy ``import ...StateMessage_pb2``."""
    if has_real_protobuf():
        return False
    if GENERATED_MODULE in sys.modules:
        return True
    sys.modules[GENERATED_MODULE] = build_module()
    return True

"""Avro binary wire codec — the reference's on-the-wire value format.

The reference runs ``value_format='AVRO'`` end-to-end (reference
README.md:186, docker-compose.yml:78 schema-registry): every Kafka record
value is an Avro *binary-encoded* record, with DATE as int days-since-epoch
and TIMESTAMP as long epoch-millis (reference README.md:207, 212 — the
``DATETOSTRING``/``TIMESTAMPTOSTRING`` calls exist precisely because the
wire carries epoch ints).

Spark's own ``from_avro``/``to_avro`` live in the external spark-avro jar,
which is absent here — so this module implements the Avro 1.x binary
encoding (https://avro.apache.org/docs/1.12.0/specification/ — public spec)
in pure Python and runs it as Arrow-batched ``mapInPandas``. This is the
documented "genuinely can't express in built-ins" case for a Python path:
a byte-level codec with no Catalyst equivalent in this container. When the
spark-avro jar IS on the classpath (any real deployment), ``use_jvm_avro``
reports True and callers should prefer ``pyspark.sql.avro.functions`` —
same bytes, JVM speed; the pure-Python path then remains the spec oracle.

Binary encoding implemented (complete for the reference's schema surface):
 - int/long: zigzag + base-128 varint
 - float/double: little-endian IEEE-754
 - boolean: single byte; null: zero bytes
 - string/bytes: varint byte-length prefix + payload
 - union ["null", T]: varint branch index, then the branch value
 - record: field values concatenated in schema order
 - logical types: date (int days), timestamp-millis (long epoch ms)

Schemas are plain Avro JSON record schemas (the format Schema Registry
serves), parsed by ``parse_schema``.
"""

from __future__ import annotations

import json
import os
import struct
from collections.abc import Iterator
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

# ---- schema model ----

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

#: Avro logical type -> (base type, semantic tag used by the codec)
_LOGICAL = {
    ("int", "date"): "date",
    ("long", "timestamp-millis"): "timestamp-millis",
    ("long", "timestamp-micros"): "timestamp-micros",
}


@dataclass(frozen=True)
class AvroField:
    name: str
    type: str  # primitive name or logical tag from _LOGICAL
    nullable: bool  # True ⇒ wire type is union ["null", type]


def parse_schema(schema_json: str | dict) -> list[AvroField]:
    """Parse an Avro JSON record schema into the codec's field list.

    Covers the reference's schema surface plus arrays of primitives
    (``array:<item>`` tags — the embedding-transport case): records of
    primitives, nullable unions, date/timestamp logical types,
    ``{"type": "array", "items": <primitive>}``. Anything else raises —
    better a loud error than silently mis-decoded bytes.
    """
    sch = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    if sch.get("type") != "record":
        raise ValueError(f"top-level schema must be a record, got {sch.get('type')}")
    fields: list[AvroField] = []
    for f in sch["fields"]:
        ftype, nullable = f["type"], False
        if isinstance(ftype, list):  # union
            branches = [b for b in ftype if b != "null"]
            if len(branches) != 1 or "null" not in ftype:
                raise ValueError(f"only ['null', T] unions supported: {ftype}")
            # branch indices are positional in the Avro spec and this codec
            # writes 0 for null — a ["T", "null"] union would need branch 1
            # for null, so accepting it here would emit spec-INVALID bytes
            # that only round-trip against ourselves. Loud error instead.
            if ftype[0] != "null":
                raise ValueError(
                    f"null must be the FIRST union branch: {ftype} (the wire "
                    "encoder writes branch index 0 for null)"
                )
            ftype, nullable = branches[0], True
        if isinstance(ftype, dict):
            base, logical = ftype.get("type"), ftype.get("logicalType")
            if base == "array":
                items = ftype.get("items")
                if items not in _PRIMITIVES or items == "null":
                    raise ValueError(f"unsupported array items type: {items}")
                ftype = f"array:{items}"
            else:
                tag = _LOGICAL.get((base, logical))
                if tag is None:
                    raise ValueError(f"unsupported complex/logical type: {ftype}")
                ftype = tag
        elif ftype not in _PRIMITIVES:
            raise ValueError(f"unsupported type: {ftype}")
        fields.append(AvroField(f["name"], ftype, nullable))
    return fields


# ---- primitive codecs (spec §binary encoding) ----


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def encode_long(n: int) -> bytes:
    """Zigzag + base-128 varint (spec: int and long share this encoding)."""
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, new_pos)."""
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(z), pos
        shift += 7


def _encode_string(v: str) -> bytes:
    raw = v.encode("utf-8")
    return encode_long(len(raw)) + raw


_ENCODERS = {
    "null": lambda v: b"",
    "boolean": lambda v: b"\x01" if v else b"\x00",
    "int": encode_long,
    "long": encode_long,
    "date": encode_long,
    "timestamp-millis": encode_long,
    "timestamp-micros": encode_long,
    "float": lambda v: struct.pack("<f", v),
    "double": lambda v: struct.pack("<d", v),
    "string": _encode_string,
    "bytes": lambda v: encode_long(len(v)) + bytes(v),
}


#: Python-side casts so numpy scalars coming out of Arrow batches encode
#: with exact integer/float semantics.
_ITEM_CASTS = {
    "int": int,
    "long": int,
    "float": float,
    "double": float,
    "string": str,
    "boolean": bool,
    "bytes": bytes,
}


def _encode_array(items_type: str, v) -> bytes:
    """Avro array block encoding: varint count + items, 0-count terminator.

    Single-block form (valid per spec; multi-block and negative-count
    block-size forms are accepted on decode)."""
    enc, cast = _ENCODERS[items_type], _ITEM_CASTS[items_type]
    if len(v) == 0:
        return b"\x00"
    return (
        encode_long(len(v)) + b"".join(enc(cast(x)) for x in v) + b"\x00"
    )


def _decode_array(items_type: str, buf: bytes, pos: int) -> tuple[list, int]:
    out: list = []
    while True:
        count, pos = decode_long(buf, pos)
        if count == 0:
            return out, pos
        if count < 0:  # spec: negative count is followed by the block size
            count = -count
            _size, pos = decode_long(buf, pos)
        for _ in range(count):
            item, pos = _decode_value(items_type, buf, pos)
            out.append(item)


def _decode_value(ftype: str, buf: bytes, pos: int) -> tuple[Any, int]:
    if ftype.startswith("array:"):
        return _decode_array(ftype.removeprefix("array:"), buf, pos)
    if ftype == "null":
        return None, pos
    if ftype == "boolean":
        return buf[pos] == 1, pos + 1
    if ftype in ("int", "long", "date", "timestamp-millis", "timestamp-micros"):
        return decode_long(buf, pos)
    if ftype == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if ftype == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype in ("string", "bytes"):
        n, pos = decode_long(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if ftype == "string" else raw), pos + n
    raise ValueError(f"unsupported type: {ftype}")


def encode_record(row: dict[str, Any], fields: list[AvroField]) -> bytes:
    """One datum → Avro binary (no container/framing — the Kafka value
    layout, minus the schema-registry 5-byte header; see ``WIRE_HEADER``)."""
    out = bytearray()
    for f in fields:
        v = row[f.name]
        if f.nullable:
            if v is None:
                out += b"\x00"  # union branch 0 = null
                continue
            out += b"\x02"  # union branch 1 (zigzag varint of 1)
        if f.type.startswith("array:"):
            out += _encode_array(f.type.removeprefix("array:"), v)
        else:
            out += _ENCODERS[f.type](v)
    return bytes(out)


def decode_record(buf: bytes, fields: list[AvroField]) -> dict[str, Any]:
    pos, row = 0, {}
    for f in fields:
        if f.nullable:
            branch, pos = decode_long(buf, pos)
            if branch == 0:
                row[f.name] = None
                continue
        row[f.name], pos = _decode_value(f.type, buf, pos)
    if pos != len(buf):
        raise ValueError(f"trailing bytes: consumed {pos} of {len(buf)}")
    return row


#: Confluent wire framing: magic byte 0 + big-endian int32 schema id, then
#: the Avro binary body (public Confluent serde format). The reference's
#: records carry this header because its producer is the Connect Avro
#: converter pointed at Schema Registry (docker-compose.yml:78).
WIRE_HEADER = struct.Struct(">bI")


def frame_confluent(body: bytes, schema_id: int) -> bytes:
    return WIRE_HEADER.pack(0, schema_id) + body


def unframe_column(value_col: str = "value", mode: str = "FAILFAST"):
    """JVM-side Confluent unframing expression: validates the magic byte
    and strips the 5-byte header. FAILFAST raises on a non-Avro record
    (clear framing error instead of a confusing codec failure downstream);
    PERMISSIVE nulls it, which the permissive decoder then turns into an
    all-null row. Returns a Column."""
    from pyspark.sql import functions as F

    ok = F.expr(f"substring({value_col}, 1, 1) = X'00'")
    body = F.expr(f"substring({value_col}, {WIRE_HEADER.size + 1})")
    if mode.upper() == "PERMISSIVE":
        return F.when(ok, body).otherwise(F.lit(None)).alias(value_col)
    return (
        F.when(ok, body)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("not a Confluent-framed Avro record (magic byte "),
                    F.hex(F.expr(f"substring({value_col}, 1, 1)")),
                    F.lit(" != 00)"),
                )
            )
        )
        .alias(value_col)
    )


def unframe_confluent(payload: bytes) -> tuple[int, bytes]:
    magic, schema_id = WIRE_HEADER.unpack_from(payload, 0)
    if magic != 0:
        raise ValueError(f"bad magic byte {magic}")
    return schema_id, payload[WIRE_HEADER.size :]


# ---- Spark surface: Arrow-batched encode/decode over DataFrames ----

_SPARK_TYPES = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
    "date": "int",  # wire representation: days since epoch
    "timestamp-millis": "long",  # epoch millis
    "timestamp-micros": "long",
}


def _spark_type(tag: str) -> str:
    if tag.startswith("array:"):
        return f"array<{_SPARK_TYPES[tag.removeprefix('array:')]}>"
    return _SPARK_TYPES[tag]


def _wire_schema_ddl(fields: list[AvroField]) -> str:
    return ", ".join(f"{f.name} {_spark_type(f.type)}" for f in fields)


def avro_encode(df: DataFrame, schema_json: str, out_col: str = "value") -> DataFrame:
    """Typed columns → one Avro-binary column (the to_avro analog).

    Expects wire-typed inputs (date as int days, timestamp as epoch long) —
    produce them JVM-side (``unix_millis``/``datediff``) so Python only does
    the byte packing. Arrow-batched; codec state (parsed schema) is built
    once per partition, not per row.
    """
    from kafka_exercise_spark.deploy import ship_package

    ship_package(df.sparkSession)  # codec fns pickle by reference
    fields = parse_schema(schema_json)

    def enc(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        int_like = {
            "int", "long", "date", "timestamp-millis", "timestamp-micros"
        }
        for pdf in batches:
            # Arrow->pandas represents nulls in numeric columns as NaN and
            # widens ints to float64; normalize per field so the codec sees
            # Python ints and real None (for a NULLABLE field NaN means
            # null; a non-nullable double keeps NaN as a value, which Avro
            # encodes fine).
            data: dict[str, list] = {}
            for f in fields:
                s = pdf[f.name]
                if f.nullable:
                    s = s.astype(object).where(s.notna(), None)
                if f.type in int_like:
                    s = s.map(lambda v: v if v is None else int(v))
                data[f.name] = list(s)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    out_col: [
                        encode_record(
                            {f.name: data[f.name][i] for f in fields}, fields
                        )
                        for i in range(n)
                    ]
                }
            )

    return df.mapInPandas(enc, schema=f"{out_col} binary")


def avro_decode(
    df: DataFrame, schema_json: str, value_col: str = "value", mode: str = "FAILFAST"
) -> DataFrame:
    """Avro-binary column → typed wire columns (the from_avro analog).

    ``mode`` mirrors ``from_avro``'s option: FAILFAST (default) raises on
    the first malformed record; PERMISSIVE emits an all-null row for it and
    keeps going — the right setting when draining a long-lived topic where
    a handful of corrupt producer records must not kill the pipeline.
    """
    from kafka_exercise_spark.deploy import ship_package

    ship_package(df.sparkSession)  # codec fns pickle by reference
    fields = parse_schema(schema_json)
    ddl = _wire_schema_ddl(fields)
    permissive = mode.upper() == "PERMISSIVE"
    if not permissive and mode.upper() != "FAILFAST":
        raise ValueError(f"mode must be FAILFAST or PERMISSIVE, got {mode!r}")
    null_row = {f.name: None for f in fields}

    def dec(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            decoded = []
            for b in pdf[value_col]:
                if permissive:
                    # struct.error (truncated float/double) and TypeError
                    # (null value / tombstone) are corrupt-record shapes
                    # too, not just bad varints/lengths
                    try:
                        decoded.append(decode_record(bytes(b), fields))
                    except (
                        ValueError,
                        IndexError,
                        UnicodeDecodeError,
                        TypeError,
                        struct.error,
                    ):
                        decoded.append(null_row)
                else:
                    decoded.append(decode_record(bytes(b), fields))
            yield pd.DataFrame(decoded, columns=[f.name for f in fields])

    return df.mapInPandas(dec, schema=ddl)


# ---- schema compatibility (Schema Registry semantics) ----
#
# The reference's sinks declare ``schema.compatibility: FULL``
# (reference connect_s3_sink_jovens.config:7) — Schema Registry rejects a
# new writer schema unless it is both BACKWARD compatible (new readers read
# old data) and FORWARD compatible (old readers read new data). The rules
# below implement the Avro spec's schema-resolution subset matching this
# codec's type surface: a reader resolves a writer field by name; a reader
# field missing from the writer needs a default; writer fields unknown to
# the reader are skipped; numeric types promote int→long→float→double.

#: writer type -> reader types it may promote to (Avro spec resolution)
_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string"},
    "bytes": {"bytes"},
    "boolean": {"boolean"},
    "null": {"null"},
    "date": {"date"},
    "timestamp-millis": {"timestamp-millis"},
    "timestamp-micros": {"timestamp-micros"},
}


def _fields_with_defaults(schema_json: str | dict) -> dict[str, tuple[AvroField, bool]]:
    sch = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    parsed = {f.name: f for f in parse_schema(sch)}
    has_default = {f["name"]: "default" in f for f in sch["fields"]}
    return {n: (parsed[n], has_default[n]) for n in parsed}


def can_read(writer_schema: str | dict, reader_schema: str | dict) -> list[str]:
    """Avro schema resolution: can ``reader_schema`` decode data written
    with ``writer_schema``? Returns the list of incompatibilities (empty =
    compatible)."""
    writer = _fields_with_defaults(writer_schema)
    reader = _fields_with_defaults(reader_schema)
    problems: list[str] = []
    for name, (rf, r_default) in reader.items():
        if name not in writer:
            # nullable union fields default to null implicitly only when a
            # default is declared; the spec requires an explicit default
            if not r_default:
                problems.append(
                    f"reader field '{name}' absent from writer and has no default"
                )
            continue
        wf = writer[name][0]
        w_t, r_t = wf.type, rf.type
        if w_t.startswith("array:") or r_t.startswith("array:"):
            w_item = w_t.removeprefix("array:")
            r_item = r_t.removeprefix("array:")
            compatible = (
                w_t.startswith("array:")
                and r_t.startswith("array:")
                and r_item in _PROMOTIONS[w_item]
            )
        else:
            compatible = r_t in _PROMOTIONS[w_t]
        if not compatible:
            problems.append(
                f"field '{name}': writer {wf.type} not readable as {rf.type}"
            )
        if wf.nullable and not rf.nullable:
            problems.append(
                f"field '{name}': writer nullable, reader non-nullable"
            )
    return problems


def check_compatibility(
    old_schema: str | dict, new_schema: str | dict, mode: str = "FULL"
) -> list[str]:
    """Schema Registry compatibility gate for a proposed ``new_schema``.

    BACKWARD = new schema (as reader) can read old data; FORWARD = old
    schema (as reader) can read new data; FULL = both — the reference's
    declared level. Returns incompatibilities (empty = accepted).
    """
    mode = mode.upper()
    problems: list[str] = []
    if mode in ("BACKWARD", "FULL"):
        problems += [f"BACKWARD: {p}" for p in can_read(old_schema, new_schema)]
    if mode in ("FORWARD", "FULL"):
        problems += [f"FORWARD: {p}" for p in can_read(new_schema, old_schema)]
    if mode not in ("BACKWARD", "FORWARD", "FULL", "NONE"):
        raise ValueError(f"unknown compatibility mode: {mode}")
    return problems


class IncompatibleSchemaError(ValueError):
    """Raised when a schema registration violates the subject's compat mode."""


class SchemaRegistry:
    """In-process Schema Registry: versioned subjects + compat-gated writes.

    The reference runs Confluent Schema Registry (docker-compose.yml
    schema-registry service) and its sinks declare ``schema.compatibility``
    levels; this is the engine-side same contract: ``register`` refuses a
    new version that violates the subject's mode, ids are global and stable,
    and ``frame_confluent`` embeds them in the wire header so any consumer
    can resolve the writer schema from the bytes alone.
    """

    def __init__(
        self, default_mode: str = "FULL", state_path: str | None = None
    ) -> None:
        self._default_mode = default_mode
        self._state_path = state_path
        self._modes: dict[str, str] = {}
        self._subjects: dict[str, list[int]] = {}
        self._by_id: dict[int, str] = {}
        self._id_by_schema: dict[str, int] = {}  # ids are GLOBAL: same
        # canonical schema -> same id under any subject (Confluent
        # semantics — wire headers stay byte-identical across subjects)
        self._next_id = 1
        if state_path is not None and os.path.exists(state_path):
            self._load()

    def _load(self) -> None:
        with open(self._state_path) as f:
            state = json.load(f)
        self._modes = state["modes"]
        self._subjects = state["subjects"]
        self._by_id = {int(k): v for k, v in state["by_id"].items()}
        self._id_by_schema = {v: k for k, v in self._by_id.items()}
        self._next_id = state["next_id"]

    def _save(self) -> None:
        """Persist registry state — the durability the real Schema Registry
        gets from its ``_schemas`` Kafka topic. Atomic tmp+rename, same
        no-torn-state contract as the CDC high-water mark file."""
        if self._state_path is None:
            return
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "modes": self._modes,
                    "subjects": self._subjects,
                    "by_id": self._by_id,
                    "next_id": self._next_id,
                },
                f,
            )
        os.replace(tmp, self._state_path)

    def set_mode(self, subject: str, mode: str) -> None:
        if mode.upper() not in ("BACKWARD", "FORWARD", "FULL", "NONE"):
            raise ValueError(f"unknown compatibility mode: {mode}")
        self._modes[subject] = mode.upper()
        self._save()

    def register(self, subject: str, schema_json: str | dict) -> int:
        """Register a schema version; returns its global id.

        Re-registering a byte-identical schema returns the existing id
        (Schema Registry semantics). An incompatible evolution raises
        ``IncompatibleSchemaError`` listing every violated rule.
        """
        canonical = json.dumps(
            json.loads(schema_json) if isinstance(schema_json, str) else schema_json,
            sort_keys=True,
        )
        versions = self._subjects.setdefault(subject, [])
        existing = self._id_by_schema.get(canonical)
        if existing is not None and existing in versions:
            return existing
        if versions:
            mode = self._modes.get(subject, self._default_mode)
            latest = self._by_id[versions[-1]]
            problems = check_compatibility(latest, canonical, mode)
            if problems:
                raise IncompatibleSchemaError(
                    f"subject {subject!r} mode {mode}: " + "; ".join(problems)
                )
        if existing is None:
            existing = self._next_id
            self._next_id += 1
            self._by_id[existing] = canonical
            self._id_by_schema[canonical] = existing
        versions.append(existing)
        self._save()
        return existing

    def latest(self, subject: str) -> tuple[int, str]:
        sid = self._subjects[subject][-1]
        return sid, self._by_id[sid]

    def get(self, schema_id: int) -> str:
        """Resolve a writer schema from a wire-header id."""
        return self._by_id[schema_id]


def use_jvm_avro(spark) -> bool:
    """True when the spark-avro jar is loadable — then prefer
    ``pyspark.sql.avro.functions.from_avro/to_avro`` (JVM, codegen) and keep
    this module as the spec oracle. Absent in this container; present on any
    real deployment that processes Avro topics."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:  # noqa: BLE001
        return False

"""Hive <-> Spark <-> Arrow <-> Feast value-type mapping.

Re-expression of the reference's three-way map
(feast_hive/hive_type_map.py:8-24 Hive->Feast, :27-62 Arrow->Hive,
:65-85 Hive->Arrow) on top of Spark SQL types. The reference needed
this because results travel as untyped Thrift columns; in Spark the
DataFrame schema is authoritative, so these maps exist for (a) API
parity (``ValueType`` surface), (b) DDL-string round-trips, and
(c) Arrow interchange checks in tests.

Unlike the reference we also pass through arrays/maps/structs (the
reference supports none — SURVEY §1.2), which the §7 extension
operators need (``embedding: array<float>``).
"""

from __future__ import annotations

import re
from enum import Enum

import pyarrow as pa
from pyspark.sql import types as T


class ValueType(Enum):
    """Feast-compatible value types (mirrors feast.ValueType names).

    Defined locally so the engine has no feast dependency; the names
    match what feast_hive/hive_type_map.py:8-24 returns.
    """

    UNKNOWN = 0
    BYTES = 1
    STRING = 2
    INT32 = 3
    INT64 = 4
    DOUBLE = 5
    FLOAT = 6
    BOOL = 7
    UNIX_TIMESTAMP = 8
    BYTES_LIST = 11
    STRING_LIST = 12
    INT32_LIST = 13
    INT64_LIST = 14
    DOUBLE_LIST = 15
    FLOAT_LIST = 16
    BOOL_LIST = 17


# --- Hive type name -> Spark type (reference: hive_type_map.py:65-85) ---

_HIVE_TO_SPARK: dict[str, T.DataType] = {
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "numeric": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "string": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "null": T.NullType(),
    "void": T.NullType(),
}

_DECIMAL_RE = re.compile(r"^decimal\s*\((\d+)\s*,\s*(\d+)\)$")


def hive_to_spark_type(hive_type: str) -> T.DataType:
    """Hive DDL type name -> Spark DataType.

    Parity with hive_type_map.py:65-85 plus decimal(p,s), which the
    reference only supports on upload (hive_type_map.py:40-41) but we
    support both ways.
    """
    s = hive_type.strip().lower()
    m = _DECIMAL_RE.match(s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    # strip varchar(n)/char(n) lengths
    base = re.sub(r"\(.*\)$", "", s).strip()
    if base in _HIVE_TO_SPARK:
        return _HIVE_TO_SPARK[base]
    raise ValueError(f"Unsupported Hive type: {hive_type!r}")


_SPARK_TO_HIVE: list[tuple[type, str]] = [
    (T.ByteType, "tinyint"),
    (T.ShortType, "smallint"),
    (T.IntegerType, "int"),
    (T.LongType, "bigint"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.TimestampType, "timestamp"),
    (T.TimestampNTZType, "timestamp"),
    (T.DateType, "date"),
    (T.StringType, "string"),
    (T.BooleanType, "boolean"),
    (T.BinaryType, "binary"),
    (T.NullType, "null"),
]


def spark_to_hive_type(dt: T.DataType) -> str:
    """Spark DataType -> Hive DDL name (upload direction,
    reference: pa_to_hive_value_type, hive_type_map.py:27-62)."""
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_to_hive_type(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_to_hive_type(dt.keyType)},{spark_to_hive_type(dt.valueType)}>"
    for cls, name in _SPARK_TO_HIVE:
        if isinstance(dt, cls):
            return name
    raise ValueError(f"Unsupported Spark type: {dt!r}")


# --- Spark type -> Feast ValueType (reference: hive_type_map.py:8-24) ---

_SPARK_TO_VALUE: list[tuple[type, ValueType]] = [
    (T.ByteType, ValueType.INT32),
    (T.ShortType, ValueType.INT32),
    (T.IntegerType, ValueType.INT32),
    (T.LongType, ValueType.INT64),
    (T.FloatType, ValueType.FLOAT),
    (T.DoubleType, ValueType.DOUBLE),
    (T.TimestampType, ValueType.UNIX_TIMESTAMP),
    (T.TimestampNTZType, ValueType.UNIX_TIMESTAMP),
    (T.StringType, ValueType.STRING),
    (T.BooleanType, ValueType.BOOL),
    (T.BinaryType, ValueType.BYTES),
]

_ELEM_TO_LIST: dict[ValueType, ValueType] = {
    ValueType.BYTES: ValueType.BYTES_LIST,
    ValueType.STRING: ValueType.STRING_LIST,
    ValueType.INT32: ValueType.INT32_LIST,
    ValueType.INT64: ValueType.INT64_LIST,
    ValueType.DOUBLE: ValueType.DOUBLE_LIST,
    ValueType.FLOAT: ValueType.FLOAT_LIST,
    ValueType.BOOL: ValueType.BOOL_LIST,
}


def spark_to_value_type(dt: T.DataType) -> ValueType:
    """Spark DataType -> Feast ValueType (hive_type_map.py:8-24
    semantics; lists are our superset extension)."""
    if isinstance(dt, T.ArrayType):
        elem = spark_to_value_type(dt.elementType)
        return _ELEM_TO_LIST.get(elem, ValueType.UNKNOWN)
    for cls, vt in _SPARK_TO_VALUE:
        if isinstance(dt, cls):
            return vt
    return ValueType.UNKNOWN


def hive_to_value_type(hive_type: str) -> ValueType:
    """Hive type name -> Feast ValueType (hive_type_map.py:8-24)."""
    return spark_to_value_type(hive_to_spark_type(hive_type))


# --- Arrow interchange (reference: hive_type_map.py:65-79 + :27-62) ---

def spark_to_arrow_type(dt: T.DataType) -> pa.DataType:
    """Spark -> Arrow, matching the reference's fetch-side map
    (hive_type_map.py:65-79): timestamps at microsecond precision."""
    mapping = [
        (T.ByteType, pa.int8()),
        (T.ShortType, pa.int16()),
        (T.IntegerType, pa.int32()),
        (T.LongType, pa.int64()),
        (T.FloatType, pa.float32()),
        (T.DoubleType, pa.float64()),
        (T.TimestampType, pa.timestamp("us")),
        (T.DateType, pa.date32()),
        (T.StringType, pa.string()),
        (T.BooleanType, pa.bool_()),
        (T.BinaryType, pa.binary()),
        (T.NullType, pa.null()),
    ]
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        return pa.list_(spark_to_arrow_type(dt.elementType))
    for cls, at in mapping:
        if isinstance(dt, cls):
            return at
    raise ValueError(f"Unsupported Spark type for Arrow: {dt!r}")


def arrow_to_spark_type(at: pa.DataType) -> T.DataType:
    """Arrow -> Spark, upload direction. Mirrors pa_to_hive_value_type
    (hive_type_map.py:27-62): unsigned ints map up a width
    (uint8->smallint, uint16->int, uint32->bigint, uint64->decimal(38,0)),
    dictionary (categorical) -> string, tz-aware timestamps drop their
    zone (values are normalized to UTC by the session TZ)."""
    if pa.types.is_dictionary(at):
        return arrow_to_spark_type(at.value_type)
    if pa.types.is_timestamp(at):
        return T.TimestampType()
    if pa.types.is_uint8(at):
        return T.ShortType()
    if pa.types.is_uint16(at):
        return T.IntegerType()
    if pa.types.is_uint32(at):
        return T.LongType()
    if pa.types.is_uint64(at):
        return T.DecimalType(38, 0)
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return T.ArrayType(arrow_to_spark_type(at.value_type))
    if pa.types.is_decimal(at):
        return T.DecimalType(at.precision, at.scale)
    simple = {
        "int8": T.ByteType(),
        "int16": T.ShortType(),
        "int32": T.IntegerType(),
        "int64": T.LongType(),
        "float": T.FloatType(),
        "halffloat": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "large_string": T.StringType(),
        "bool": T.BooleanType(),
        "binary": T.BinaryType(),
        "large_binary": T.BinaryType(),
        "date32[day]": T.DateType(),
        "null": T.NullType(),
    }
    if str(at) in simple:
        return simple[str(at)]
    raise ValueError(f"Unsupported Arrow type: {at!r}")

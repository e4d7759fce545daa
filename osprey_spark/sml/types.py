"""A small static type algebra for SML expressions.

Mirrors the reference's static type surface (primitives, ``list[T]``,
``Optional[T]``, wrapper types that unwrap post-execution — reference:
engine/ast_validator/validators/validate_static_types.py:67-879,
language_types/post_execution_convertible.py) re-designed for a columnar
engine: every SML value is a (nullable) Spark column; Optional-ness is
plain column nullability, and wrapper types carry compile-time metadata.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import types as T


@dataclass(frozen=True)
class SmlType:
    base: str  # str int float bool none any list entity rule timedelta effect
    param: Optional["SmlType"] = None

    def __str__(self) -> str:
        return f"{self.base}[{self.param}]" if self.param else self.base


STR = SmlType("str")
INT = SmlType("int")
FLOAT = SmlType("float")
BOOL = SmlType("bool")
NONE = SmlType("none")
ANY = SmlType("any")
RULE = SmlType("rule")
TIMEDELTA = SmlType("timedelta")
EFFECT = SmlType("effect")


def list_of(t: SmlType) -> SmlType:
    return SmlType("list", t)


def entity_of(t: SmlType) -> SmlType:
    return SmlType("entity", t)


_ANNOTATION_BASES = {
    "str": STR,
    "int": INT,
    "float": FLOAT,
    "bool": BOOL,
    "None": NONE,
}


def from_annotation(base: str, param: Optional[SmlType]) -> SmlType:
    if base in _ANNOTATION_BASES:
        return _ANNOTATION_BASES[base]
    if base in ("List", "list"):
        return list_of(param or ANY)
    if base in ("Optional",):
        # nullability is implicit in columns; keep the inner type
        return param or ANY
    if base in ("Entity", "EntityT"):
        return entity_of(param or STR)
    if base in ("Secret", "ExtractSecret"):
        return param or ANY
    return ANY


def is_numeric(t: SmlType) -> bool:
    return t.base in ("int", "float")


def unify_numeric(a: SmlType, b: SmlType) -> SmlType:
    return FLOAT if "float" in (a.base, b.base) else INT


def spark_type(t: SmlType) -> T.DataType:
    if t.base == "str":
        return T.StringType()
    if t.base == "int":
        return T.LongType()
    if t.base == "float":
        return T.DoubleType()
    if t.base == "bool":
        return T.BooleanType()
    if t.base == "rule":
        return T.BooleanType()
    if t.base == "timedelta":
        return T.DoubleType()
    if t.base == "list":
        return T.ArrayType(spark_type(t.param or ANY))
    if t.base == "entity":
        return spark_type(t.param or STR)
    return T.StringType()


def from_spark_type(dt: T.DataType) -> SmlType:
    if isinstance(dt, T.StringType):
        return STR
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return INT
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return FLOAT
    if isinstance(dt, T.BooleanType):
        return BOOL
    if isinstance(dt, T.ArrayType):
        return list_of(from_spark_type(dt.elementType))
    if isinstance(dt, T.TimestampType):
        return FLOAT  # event-time treated as epoch seconds in SML arithmetic
    return ANY

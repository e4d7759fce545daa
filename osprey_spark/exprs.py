"""None-calculus expression helpers.

The reference engine evaluates rules per-event in Python; its null
semantics (the contract every verdict row depends on) are:

- ``==`` / ``!=`` are Python equality: ``None == None`` is True
  (reference: engine/executor/node_executor/binary_comparison_executor.py:86-96,
  tests executor/tests/test_binary_comparison.py:5-33).
- ``< <= > >=`` with either side None return **False**
  (binary_comparison_executor.py:44-66).
- ``in`` / ``not in``: ``None in None`` / ``None in [..., None]`` → True;
  one-sided None → False; ``str in str`` is substring; anything in list is
  membership (binary_comparison_executor.py:69-96).
- ``and`` / ``or`` are n-ary ``all`` / ``any`` with failed/None operands
  treated as falsey (boolean_operation_executor.py:23-32).
- ``/ // %`` return **0** when the divisor is 0
  (binary_operation_executor.py:49-64); ``/`` is always float.
- Arithmetic on a failed (None) operand poisons the result → we let
  Spark's native null propagation express that.

All helpers return pure ``Column`` expressions — whole-stage-codegen
friendly, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit(v) -> Column:
    return F.lit(v)


# --- comparisons -----------------------------------------------------------

def eq(left: Column, right: Column) -> Column:
    """Python ``==``: null-safe (None == None → True). Never returns null."""
    return left.eqNullSafe(right)


def ne(left: Column, right: Column) -> Column:
    return ~left.eqNullSafe(right)


def _null_guarded(cond: Column, *operands: Column) -> Column:
    guard = None
    for op in operands:
        n = op.isNull()
        guard = n if guard is None else (guard | n)
    return F.when(guard, F.lit(False)).otherwise(cond)


def lt(left: Column, right: Column) -> Column:
    """``<`` — False (not null) when either side is null."""
    return _null_guarded(left < right, left, right)


def le(left: Column, right: Column) -> Column:
    return _null_guarded(left <= right, left, right)


def gt(left: Column, right: Column) -> Column:
    return _null_guarded(left > right, left, right)


def ge(left: Column, right: Column) -> Column:
    return _null_guarded(left >= right, left, right)


def in_op(needle: Column, haystack: Column, haystack_is_list: bool) -> Column:
    """Python ``a in b`` with the reference's None guards.

    list case: None in [..., None] → True, else None on either side → False,
    else membership (null-safe element equality).
    str case: None on either side → False (None in None → True), else substring.
    """
    if haystack_is_list:
        contains_null = F.exists(haystack, lambda x: x.isNull())
        member = F.exists(haystack, lambda x: x.eqNullSafe(needle))
        return (
            F.when(needle.isNull() & haystack.isNull(), F.lit(True))
            .when(needle.isNull() & contains_null, F.lit(True))
            .when(needle.isNull() | haystack.isNull(), F.lit(False))
            .otherwise(member)
        )
    return (
        F.when(needle.isNull() & haystack.isNull(), F.lit(True))
        .when(needle.isNull() | haystack.isNull(), F.lit(False))
        .otherwise(haystack.contains(needle))
    )


def not_in_op(needle: Column, haystack: Column, haystack_is_list: bool) -> Column:
    return ~in_op(needle, haystack, haystack_is_list)


# --- boolean ops -----------------------------------------------------------

def truthy(col: Column) -> Column:
    """Operand of and/or: failed/None → False (boolean_operation_executor.py:26)."""
    return F.coalesce(col.cast("boolean"), F.lit(False))


def and_(*cols: Column) -> Column:
    out = truthy(cols[0])
    for c in cols[1:]:
        out = out & truthy(c)
    return out


def or_(*cols: Column) -> Column:
    out = truthy(cols[0])
    for c in cols[1:]:
        out = out | truthy(c)
    return out


def not_(col: Column) -> Column:
    """``not x``: a resolved-None operand → True (Python ``not None``,
    reference unary executor on a value None).

    Collapsed-failure contract: a *failed* operand is also null here, so
    ``not <failed>`` renders True where the reference would poison —
    consistent with how ``and``/``or`` already collapse failed operands
    to falsey (boolean_operation_executor.py:23-32), and mirrored by the
    row oracle (oracle.py UnaryOp)."""
    return F.when(col.isNull(), F.lit(True)).otherwise(~col.cast("boolean"))


# --- arithmetic ------------------------------------------------------------

def safe_div(left: Column, right: Column) -> Column:
    """True division: always float, divisor 0 → 0, null propagates.

    The 0-divisor shortcut fires BEFORE the numerator is inspected —
    exactly the reference's ``_safe_truediv`` (binary_operation_executor
    .py:49-51 checks ``right == 0`` first), so ``None / 0 == 0``."""
    return F.when(right.eqNullSafe(0), F.lit(0.0)).otherwise(
        left.cast("double") / right.cast("double")
    )


def safe_floordiv(left: Column, right: Column, result_is_int: bool) -> Column:
    """Python ``//``: floors toward -inf (Spark's int div truncates);
    0 divisor → 0 (checked before the numerator, as in the reference)."""
    t = "long" if result_is_int else "double"
    q = F.floor(left.cast("double") / right.cast("double")).cast(t)
    zero = 0 if result_is_int else 0.0
    return F.when(right.eqNullSafe(0), F.lit(zero)).otherwise(q)


def safe_mod(left: Column, right: Column, result_is_int: bool) -> Column:
    """Python ``%``: result takes the divisor's sign; 0 divisor → 0."""
    t = "long" if result_is_int else "double"
    m = (left - F.floor(left.cast("double") / right.cast("double")) * right).cast(t)
    zero = 0 if result_is_int else 0.0
    return F.when(right.eqNullSafe(0), F.lit(zero)).otherwise(m)


def py_pow(left: Column, right: Column, result_is_int: bool) -> Column:
    p = F.pow(left, right)
    return p.cast("long") if result_is_int else p

"""Truth-table parity for the None-calculus — the reference's own test
matrix (engine/executor/tests/test_binary_comparison.py:5-60) plus
safe-division (binary_operation_executor.py:48-64), run through BOTH the
Spark compiler and the Python oracle."""

from pyspark.sql import types as T

from tests.helpers import run_parity

SCHEMA = T.StructType(
    [
        T.StructField("__row_id", T.LongType()),
        T.StructField("action_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("t", T.StringType()),
    ]
)

import datetime

TS = datetime.datetime(2024, 1, 1)


def _rows():
    cases = [
        dict(a=1, b=2, s="hello world", t="hello"),
        dict(a=None, b=2, s=None, t="x"),
        dict(a=None, b=None, s=None, t=None),
        dict(a=5, b=0, s="abc", t="abc"),
        dict(a=-7, b=2, s="", t=""),
        dict(a=7, b=-2, s="Hello", t="ello"),
    ]
    return [
        dict(__row_id=i, action_name="evt", ts=TS, **c) for i, c in enumerate(cases)
    ]


SOURCES = {
    "main.sml": """
A: Optional[int] = JsonData(path='$.a', required=False)
B: Optional[int] = JsonData(path='$.b', required=False)
S: Optional[str] = JsonData(path='$.s', required=False)
T_: Optional[str] = JsonData(path='$.t', required=False)

EqAB = A == B
NeAB = A != B
LtAB = A < B
LeAB = A <= B
GtAB = A > B
GeAB = A >= B
EqNone = A == None
NeNone = A != None
InST = T_ in S
NotInST = T_ not in S
InList = A in [1, 5, None]
NotInList = A not in [2, 3]
AndAB = EqAB and GtAB
OrAB = LtAB or GtAB
NotEq = not EqAB

Add = A + B
Sub = A - B
Mul = A * B
Div = A / B
FloorDiv = A // B
Mod = A % B
"""
}


def test_none_calculus_truth_tables(spark):
    run_parity(spark, SOURCES, _rows(), SCHEMA, check_error_count=False)


SOURCES_EXT = {
    "main.sml": """
A: Optional[int] = JsonData(path='$.a', required=False)
B: Optional[int] = JsonData(path='$.b', required=False)
S: Optional[str] = JsonData(path='$.s', required=False)

Pow = A ** B
Shl = A << B
Shr = A >> B
BOr = A | B
BAnd = A & B
BXor = A ^ B
Neg = -A
StrCat = S + S
StrMul = S * B
Fmt = f'v={A} s={S}!'
NotInStr = S not in 'hello world'
"""
}


def test_extended_expressions(spark):
    rows = [
        dict(__row_id=0, action_name="e", ts=TS, a=2, b=5, s="ab", t=None),
        dict(__row_id=1, action_name="e", ts=TS, a=7, b=1, s="hello", t=None),
        dict(__row_id=2, action_name="e", ts=TS, a=None, b=3, s=None, t=None),
    ]
    run_parity(spark, SOURCES_EXT, rows, SCHEMA, check_error_count=False)


SOURCES_NULL_COLLAPSE = {
    "main.sml": """
A: Optional[int] = JsonData(path='$.a', required=False)
S: Optional[str] = JsonData(path='$.s', required=False)

MaybeBool = TextContains(text=S, phrase='hello')
NotMaybe = not MaybeBool
NotFailedExpr = not (A + 1)
NotStr = not S
NotInt = not A
Doubled = f'lit {{A}} and {A}!'
OnlyBraces = f'{{x}} {{y}}'

RuleNullCond = Rule(when_all=[MaybeBool], description='null cond is falsey')
RuleMixed = Rule(when_all=[MaybeBool, A == A], description='null and true')
WhenRules(rules_any=[RuleNullCond], then=[DeclareVerdict(verdict='V1')])
"""
}


def test_null_collapse_not_and_rule(spark):
    """Collapsed-failure contract: a resolved/failed None under ``not`` is
    True (Python ``not None``), and a None when_all condition makes the
    Rule False — never null — so its verdict simply does not fire
    (ADVICE r1: exprs.not_ vs oracle divergence). Also covers {{...}}
    escapes in f-strings compiling to literal braces."""
    rows = [
        dict(__row_id=0, action_name="e", ts=TS, a=2, b=1, s="say hello", t=None),
        dict(__row_id=1, action_name="e", ts=TS, a=None, b=1, s=None, t=None),
        dict(__row_id=2, action_name="e", ts=TS, a=0, b=1, s="", t=None),
    ]
    got = run_parity(spark, SOURCES_NULL_COLLAPSE, rows, SCHEMA, check_error_count=False)
    by_id = {r["__row_id"]: r for r in got}
    # row 1: S is None → MaybeBool null → not → True; rule False (not null)
    assert by_id[1]["NotMaybe"] is True
    assert by_id[1]["RuleNullCond"] is False
    assert by_id[1]["RuleMixed"] is False
    assert by_id[1]["__verdicts"] == []
    assert by_id[0]["RuleNullCond"] is True
    assert by_id[0]["__verdicts"] == ["V1"]
    # literal-brace escapes render as literal braces, not placeholders
    assert by_id[0]["Doubled"] == "lit {A} and 2!"
    assert by_id[0]["OnlyBraces"] == "{x} {y}"

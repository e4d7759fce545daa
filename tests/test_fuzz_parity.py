"""Randomized expression-parity fuzz: generate seeded random SML
expression trees (arithmetic, comparisons, boolean ops, string ops over
nullable inputs), compile them to the Spark plan AND evaluate with the
row oracle, assert identical outputs. One compiled ruleset of ~60
expressions per seed keeps it a single Spark job."""

import datetime
import random

from pyspark.sql import types as T

from tests.helpers import run_parity

TS = datetime.datetime(2024, 1, 1)

SCHEMA = T.StructType(
    [
        T.StructField("__row_id", T.LongType()),
        T.StructField("action_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("c", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("t", T.StringType()),
    ]
)

_INT_LEAVES = ["A", "B", "1", "2", "7", "-3", "0"]
_FLOAT_LEAVES = ["C", "2.5", "0.0"]
_STR_LEAVES = ["S", "T_", "'ab'", "'hello'", "''"]
_NUM_OPS = ["+", "-", "*", "//", "%"]
_CMP_OPS = ["==", "!=", "<", "<=", ">", ">="]


def _num_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.4:
        return rng.choice(_INT_LEAVES)
    if rng.random() < 0.1:
        return f"(-{_num_expr(rng, depth - 1)})"
    op = rng.choice(_NUM_OPS)
    return f"({_num_expr(rng, depth - 1)} {op} {_num_expr(rng, depth - 1)})"


def _str_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.6:
        return rng.choice(_STR_LEAVES)
    return f"({_str_expr(rng, depth - 1)} + {_str_expr(rng, depth - 1)})"


def _bool_expr(rng: random.Random, depth: int) -> str:
    kind = rng.random()
    if kind < 0.45:
        return f"({_num_expr(rng, depth - 1)} {rng.choice(_CMP_OPS)} {_num_expr(rng, depth - 1)})"
    if kind < 0.65:
        return f"({_str_expr(rng, depth - 1)} {rng.choice(['==', '!='])} {_str_expr(rng, depth - 1)})"
    if kind < 0.70:
        items = ", ".join(rng.choice(_INT_LEAVES) for _ in range(rng.randint(1, 4)))
        return f"({rng.choice(['A', 'B'])} {rng.choice(['in', 'not in'])} [{items}])"
    if kind < 0.75:
        return f"({_str_expr(rng, depth - 1)} in {_str_expr(rng, depth - 1)})"
    if depth <= 0:
        return "(A == B)"
    if kind < 0.85:
        return f"(not {_bool_expr(rng, depth - 1)})"
    op = rng.choice(["and", "or"])
    return f"({_bool_expr(rng, depth - 1)} {op} {_bool_expr(rng, depth - 1)})"


def _make_ruleset(seed: int, n_exprs: int = 60) -> dict[str, str]:
    rng = random.Random(seed)
    lines = [
        "A: Optional[int] = JsonData(path='$.a', required=False)",
        "B: Optional[int] = JsonData(path='$.b', required=False)",
        "C: Optional[float] = JsonData(path='$.c', required=False)",
        "S: Optional[str] = JsonData(path='$.s', required=False)",
        "T_: Optional[str] = JsonData(path='$.t', required=False)",
    ]
    for i in range(n_exprs):
        pick = rng.random()
        if pick < 0.42:
            lines.append(f"N{i} = {_num_expr(rng, 3)}")
        elif pick < 0.55:
            lines.append(f"Q{i} = {_str_expr(rng, 2)}")
        elif pick < 0.62:
            names = rng.sample(["A", "B", "S", "T_"], rng.randint(1, 3))
            inner = " ".join("{" + n + "}" for n in names)
            lines.append(f"F{i} = f'v {inner} end'")
        else:
            lines.append(f"P{i} = {_bool_expr(rng, 3)}")
    return {"main.sml": "\n".join(lines)}


def _rows(seed: int, n: int = 10) -> list[dict]:
    rng = random.Random(seed + 1000)
    rows = []
    for i in range(n):
        rows.append(
            dict(
                __row_id=i,
                action_name="e",
                ts=TS,
                a=rng.choice([None, 0, 1, -7, 100]),
                b=rng.choice([None, 0, 2, -3, 9]),
                c=rng.choice([None, 0.0, 2.5, -1.5]),
                s=rng.choice([None, "", "ab", "hello world", "xyz"]),
                t=rng.choice([None, "", "ab", "hello"]),
            )
        )
    return rows


def test_fuzz_expression_parity(spark):
    for seed in (11, 29, 47, 83, 101, 137, 211, 307):
        run_parity(
            spark,
            _make_ruleset(seed),
            _rows(seed),
            SCHEMA,
            check_error_count=False,
        )

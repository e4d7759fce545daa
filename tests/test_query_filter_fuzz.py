"""Randomized parity sweep for the analytics filter translator.

The 480-case SML fuzz covers rule expressions; this one targets
``plans/query_filter.py`` — the Druid-translator semantics (implicit
not-null conjuncts on bound filters, null-safe equality, case-
insensitive string contains, IN lists, 3-valued and/or/not composition,
RegexMatch) — against DuckDB evaluating the SAME semantics rendered as
SQL over the SAME parquet rows (reference:
query_language/ast_druid_translator.py:79-135).

Strategy: a seeded generator emits random filter ASTs; each AST renders
BOTH as an SML filter string (compiled by compile_query_filter) and as a
DuckDB boolean expression implementing the translator's documented
semantics. All N predicates evaluate in ONE Spark job (each predicate a
boolean column) and ONE DuckDB query; per-row filter truthiness
(pred IS TRUE — null drops the row) must agree everywhere. Failures
print the seed + expression, so they reproduce."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from osprey_spark.plans import compile_query_filter

STR_COLS = ["StrA", "StrB"]
NUM_COLS = ["NumA", "NumB"]
FLT_COLS = ["FltA"]
BOOL_COLS = ["BoolA"]
STR_VALUES = ["", "a", "A", "ab", "m", "xy", "zz", "Mz"]
NUM_VALUES = [-2, 0, 1, 3, 7]
FLT_VALUES = [-1.5, 0.0, 2.5]
SEARCHES = ["a", "A", "b", "z", ""]
PATTERNS = ["a", "b", "^a", "z$", "[am]"]
N_EXPRS = 150
SEED = 20260817


def _sql_lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _sml_lit(v):
    if v is None:
        return "None"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, str):
        return '"' + v + '"'
    return repr(v)


class Gen:
    """Emit (sml_string, duckdb_sql) pairs for one random filter AST."""

    def __init__(self, rnd: random.Random):
        self.rnd = rnd

    def leaf(self):
        kind = self.rnd.choice(
            ["eq", "eq", "bound", "bound", "in_str", "in_list", "col_eq", "bare_bool", "regex"]
        )
        r = self.rnd
        if kind == "eq":
            col, vals = r.choice(
                [(r.choice(STR_COLS), STR_VALUES + [None]),
                 (r.choice(NUM_COLS), NUM_VALUES + [None]),
                 (r.choice(FLT_COLS), FLT_VALUES),
                 (r.choice(BOOL_COLS), [True, False, None])]
            )
            v = r.choice(vals)
            op = r.choice(["==", "!="])
            sml = f"{col} {op} {_sml_lit(v)}"
            sql = f"({col} IS NOT DISTINCT FROM {_sql_lit(v)})"
            return sml, (sql if op == "==" else f"(NOT {sql})")
        if kind == "bound":
            col, vals = r.choice(
                [(r.choice(STR_COLS), STR_VALUES),
                 (r.choice(NUM_COLS), NUM_VALUES),
                 (r.choice(FLT_COLS), FLT_VALUES)]
            )
            v, op = r.choice(vals), r.choice(["<", "<=", ">", ">="])
            if r.random() < 0.3:  # literal-on-the-left flip
                flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}[op]
                return (
                    f"{_sml_lit(v)} {op} {col}",
                    f"({col} IS NOT NULL AND {col} {flip} {_sql_lit(v)})",
                )
            return (
                f"{col} {op} {_sml_lit(v)}",
                f"({col} IS NOT NULL AND {col} {op} {_sql_lit(v)})",
            )
        if kind == "in_str":
            col, v = r.choice(STR_COLS), r.choice(SEARCHES)
            op = r.choice(["in", "not in"])
            sql = f"contains(lower({col}), {_sql_lit(v.lower())})"
            sml = f"{col} {op} {_sml_lit(v)}"
            return sml, (sql if op == "in" else f"(NOT {sql})")
        if kind == "in_list":
            col, vals = r.choice(
                [(r.choice(STR_COLS), STR_VALUES), (r.choice(NUM_COLS), NUM_VALUES)]
            )
            items = r.sample(vals, r.randint(1, 3))
            op = r.choice(["in", "not in"])
            sml = f"{col} {op} [{', '.join(_sml_lit(i) for i in items)}]"
            sql = f"({col} IN ({', '.join(_sql_lit(i) for i in items)}))"
            return sml, (sql if op == "in" else f"(NOT {sql})")
        if kind == "col_eq":
            a, b = r.choice([tuple(STR_COLS), tuple(NUM_COLS)])
            return f"{a} == {b}", f"({a} IS NOT DISTINCT FROM {b})"
        if kind == "bare_bool":
            col = r.choice(BOOL_COLS)
            return col, col
        col, pat = r.choice(STR_COLS), r.choice(PATTERNS)
        ci = r.random() < 0.5
        sml = f'RegexMatch(target={col}, pattern="{pat}"' + (
            ", case_insensitive=True)" if ci else ")"
        )
        sql_pat = f"(?i){pat}" if ci else pat
        return sml, f"regexp_matches({col}, {_sql_lit(sql_pat)})"

    def expr(self, depth=0):
        r = self.rnd
        if depth >= 2 or r.random() < 0.4:
            return self.leaf()
        kind = r.choice(["and", "or", "not"])
        if kind == "not":
            s, q = self.expr(depth + 1)
            return f"not ({s})", f"(NOT {q})"
        parts = [self.expr(depth + 1) for _ in range(r.randint(2, 3))]
        smls = f" {kind} ".join(f"({s})" for s, _ in parts)
        sqls = f" {kind.upper()} ".join(q for _, q in parts)
        return smls, f"({sqls})"


def _make_rows(rnd: random.Random, n=240):
    def pick(vals):
        return None if rnd.random() < 0.25 else rnd.choice(vals)

    return [
        (
            i,
            pick(STR_VALUES),
            pick(STR_VALUES),
            pick(NUM_VALUES),
            pick(NUM_VALUES),
            pick(FLT_VALUES),
            pick([True, False]),
        )
        for i in range(n)
    ]


def test_query_filter_fuzz_matches_duckdb(spark, tmp_path):
    rnd = random.Random(SEED)
    schema = (
        "id long, StrA string, StrB string, NumA long, NumB long, "
        "FltA double, BoolA boolean"
    )
    data = str(tmp_path / "t.parquet")
    df = spark.createDataFrame(_make_rows(rnd), schema)
    df.coalesce(1).write.parquet(data)
    df = spark.read.parquet(data)

    gen = Gen(rnd)
    cases = [gen.expr() for _ in range(N_EXPRS)]

    # ONE Spark job: every predicate as a boolean column
    preds = []
    for i, (sml, _) in enumerate(cases):
        try:
            preds.append(compile_query_filter(sml, df).alias(f"p{i}"))
        except Exception as e:  # generator must emit parseable surface
            pytest.fail(f"seed={SEED} case {i}: {sml!r} failed to compile: {e}")
    spark_rows = {r["id"]: r for r in df.select("id", *preds).collect()}

    # ONE DuckDB query over the same parquet bytes
    con = duckdb.connect()
    sel = ", ".join(f"({q}) AS p{i}" for i, (_, q) in enumerate(cases))
    duck = con.execute(
        f"SELECT id, {sel} FROM read_parquet('{data}/*.parquet')"
    ).fetchall()
    cols = [d[0] for d in con.description]
    duck_rows = {row[0]: dict(zip(cols, row)) for row in duck}

    assert set(spark_rows) == set(duck_rows)
    mismatches = []
    for i, (sml, sql) in enumerate(cases):
        for rid, srow in spark_rows.items():
            s = bool(srow[f"p{i}"]) if srow[f"p{i}"] is not None else False
            d = bool(duck_rows[rid][f"p{i}"]) if duck_rows[rid][f"p{i}"] is not None else False
            if s != d:
                mismatches.append((i, rid, sml, sql, srow[f"p{i}"], duck_rows[rid][f"p{i}"]))
                break
    assert not mismatches, f"seed={SEED}: {mismatches[:5]}"


# -- Did* query-UDF leaves over a results-shaped table (ADVICE r6 item 7) ----
#
# The sweep above covers the scalar translator surface; these cases
# exercise the array-predicate paths of the query UDFs
# (query_language/udfs/did_mutate_label.py:22-68 analogues):
# DidDeclareVerdict over __verdicts, DidAddLabel/DidRemoveLabel over
# __entity_label_mutations — with and without entity_type (the
# entity_type-less form is a suffix match that must not cross a '/'
# boundary: label "a" must not match mutation "User/ba/...").

VERDICTS = ["review", "flag_turn", "escalate"]
ETYPES = ["User", "Conv"]
LABELS = ["flagged", "errored", "a", "ba"]
STATUSES = ["ADDED", "REMOVED"]


class DidGen:
    def __init__(self, rnd: random.Random):
        self.rnd = rnd

    def leaf(self):
        r = self.rnd
        kind = r.choice(["verdict", "label", "label", "bare_bool"])
        if kind == "verdict":
            v = r.choice(VERDICTS + ["nope"])
            return (
                f'DidDeclareVerdict(verdict="{v}")',
                f"list_contains(__verdicts, {_sql_lit(v)})",
            )
        if kind == "label":
            fn = r.choice(["DidAddLabel", "DidRemoveLabel"])
            status = "ADDED" if fn == "DidAddLabel" else "REMOVED"
            label = r.choice(LABELS + ["missing"])
            if r.random() < 0.5:
                etype = r.choice(ETYPES)
                needle = f"{etype}/{label}/LabelStatus.{status}"
                return (
                    f'{fn}(label="{label}", entity_type="{etype}")',
                    f"list_contains(__entity_label_mutations, {_sql_lit(needle)})",
                )
            suffix = f"/{label}/LabelStatus.{status}"
            return (
                f'{fn}(label="{label}")',
                "(len(list_filter(__entity_label_mutations, "
                f"m -> ends_with(m, {_sql_lit(suffix)}))) > 0)",
            )
        return "BoolA", "BoolA"

    def expr(self, depth=0):
        r = self.rnd
        if depth >= 2 or r.random() < 0.45:
            return self.leaf()
        kind = r.choice(["and", "or", "not"])
        if kind == "not":
            s, q = self.expr(depth + 1)
            return f"not ({s})", f"(NOT {q})"
        parts = [self.expr(depth + 1) for _ in range(r.randint(2, 3))]
        smls = f" {kind} ".join(f"({s})" for s, _ in parts)
        sqls = f" {kind.upper()} ".join(q for _, q in parts)
        return smls, f"({sqls})"


def _make_result_rows(rnd: random.Random, n=240):
    rows = []
    for i in range(n):
        if rnd.random() < 0.15:
            verdicts = None
        else:
            verdicts = rnd.sample(VERDICTS, rnd.randint(0, len(VERDICTS)))
        if rnd.random() < 0.15:
            muts = None
        else:
            muts = [
                f"{rnd.choice(ETYPES)}/{rnd.choice(LABELS)}/LabelStatus.{rnd.choice(STATUSES)}"
                for _ in range(rnd.randint(0, 3))
            ]
        rows.append((i, verdicts, muts, rnd.choice([True, False, None])))
    return rows


def test_query_filter_fuzz_did_udfs_match_duckdb(spark, tmp_path):
    rnd = random.Random(SEED + 7)
    schema = (
        "id long, __verdicts array<string>, "
        "__entity_label_mutations array<string>, BoolA boolean"
    )
    data = str(tmp_path / "results.parquet")
    df = spark.createDataFrame(_make_result_rows(rnd), schema)
    df.coalesce(1).write.parquet(data)
    df = spark.read.parquet(data)

    gen = DidGen(rnd)
    cases = [gen.expr() for _ in range(80)]

    preds = []
    for i, (sml, _) in enumerate(cases):
        try:
            preds.append(compile_query_filter(sml, df).alias(f"p{i}"))
        except Exception as e:
            pytest.fail(f"seed={SEED + 7} case {i}: {sml!r} failed to compile: {e}")
    spark_rows = {r["id"]: r for r in df.select("id", *preds).collect()}

    con = duckdb.connect()
    sel = ", ".join(f"({q}) AS p{i}" for i, (_, q) in enumerate(cases))
    duck = con.execute(
        f"SELECT id, {sel} FROM read_parquet('{data}/*.parquet')"
    ).fetchall()
    cols = [d[0] for d in con.description]
    duck_rows = {row[0]: dict(zip(cols, row)) for row in duck}

    assert set(spark_rows) == set(duck_rows)
    mismatches = []
    for i, (sml, sql) in enumerate(cases):
        for rid, srow in spark_rows.items():
            s = bool(srow[f"p{i}"]) if srow[f"p{i}"] is not None else False
            d = bool(duck_rows[rid][f"p{i}"]) if duck_rows[rid][f"p{i}"] is not None else False
            if s != d:
                mismatches.append((i, rid, sml, sql, srow[f"p{i}"], duck_rows[rid][f"p{i}"]))
                break
    assert not mismatches, f"seed={SEED + 7}: {mismatches[:5]}"

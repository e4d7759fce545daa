"""Analytics query-language → ``Column`` filter compiler.

The reference's investigation console accepts an SML expression string
(e.g. ``'UserId == "u1" and ErrorCount > 3'``), parses it with the same
parser as the rule language, and translates it to a Druid filter tree
(engine/query_language/ast_druid_translator.py:18-135). Here the same
surface compiles to a ``pyspark.sql.Column`` predicate over the results
table, with the Druid translator's exact semantics:

- ``==``/``!=`` → null-safe selector (``<=>``)
- ``< <= > >=`` → bound filter with **implicit not-null conjunct**
  (ast_druid_translator.py:123-135)
- ``x in "str"`` → case-insensitive contains (:110-116)
- ``x in [list]`` → IN filter (:117-118)
- query UDFs: ``RegexMatch``, ``DidDeclareVerdict``,
  ``DidAddLabel`` / ``DidRemoveLabel`` (query_language/udfs/*)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osprey_spark.sml import nodes as g
from osprey_spark.sml.parser import SmlError, parse_expression


def compile_query_filter(expr: str, df: DataFrame) -> Column:
    """Compile a query-language expression to a filter predicate for ``df``."""
    node = parse_expression(expr)
    return _QueryCompiler(set(df.columns)).visit(node)


class _QueryCompiler:
    def __init__(self, columns: set[str]):
        self.columns = columns

    def visit(self, node: g.Node) -> Column:
        if isinstance(node, g.BoolOp):
            parts = [self.visit(v) for v in node.values]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if node.op == "and" else (out | p)
            return out
        if isinstance(node, g.UnaryOp) and node.op == "not":
            return ~self.visit(node.operand)
        if isinstance(node, g.Compare):
            return self._compare(node)
        if isinstance(node, g.Call):
            return self._call(node)
        if isinstance(node, g.Name):
            return self._feature(node).cast("boolean")
        raise SmlError(f"unsupported query node {type(node).__name__}", node.span)

    def _feature(self, node: g.Name) -> Column:
        if node.identifier not in self.columns:
            raise SmlError(f"unknown feature `{node.identifier}`", node.span)
        return F.col(node.identifier)

    def _value(self, node: g.Node):
        if isinstance(node, (g.String, g.Number, g.Boolean)):
            return node.value
        if isinstance(node, g.NoneLiteral):
            return None
        if isinstance(node, g.ListLiteral):
            return [self._value(i) for i in node.items]
        raise SmlError("expected a literal", node.span)

    def _compare(self, node: g.Compare) -> Column:
        left_is_feature = isinstance(node.left, g.Name)
        right_is_feature = isinstance(node.right, g.Name)
        op = node.op

        if op in ("==", "!="):
            if left_is_feature and right_is_feature:
                # columnComparison (ast_druid_translator.py:52-65)
                cond = self._feature(node.left).eqNullSafe(self._feature(node.right))
            elif left_is_feature:
                cond = self._feature(node.left).eqNullSafe(F.lit(self._value(node.right)))
            elif right_is_feature:
                cond = self._feature(node.right).eqNullSafe(F.lit(self._value(node.left)))
            else:
                raise SmlError("comparison requires a feature operand", node.span)
            return cond if op == "==" else ~cond

        if op in ("<", "<=", ">", ">="):
            # bound filter with implicit not-null (ast_druid_translator.py:123-135)
            if left_is_feature:
                col, lit = self._feature(node.left), self._value(node.right)
                flip = False
            elif right_is_feature:
                col, lit = self._feature(node.right), self._value(node.left)
                flip = True
            else:
                raise SmlError("comparison requires a feature operand", node.span)
            L = F.lit(lit)
            cmp = {
                ("<", False): col < L, ("<=", False): col <= L,
                (">", False): col > L, (">=", False): col >= L,
                ("<", True): col > L, ("<=", True): col >= L,
                (">", True): col < L, (">=", True): col <= L,
            }[(op, flip)]
            return col.isNotNull() & cmp

        if op in ("in", "not in"):
            if not left_is_feature:
                raise SmlError("`in` requires a feature on the left", node.span)
            col = self._feature(node.left)
            rhs = self._value(node.right)
            if isinstance(rhs, str):
                # case-insensitive contains search (:110-116)
                cond = F.lower(col).contains(rhs.lower())
            elif isinstance(rhs, list):
                cond = col.isin(rhs)
            else:
                raise SmlError("`in` requires a string or list literal", node.span)
            return cond if op == "in" else ~cond

        raise SmlError(f"unsupported comparison {op}", node.span)

    def _call(self, node: g.Call) -> Column:
        if node.func == "RegexMatch":
            target = node.kwargs.get("target")
            pattern = self._value(node.kwargs["pattern"])
            ci = bool(self._value(node.kwargs["case_insensitive"])) if "case_insensitive" in node.kwargs else False
            if not isinstance(target, g.Name):
                raise SmlError("RegexMatch target must be a feature", node.span)
            pat = f"(?i){pattern}" if ci else pattern
            return self._feature(target).rlike(pat)
        if node.func == "DidDeclareVerdict":
            verdict = self._value(node.kwargs["verdict"])
            return F.array_contains(F.col("__verdicts"), verdict)
        if node.func in ("DidAddLabel", "DidRemoveLabel"):
            # LIKE %Type/label/Status% over __entity_label_mutations
            # (query_language/udfs/did_mutate_label.py:22-68)
            label = self._value(node.kwargs["label"])
            etype = self._value(node.kwargs["entity_type"]) if "entity_type" in node.kwargs else None
            status = "ADDED" if node.func == "DidAddLabel" else "REMOVED"
            if etype is not None:
                needle = f"{etype}/{label}/LabelStatus.{status}"
                return F.array_contains(F.col("__entity_label_mutations"), needle)
            suffix = f"/{label}/LabelStatus.{status}"
            return F.exists(F.col("__entity_label_mutations"), lambda m: m.endswith(suffix))
        raise SmlError(f"unknown query UDF `{node.func}`", node.span)

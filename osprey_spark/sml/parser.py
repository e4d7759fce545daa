"""SML parser: CPython ``ast`` → restricted SML grammar.

The reference parses rule files with Python's own parser and then
rejects everything outside the restricted subset
(engine/ast/py_ast.py:70-91; restrictions at :196 positional args,
:218-224 chained comparisons, :257-267 attribute chains). This module
implements the same surface from scratch:

- statements: ``Name = expr``, ``Name: type = expr``, or a bare call
  (``Import(...)``, ``Require(...)``, ``WhenRules(...)``)
- calls take **keyword arguments only**
- no chained comparisons (``a < b < c`` is rejected)
- expressions: literals, names, f-strings over names, ``and/or/not``,
  arithmetic/bitwise ops, comparisons incl. ``in``/``not in``
"""

from __future__ import annotations

import ast as pyast

from osprey_spark.sml import nodes as g


class SmlError(Exception):
    def __init__(self, message: str, span: g.Span | None = None):
        self.message = message
        self.span = span
        super().__init__(f"{span}: {message}" if span else message)


def _span(source: str, node: pyast.AST) -> g.Span:
    return g.Span(source, getattr(node, "lineno", 0), getattr(node, "col_offset", 0))


_BINOPS = {
    pyast.Add: "+", pyast.Sub: "-", pyast.Mult: "*", pyast.Div: "/",
    pyast.FloorDiv: "//", pyast.Mod: "%", pyast.Pow: "**",
    pyast.LShift: "<<", pyast.RShift: ">>",
    pyast.BitOr: "|", pyast.BitAnd: "&", pyast.BitXor: "^",
}

_CMPOPS = {
    pyast.Eq: "==", pyast.NotEq: "!=", pyast.Lt: "<", pyast.LtE: "<=",
    pyast.Gt: ">", pyast.GtE: ">=", pyast.In: "in", pyast.NotIn: "not in",
}


def parse_source(source_text: str, path: str = "<sml>") -> g.Root:
    try:
        tree = pyast.parse(source_text)
    except SyntaxError as e:
        raise SmlError(f"invalid syntax: {e.msg}", g.Span(path, e.lineno or 0, e.offset or 0))
    statements: list[g.Node] = []
    for stmt in tree.body:
        statements.append(_parse_statement(stmt, path))
    return g.Root(span=g.Span(path, 1, 0), path=path, statements=statements)


def parse_expression(expr_text: str, path: str = "<query>") -> g.Node:
    """Parse a single SML expression (the analytics query-language entry,
    reference: engine/query_language/__init__.py:26-48)."""
    try:
        tree = pyast.parse(expr_text, mode="eval")
    except SyntaxError as e:
        raise SmlError(f"invalid syntax: {e.msg}", g.Span(path, e.lineno or 0, e.offset or 0))
    return _parse_expr(tree.body, path)


def _parse_statement(stmt: pyast.stmt, path: str) -> g.Node:
    sp = _span(path, stmt)
    if isinstance(stmt, pyast.Assign):
        if len(stmt.targets) != 1 or not isinstance(stmt.targets[0], pyast.Name):
            raise SmlError("assignment must target a single name", sp)
        target = g.Name(span=_span(path, stmt.targets[0]), identifier=stmt.targets[0].id)
        return g.Assign(span=sp, target=target, value=_parse_expr(stmt.value, path))
    if isinstance(stmt, pyast.AnnAssign):
        if not isinstance(stmt.target, pyast.Name):
            raise SmlError("assignment must target a single name", sp)
        if stmt.value is None:
            raise SmlError("annotated assignment requires a value", sp)
        target = g.Name(span=_span(path, stmt.target), identifier=stmt.target.id)
        ann = _parse_annotation(stmt.annotation, path)
        return g.Assign(span=sp, target=target, value=_parse_expr(stmt.value, path), annotation=ann)
    if isinstance(stmt, pyast.Expr):
        value = _parse_expr(stmt.value, path)
        if not isinstance(value, g.Call):
            raise SmlError("expression statements must be calls", sp)
        return g.ExprStatement(span=sp, call=value)
    raise SmlError(f"statement type {type(stmt).__name__} is not allowed in SML", sp)


def _parse_annotation(ann: pyast.expr, path: str) -> g.TypeAnn:
    sp = _span(path, ann)
    if isinstance(ann, pyast.Name):
        return g.TypeAnn(span=sp, base=ann.id)
    if isinstance(ann, pyast.Constant) and ann.value is None:
        return g.TypeAnn(span=sp, base="None")
    if isinstance(ann, pyast.Subscript) and isinstance(ann.value, pyast.Name):
        return g.TypeAnn(span=sp, base=ann.value.id, param=_parse_annotation(ann.slice, path))
    raise SmlError("unsupported type annotation", sp)


def _parse_expr(expr: pyast.expr, path: str) -> g.Node:
    sp = _span(path, expr)

    if isinstance(expr, pyast.Constant):
        v = expr.value
        if isinstance(v, bool):
            return g.Boolean(span=sp, value=v)
        if isinstance(v, (int, float)):
            return g.Number(span=sp, value=v)
        if isinstance(v, str):
            return g.String(span=sp, value=v)
        if v is None:
            return g.NoneLiteral(span=sp)
        raise SmlError(f"unsupported literal {v!r}", sp)

    if isinstance(expr, pyast.Name):
        return g.Name(span=sp, identifier=expr.id)

    if isinstance(expr, pyast.List):
        return g.ListLiteral(span=sp, items=[_parse_expr(e, path) for e in expr.elts])

    if isinstance(expr, pyast.JoinedStr):
        return _parse_fstring(expr, path)

    if isinstance(expr, pyast.BinOp):
        op = _BINOPS.get(type(expr.op))
        if op is None:
            raise SmlError(f"operator {type(expr.op).__name__} not allowed", sp)
        return g.BinaryOp(span=sp, left=_parse_expr(expr.left, path), op=op,
                          right=_parse_expr(expr.right, path))

    if isinstance(expr, pyast.Compare):
        if len(expr.ops) != 1:
            # same restriction as reference py_ast.py:218-224
            raise SmlError("chained comparisons are not allowed", sp)
        op = _CMPOPS.get(type(expr.ops[0]))
        if op is None:
            raise SmlError(f"comparison {type(expr.ops[0]).__name__} not allowed", sp)
        return g.Compare(span=sp, left=_parse_expr(expr.left, path), op=op,
                         right=_parse_expr(expr.comparators[0], path))

    if isinstance(expr, pyast.BoolOp):
        op = "and" if isinstance(expr.op, pyast.And) else "or"
        return g.BoolOp(span=sp, op=op, values=[_parse_expr(v, path) for v in expr.values])

    if isinstance(expr, pyast.UnaryOp):
        if isinstance(expr.op, pyast.Not):
            op = "not"
        elif isinstance(expr.op, pyast.USub):
            op = "-"
        elif isinstance(expr.op, pyast.UAdd):
            op = "+"
        else:
            raise SmlError(f"unary operator {type(expr.op).__name__} not allowed", sp)
        operand = _parse_expr(expr.operand, path)
        # fold -<number> into a literal
        if op == "-" and isinstance(operand, g.Number):
            return g.Number(span=sp, value=-operand.value)
        if op == "+" and isinstance(operand, g.Number):
            return operand
        return g.UnaryOp(span=sp, op=op, operand=operand)

    if isinstance(expr, pyast.Call):
        if not isinstance(expr.func, pyast.Name):
            raise SmlError("calls must reference a plain function name", sp)
        if expr.args:
            # same restriction as reference py_ast.py:196
            raise SmlError("calls only accept keyword arguments", sp)
        kwargs: dict[str, g.Node] = {}
        for kw in expr.keywords:
            if kw.arg is None:
                raise SmlError("**kwargs expansion is not allowed", sp)
            kwargs[kw.arg] = _parse_expr(kw.value, path)
        return g.Call(span=sp, func=expr.func.id, kwargs=kwargs)

    raise SmlError(f"expression type {type(expr).__name__} is not allowed in SML", sp)


def _parse_fstring(expr: pyast.JoinedStr, path: str) -> g.FormatString:
    sp = _span(path, expr)
    parts: list[str] = []
    names: list[g.Name] = []
    for piece in expr.values:
        if isinstance(piece, pyast.Constant) and isinstance(piece.value, str):
            # escape literal braces, as the reference does (ast/grammar.py:792-811)
            parts.append(piece.value.replace("{", "{{").replace("}", "}}"))
        elif isinstance(piece, pyast.FormattedValue):
            if not isinstance(piece.value, pyast.Name):
                raise SmlError("f-strings may only interpolate plain names", sp)
            if piece.conversion != -1 or piece.format_spec is not None:
                raise SmlError("f-string conversions/format specs are not allowed", sp)
            name = g.Name(span=_span(path, piece.value), identifier=piece.value.id)
            names.append(name)
            parts.append("{" + name.identifier + "}")
        else:
            raise SmlError("unsupported f-string component", sp)
    return g.FormatString(span=sp, format_string="".join(parts), names=names)

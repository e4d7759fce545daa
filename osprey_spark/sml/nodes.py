"""SML grammar — the restricted AST the parser produces.

Mirrors the *shape* of the reference grammar (engine/ast/grammar.py) but
is a fresh minimal design: only the node kinds the language admits.
Statements are assignments and bare calls; expressions are literals,
names, f-strings, unary/binary/boolean ops, comparisons, and
keyword-only calls.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union


@dataclass
class Span:
    source: str
    line: int
    col: int

    def __str__(self) -> str:
        return f"{self.source}:{self.line}:{self.col}"


@dataclass
class Node:
    span: Span


# --- expressions -----------------------------------------------------------

@dataclass
class Name(Node):
    identifier: str

    @property
    def is_local(self) -> bool:
        return self.identifier.startswith("_")


@dataclass
class String(Node):
    value: str


@dataclass
class Number(Node):
    value: Union[int, float]


@dataclass
class Boolean(Node):
    value: bool


@dataclass
class NoneLiteral(Node):
    pass


@dataclass
class ListLiteral(Node):
    items: list[Node]


@dataclass
class FormatString(Node):
    """f-string interpolating only plain Names (reference: ast/grammar.py:792-811)."""

    format_string: str  # with {name} placeholders
    names: list[Name] = field(default_factory=list)


@dataclass
class BinaryOp(Node):
    left: Node
    op: str  # + - * / // % ** << >> | & ^
    right: Node


@dataclass
class Compare(Node):
    left: Node
    op: str  # == != < <= > >= in "not in"
    right: Node


@dataclass
class BoolOp(Node):
    op: str  # and | or
    values: list[Node]


@dataclass
class UnaryOp(Node):
    op: str  # not | - | +
    operand: Node


@dataclass
class Call(Node):
    func: str
    kwargs: dict[str, Node]


# --- type annotations ------------------------------------------------------

@dataclass
class TypeAnn(Node):
    """Annotation like ``str``, ``int``, ``Optional[str]``, ``list[str]``,
    ``Entity[str]``, ``Secret[str]``."""

    base: str
    param: Optional["TypeAnn"] = None


# --- statements ------------------------------------------------------------

@dataclass
class Assign(Node):
    target: Name
    value: Node
    annotation: Optional[TypeAnn] = None


@dataclass
class ExprStatement(Node):
    call: Call


@dataclass
class Root(Node):
    path: str
    statements: list[Node] = field(default_factory=list)

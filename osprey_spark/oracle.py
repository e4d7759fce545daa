"""Per-row Python oracle for rule evaluation.

This is the test-only reference evaluator: it interprets a parsed SML
ruleset one event at a time with the reference engine's exact semantics
(None-calculus, failure poisoning, effect emission) so tests can assert
that the vectorized Spark plan produces identical rows — mirroring the
reference's own ``execute()`` fixture contract (engine/conftest.py:272-365)
and its async-executor parity suite (osprey_async_worker/.../tests).

Never used in the data path — Spark plans are the engine.
"""

from __future__ import annotations

import base64
import fnmatch
import hashlib
import math
import re
from dataclasses import dataclass, field
from typing import Any, Optional

from osprey_spark.sml import nodes as g
from osprey_spark.sml.parser import parse_source


class Failure(Exception):
    """A failed node (poisons consumers)."""

    def __init__(self, expected: bool = False):
        self.expected = expected


@dataclass
class OracleResult:
    features: dict[str, Any]
    verdicts: list[str]
    label_mutations: list[str]
    applied_labels: list[tuple[str, str, str, int, Optional[float]]]
    error_count: int
    custom_effects: dict[str, list[str]] = field(default_factory=dict)


@dataclass
class _Rule:
    name: str
    value: bool
    description: str


@dataclass
class _Effect:
    kind: str
    verdict: Optional[str] = None
    entity_type: Optional[str] = None
    entity_id: Any = None
    label: Optional[str] = None
    status_name: Optional[str] = None
    expires_after: Optional[float] = None
    has_apply_if: bool = False
    apply_if: Any = None
    custom_feature: Optional[str] = None
    custom_value: Optional[str] = None

    @property
    def suppressed(self) -> bool:
        return self.has_apply_if and self.apply_if is None


class _Entity:
    def __init__(self, etype: str, eid: Any):
        self.type = etype
        self.id = eid


class _TimeDelta(float):
    pass


def evaluate_event(
    sources: dict[str, str],
    event: dict[str, Any],
    entry: str = "main.sml",
    action_name_key: str = "action_name",
    action_ts_key: str = "ts",
) -> OracleResult:
    ev = _Evaluator(sources, event, action_name_key, action_ts_key)
    ev.run_file(entry)
    return ev.result()


class _Evaluator:
    def __init__(self, sources, event, action_name_key, action_ts_key):
        self.sources = sources
        self.event = event
        self.action_name_key = action_name_key
        self.action_ts_key = action_ts_key
        self.env: dict[str, Any] = {}
        self.failed: set[str] = set()
        self.features: dict[str, Any] = {}
        self.verdicts: list[str] = []
        self.mutations: list[str] = []
        self.applied: list[tuple] = []
        self.custom: dict[str, list[str]] = {}
        self.error_count = 0
        self.processed: set[str] = set()
        self.current_ann: Optional[g.TypeAnn] = None
        self.pending: dict[str, g.Assign] = {}
        self.in_progress: set[str] = set()

    def result(self) -> OracleResult:
        return OracleResult(
            features=self.features,
            verdicts=self.verdicts,
            label_mutations=self.mutations,
            applied_labels=self.applied,
            error_count=self.error_count,
            custom_effects=self.custom,
        )

    def run_file(self, path: str) -> None:
        if path in self.processed:
            return
        self.processed.add(path)
        root = parse_source(self.sources[path], path)
        # dependency-ordered execution: register assigns, run lazily
        for stmt in root.statements:
            if isinstance(stmt, g.Assign):
                self.pending[stmt.target.identifier] = stmt
        for stmt in root.statements:
            if isinstance(stmt, g.Assign):
                self._ensure(stmt.target.identifier)
            elif isinstance(stmt, g.ExprStatement):
                self._call_stmt(stmt.call)

    def _ensure(self, name: str) -> None:
        if name in self.env or name in self.in_progress:
            return
        stmt = self.pending.pop(name, None)
        if stmt is None:
            return
        self.in_progress.add(name)
        try:
            self._assign(stmt)
        finally:
            self.in_progress.discard(name)

    def _assign(self, stmt: g.Assign) -> None:
        name = stmt.target.identifier
        self.current_ann = stmt.annotation
        try:
            value = self.eval(stmt.value)
            ok = True
        except Failure as f:
            value = None
            ok = False
            if not f.expected:
                self.error_count += 1
        finally:
            self.current_ann = None
        if not ok:
            self.failed.add(name)
        self.env[name] = value
        secret = stmt.annotation is not None and stmt.annotation.base in ("Secret", "ExtractSecret")
        is_const = isinstance(stmt.value, (g.String, g.Number, g.Boolean, g.NoneLiteral))
        if not (stmt.target.is_local or secret or is_const):
            out = value
            if isinstance(out, _Rule):
                out = out.value
            elif isinstance(out, _Entity):
                out = out.id
            elif isinstance(out, _TimeDelta):
                out = float(out)
            if not isinstance(out, _Effect):
                self.features[name] = out if ok else None

    def _call_stmt(self, call: g.Call) -> None:
        if call.func == "Import":
            for p in sorted(set(self._const_list(call.kwargs["rules"]))):
                self.run_file(p)
            return
        if call.func == "Require":
            cond = True
            if "require_if" in call.kwargs:
                try:
                    cond = bool(self.eval(call.kwargs["require_if"]))
                except Failure:
                    cond = False
            node = call.kwargs["rule"]
            if isinstance(node, g.String):
                if cond:
                    self.run_file(node.value)
            elif isinstance(node, g.FormatString):
                try:
                    path = self._fstring(node)
                except Failure:
                    return
                glob_path = node.format_string.format(**{n.identifier: "*" for n in node.names})
                if cond and path in self.sources and fnmatch.fnmatch(path, glob_path):
                    self.run_file(path)
            return
        try:
            self.eval(call)
        except Failure as f:
            if not f.expected:
                self.error_count += 1

    def _const_list(self, node: g.Node) -> list:
        assert isinstance(node, g.ListLiteral)
        return [i.value for i in node.items]  # type: ignore[attr-defined]

    # -- expression evaluation ----------------------------------------------

    def eval(self, node: g.Node) -> Any:
        if isinstance(node, g.Name):
            if node.identifier not in self.env:
                self._ensure(node.identifier)
            if node.identifier not in self.env:
                raise Failure()
            # collapsed semantics: a failed feature IS a None value for
            # consumers (the columnar engine's contract — nulls are
            # failures; self.failed only drives error accounting)
            return self.env[node.identifier]
        if isinstance(node, (g.String, g.Number, g.Boolean)):
            return node.value
        if isinstance(node, g.NoneLiteral):
            return None
        if isinstance(node, g.ListLiteral):
            return [self.eval(i) for i in node.items]
        if isinstance(node, g.FormatString):
            return self._fstring(node)
        if isinstance(node, g.BinaryOp):
            return self._binop(node)
        if isinstance(node, g.Compare):
            return self._compare(node)
        if isinstance(node, g.BoolOp):
            vals = []
            for v in node.values:
                try:
                    vals.append(self.eval(v))
                except Failure:
                    vals.append(None)
            return all(vals) if node.op == "and" else any(vals)
        if isinstance(node, g.UnaryOp):
            if node.op == "not":
                # collapsed-failure contract: failed operand → None → True
                # (matches exprs.not_ and the and/or operand collapse)
                try:
                    v = self.eval(node.operand)
                except Failure:
                    v = None
                return not v
            v = self.eval(node.operand)
            if v is None:
                raise Failure()
            return -v if node.op == "-" else +v
        if isinstance(node, g.Call):
            return self._call(node)
        raise Failure()

    def _fstring(self, node: g.FormatString) -> str:
        vals = {}
        for n in node.names:
            vals[n.identifier] = self.eval(g.Name(span=node.span, identifier=n.identifier))
        return node.format_string.format(**vals)

    def _binop(self, node: g.BinaryOp) -> Any:
        # collapse at the operator boundary: a failed operand is a None
        # value (columnar null propagation), so e.g. failed // 0 == 0,
        # exactly like null // 0 in the Spark plan
        def resolve(n):
            try:
                return self.eval(n)
            except Failure:
                return None

        left = resolve(node.left)
        right = resolve(node.right)
        try:
            if node.op == "/":
                return 0 if right == 0 else left / right
            if node.op == "//":
                return 0 if right == 0 else left // right
            if node.op == "%":
                return 0 if right == 0 else left % right
            return {
                "+": lambda: left + right,
                "-": lambda: left - right,
                "*": lambda: left * right,
                "**": lambda: left**right,
                "<<": lambda: left << right,
                ">>": lambda: left >> right,
                "|": lambda: left | right,
                "&": lambda: left & right,
                "^": lambda: left ^ right,
            }[node.op]()
        except TypeError:
            raise Failure()

    def _compare(self, node: g.Compare) -> bool:
        """Comparison null semantics.

        Reference nuance (binary_comparison_executor.py:28-66): a *failed*
        operand poisons `<' comparisons while a legit-None yields False; in
        the columnar engine both are nulls, so comparisons uniformly yield
        False on null operands. The oracle models the engine's (documented)
        collapsed semantics: every operand resolves failure→None."""

        def resolve(n):
            try:
                return self.eval(n)
            except Failure:
                return None

        op = node.op
        left = resolve(node.left)
        right = resolve(node.right)
        if op in ("<", "<=", ">", ">="):
            if left is None or right is None:
                return False
            return {"<": left < right, "<=": left <= right, ">": left > right, ">=": left >= right}[op]
        if op == "==":
            return left == right
        if op == "!=":
            return left != right
        # in / not in (binary_comparison_executor.py:69-83)
        def _in(a, b):
            if a is None and (b is None or (isinstance(b, list) and None in b)):
                return True
            if a is None or b is None:
                return False
            return a in b

        return _in(left, right) if op == "in" else not _in(left, right)

    # -- UDF dispatch --------------------------------------------------------

    def _call(self, call: g.Call) -> Any:
        fn = getattr(self, f"_udf_{call.func.lower()}", None)
        if fn is None:
            raise Failure()
        try:
            return fn(call)
        except Failure:
            raise
        except (TypeError, AttributeError, ValueError):
            # a UDF raising is a failed node (executor.py: unexpected
            # exceptions poison the node and bump the error count)
            raise Failure()

    def _kw(self, call, name, default=...):
        if name not in call.kwargs:
            if default is ...:
                raise Failure()
            return default
        return self.eval(call.kwargs[name])

    def _udf_jsondata(self, call) -> Any:
        path = self._kw(call, "path")
        required = self._kw(call, "required", True)
        cur: Any = self.event
        for part in path[2:].split("."):
            if not isinstance(cur, dict) or part not in cur:
                cur = None
                break
            cur = cur[part]
        if cur is None:
            ann = self.current_ann
            optional = ann is not None and (
                ann.base == "Optional" or (ann.param is not None and ann.param.base == "Optional")
            )
            if required and not optional:
                raise Failure()
            return None
        ann = self.current_ann
        if ann is not None:
            base = ann.base if ann.base not in ("Optional", "Secret", "ExtractSecret", "Entity") else (
                ann.param.base if ann.param else "any"
            )
            try:
                if base == "int":
                    cur = int(cur)
                elif base == "float":
                    cur = float(cur)
                elif base == "str" and not isinstance(cur, str):
                    cur = str(cur)
                elif base == "bool":
                    cur = bool(cur)
            except (TypeError, ValueError):
                raise Failure()
        return cur

    def _udf_entity(self, call):
        return _Entity(self._kw(call, "type"), self._kw(call, "id"))

    def _udf_entityjson(self, call):
        return _Entity(self._kw(call, "type"), self._udf_jsondata(call))

    def _udf_getactionname(self, call):
        return self.event[self.action_name_key]

    def _udf_getactionid(self, call):
        return self.event.get("action_id")

    def _udf_rule(self, call):
        when_all = []
        for i in call.kwargs["when_all"].items:  # type: ignore[attr-defined]
            # collapsed-failure contract: failed condition → None → falsey
            try:
                when_all.append(self.eval(i))
            except Failure:
                when_all.append(None)
        desc_node = call.kwargs.get("description")
        desc = desc_node.value if isinstance(desc_node, g.String) else getattr(desc_node, "format_string", "")
        return _Rule(name="", value=all(when_all), description=desc)

    def _udf_whenrules(self, call):
        rules = []
        for item in call.kwargs["rules_any"].items:  # type: ignore[attr-defined]
            try:
                rules.append(self.eval(item))
            except Failure:
                pass
        effects = []
        for item in call.kwargs["then"].items:  # type: ignore[attr-defined]
            try:
                effects.append(self.eval(item))
            except Failure:
                pass
        if not any(r.value for r in rules if isinstance(r, _Rule)):
            return None
        for e in effects:
            if not isinstance(e, _Effect):
                continue
            if e.kind == "verdict":
                self.verdicts.append(e.verdict)
            elif e.kind in ("label_add", "label_remove"):
                self.mutations.append(f"{e.entity_type}/{e.label}/LabelStatus.{e.status_name}")
                rule_ok = (not e.has_apply_if) or (
                    isinstance(e.apply_if, _Rule) and e.apply_if.value
                )
                if not e.suppressed and rule_ok:
                    self.applied.append(
                        (e.entity_type, str(e.entity_id), e.label,
                         1 if e.kind == "label_add" else 0, e.expires_after)
                    )
            elif e.kind == "custom":
                self.custom.setdefault(e.custom_feature, []).append(e.custom_value)
        return None

    def _udf_declareverdict(self, call):
        return _Effect(kind="verdict", verdict=self._kw(call, "verdict"))

    def _label(self, call, kind):
        entity = self._kw(call, "entity")
        has_apply_if = "apply_if" in call.kwargs
        apply_if = None
        if has_apply_if:
            try:
                apply_if = self.eval(call.kwargs["apply_if"])
            except Failure:
                apply_if = None
        expires = self._kw(call, "expires_after", None)
        return _Effect(
            kind=kind,
            entity_type=entity.type,
            entity_id=entity.id,
            label=self._kw(call, "label"),
            status_name="ADDED" if kind == "label_add" else "REMOVED",
            expires_after=float(expires) if expires is not None else None,
            has_apply_if=has_apply_if,
            apply_if=apply_if,
        )

    def _udf_labeladd(self, call):
        return self._label(call, "label_add")

    def _udf_labelremove(self, call):
        return self._label(call, "label_remove")

    def _udf_banuser(self, call):
        entity = self._kw(call, "entity")
        comment = self._kw(call, "comment")
        eid = entity.id if isinstance(entity, _Entity) else entity
        return _Effect(kind="custom", custom_feature="ban_user", custom_value=f"{eid}|{comment}")

    def _udf_resolveoptional(self, call):
        try:
            v = self._kw(call, "value")
        except Failure:
            v = None
        return v if v is not None else self._kw(call, "default")

    def _udf_listlength(self, call):
        v = self._kw(call, "list")
        if v is None:
            raise Failure()
        return len(v)

    def _udf_listread(self, call):
        v = self._kw(call, "list")
        idx = self._kw(call, "index", 0)
        try:
            return str(v[idx])
        except (IndexError, TypeError):
            raise Failure(expected=True)

    def _udf_listsort(self, call):
        v = self._kw(call, "list")
        return sorted(v, reverse=bool(self._kw(call, "reverse", False)))

    def _udf_timedelta(self, call):
        secs = 0.0
        for unit, mult in (("weeks", 604800), ("days", 86400), ("hours", 3600), ("minutes", 60), ("seconds", 1)):
            secs += float(self._kw(call, unit, 0)) * mult
        return _TimeDelta(secs)

    def _udf_textcontains(self, call):
        text = self._kw(call, "text")
        phrase = self._kw(call, "phrase")
        cs = self._kw(call, "case_sensitive", False)
        if text is None:
            raise Failure()
        pat = r"\b" + re.escape(phrase) + r"\b"
        return bool(re.search(pat, text, 0 if cs else re.IGNORECASE))

    def _udf_stringlength(self, call):
        s = self._kw(call, "s")
        if s is None:
            raise Failure()
        return len(s)

    def _udf_stringtolower(self, call):
        s = self._kw(call, "s")
        if s is None:
            raise Failure()
        return s.lower()

    def _udf_stringtoupper(self, call):
        s = self._kw(call, "s")
        if s is None:
            raise Failure()
        return s.upper()

    def _udf_stringstartswith(self, call):
        return self._kw(call, "s").startswith(self._kw(call, "start"))

    def _udf_stringendswith(self, call):
        return self._kw(call, "s").endswith(self._kw(call, "end"))

    def _udf_stringstrip(self, call):
        return self._kw(call, "s").strip(self._kw(call, "chars", None))

    def _udf_stringlstrip(self, call):
        return self._kw(call, "s").lstrip(self._kw(call, "chars", None))

    def _udf_stringrstrip(self, call):
        return self._kw(call, "s").rstrip(self._kw(call, "chars", None))

    def _udf_stringreplace(self, call):
        return self._kw(call, "s").replace(self._kw(call, "old"), self._kw(call, "new"))

    def _udf_stringjoin(self, call):
        return self._kw(call, "s").join(self._kw(call, "iterable"))

    def _udf_stringsplit(self, call):
        return self._kw(call, "s").split(self._kw(call, "sep", None), self._kw(call, "maxsplit", -1))

    def _udf_stringslice(self, call):
        return self._kw(call, "s")[self._kw(call, "start"): self._kw(call, "end")]

    def _udf_regexmatch(self, call):
        target = self._kw(call, "target")
        pattern = self._kw(call, "pattern")
        ci = self._kw(call, "case_insensitive", False)
        if target is None:
            raise Failure()
        return bool(re.search(pattern, target, re.IGNORECASE if ci else 0))

    def _udf_countregexmatches(self, call):
        target = self._kw(call, "target")
        if target is None:
            raise Failure()
        return sum(1 for p in self._kw(call, "patterns") if re.search(p, target))

    def _udf_base64encode(self, call):
        return base64.b64encode(self._kw(call, "s").encode()).decode()

    def _udf_base64decode(self, call):
        return base64.b64decode(self._kw(call, "s")).decode()

    def _udf_hashmd5(self, call):
        return hashlib.md5(self._kw(call, "s").encode()).hexdigest()

    def _udf_hashsha1(self, call):
        return hashlib.sha1(self._kw(call, "s").encode()).hexdigest()

    def _udf_hashsha256(self, call):
        return hashlib.sha256(self._kw(call, "s").encode()).hexdigest()

    def _udf_hashsha512(self, call):
        return hashlib.sha512(self._kw(call, "s").encode()).hexdigest()

    def _udf_parseint(self, call):
        try:
            return int(self._kw(call, "value"))
        except (TypeError, ValueError):
            raise Failure(expected=True)

    def _udf_emaillocalpart(self, call):
        email = self._kw(call, "email")
        try:
            local, _ = email.rsplit("@", 1)
            return local
        except (ValueError, AttributeError):
            raise Failure(expected=True)

    def _udf_emailsubdomain(self, call):
        email = self._kw(call, "email")
        if email is None or "@" not in email:
            raise Failure(expected=True)
        return email.rsplit("@", 1)[1].lower()

    def _udf_phoneprefix(self, call):
        n = self._kw(call, "number")
        return n[: max(len(n) - 4, 0)]

    def _udf_gettimestampbucket(self, call):
        ts = self._kw(call, "timestamp")
        gran = self._kw(call, "granularity_seconds")
        return ts - (ts % gran)

    def _udf_gettimedeltabucket(self, call):
        td = int(self._kw(call, "timedelta"))
        gran = self._kw(call, "granularity_seconds")
        return td - (td % gran)

    def _udf_getsnowflakebucket(self, call):
        sf = self._kw(call, "snowflake")
        gran = self._kw(call, "granularity_seconds")
        secs = int(math.floor((sf >> 22) / 1000))
        return secs - (secs % gran)

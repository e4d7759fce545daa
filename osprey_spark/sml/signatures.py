"""Declarative kwarg signatures for every stdlib UDF — the data behind
the ValidateCallKwargs pass (reference
engine/ast_validator/validators/validate_call_kwargs.py:29 +
engine/udf/arguments.py:25-128: each call's kwargs are checked against
the UDF's argument spec BEFORE compilation, so a misspelled or missing
kwarg is a rendered validation error, not a compile-time KeyError).

Kept next to the registry semantics in ``stdlib.py``: ``required`` /
``optional`` mirror each builder's ``_arg``/``_const`` defaults;
``const`` marks kwargs the builder resolves at compile time (the
reference's ConstExpr arguments — must be a literal, or a Name that
resolves one layer deep to a literal assignment); ``lists`` must be
list literals; ``fstring_ok`` admits f-strings where the builder accepts
them (Rule descriptions, Require globs); ``extra_ok`` allows arbitrary
additional kwargs (ExperimentWhen's bucket names — the reference's
``is_extra_arguments_allowed``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class UdfSig:
    required: frozenset = frozenset()
    optional: frozenset = frozenset()
    const: frozenset = frozenset()
    lists: frozenset = frozenset()
    fstring_ok: frozenset = frozenset()
    extra_ok: bool = False

    @property
    def all_kwargs(self) -> frozenset:
        return self.required | self.optional


def _sig(req="", opt="", const="", lists="", fstr="", extra=False) -> UdfSig:
    s = lambda x: frozenset(x.split()) if x else frozenset()  # noqa: E731
    return UdfSig(s(req), s(opt), s(const), s(lists), s(fstr), extra)


SIGNATURES: dict[str, UdfSig] = {
    # engine / extraction
    "JsonData": _sig(req="path", opt="required", const="path required"),
    "Entity": _sig(req="type id", const="type"),
    "EntityJson": _sig(req="type path", opt="required", const="type path required"),
    "GetActionName": _sig(),
    "GetActionId": _sig(),
    "Rule": _sig(req="when_all description", lists="when_all", fstr="description"),
    "WhenRules": _sig(req="rules_any then", lists="rules_any then"),
    "DeclareVerdict": _sig(req="verdict", const="verdict"),
    "LabelAdd": _sig(req="entity label", opt="apply_if expires_after delay_action_by", const="label"),
    "LabelRemove": _sig(req="entity label", opt="apply_if expires_after delay_action_by", const="label"),
    "BanUser": _sig(req="entity comment"),
    "HasLabel": _sig(
        req="entity label",
        opt="status manual min_label_age error_on_empty",
        const="label status manual error_on_empty",
    ),
    "MXLookup": _sig(opt="domain"),
    "ResolveOptional": _sig(req="value default"),
    "ListLength": _sig(req="list"),
    "ListRead": _sig(req="list", opt="index", const="index"),
    "ListSort": _sig(req="list", opt="reverse", const="reverse"),
    "Import": _sig(req="rules", lists="rules"),
    "Require": _sig(req="rule", opt="require_if", fstr="rule"),
    # date / time
    "TimeDelta": _sig(opt="weeks days hours minutes seconds", const="weeks days hours minutes seconds"),
    "TimeSince": _sig(req="timestamp"),
    "GetTimedeltaBucket": _sig(req="timedelta granularity_seconds", const="granularity_seconds"),
    "GetTimestampBucket": _sig(req="timestamp granularity_seconds", const="granularity_seconds"),
    "GetSnowflakeBucket": _sig(req="snowflake granularity_seconds", const="granularity_seconds"),
    # strings
    "StringLength": _sig(req="s"),
    "StringToLower": _sig(req="s"),
    "StringToUpper": _sig(req="s"),
    "StringStartsWith": _sig(req="s start"),
    "StringEndsWith": _sig(req="s end"),
    "StringStrip": _sig(req="s", opt="chars", const="chars"),
    "StringLStrip": _sig(req="s", opt="chars", const="chars"),
    "StringRStrip": _sig(req="s", opt="chars", const="chars"),
    "StringReplace": _sig(req="s old new"),
    "StringJoin": _sig(req="s iterable", const="s"),
    "StringSplit": _sig(req="s", opt="sep maxsplit", const="sep maxsplit"),
    "StringSlice": _sig(req="s start end", const="start end"),
    "RegexMatch": _sig(req="target pattern", opt="case_insensitive", const="pattern case_insensitive"),
    "RegexMatchMap": _sig(
        req="target pattern", opt="case_insensitive mode", const="pattern case_insensitive mode"
    ),
    "CountRegexMatches": _sig(req="target patterns", const="patterns"),
    "TextContains": _sig(req="text phrase", opt="case_sensitive", const="phrase case_sensitive"),
    "Base64Encode": _sig(req="s"),
    "Base64Decode": _sig(req="s"),
    "HashMd5": _sig(req="s"),
    "HashSha1": _sig(req="s"),
    "HashSha256": _sig(req="s"),
    "HashSha512": _sig(req="s"),
    "ParseInt": _sig(req="value"),
    "StringClean": _sig(
        req="s",
        opt=(
            "form remove_emoji space l33t homoglyph unicode_normalize unidecode "
            "upper lower remove_space remove_punctuation"
        ),
        const=(
            "form remove_emoji space l33t homoglyph unicode_normalize unidecode "
            "upper lower remove_space remove_punctuation"
        ),
    ),
    "StringExtractDomains": _sig(req="s"),
    "StringExtractURLs": _sig(req="s"),
    # network / identity
    "EmailDomain": _sig(req="email"),
    "EmailLocalPart": _sig(req="email"),
    "EmailSubdomain": _sig(req="email"),
    "DomainTld": _sig(req="domain"),
    "DomainChopper": _sig(req="urls"),
    "PhoneCountry": _sig(req="number"),
    "PhonePrefix": _sig(req="number"),
    "IpNetwork": _sig(req="ip"),
    "ExtractCookie": _sig(req="cookies key", const="key"),
    # random / experiments
    "RandomBool": _sig(req="percentage_chance", const="percentage_chance"),
    "RandomInt": _sig(req="start end", const="start end"),
    "Experiment": _sig(
        req="entity buckets bucket_sizes",
        opt="version revision",
        const="buckets bucket_sizes version revision",
    ),
    "ExperimentWhen": _sig(req="experiment", extra=True),
}

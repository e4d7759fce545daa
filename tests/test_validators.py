"""Static-validation parity tests — ported from the reference's
ast_validator suites (validate_static_types.py transition tables,
unique_stored_names.py, variables_must_be_defined.py) with golden
rendered output in the reference's rustc-style format
(engine/ast/error_utils.py:48-57). No Spark session needed."""

import textwrap

import pytest

from osprey_spark.sml.validators import (
    ValidationFailed,
    render_all,
    validate_sources,
)


def _v(sml: str, **kw):
    return validate_sources({"main.sml": textwrap.dedent(sml)}, **kw)


def _errors(sml: str, **kw) -> str:
    with pytest.raises(ValidationFailed) as ei:
        _v(sml, **kw)
    return ei.value.rendered


# --- accept cases ------------------------------------------------------------


def test_valid_transitions_accept():
    _v("""
    A: int = JsonData(path='$.a')
    B: float = JsonData(path='$.b')
    S: str = JsonData(path='$.s')
    Sum = A + B
    Cat = S + 'x'
    Rep = S * 3
    Div = A / B
    Cmp = A < B
    InStr = 'a' in S
    InList = A in [1, 2, 3]
    Neg = -A
    Msg = f'{A} {S}'
    """)


def test_optional_narrowing_and_accepts():
    # validate_static_types.py:488-536 — X != None narrows X inside `and`
    _v("""
    X: Optional[int] = JsonData(path='$.x', required=False)
    Ok = X != None and X >= 90
    """)


def test_optional_narrowing_or_accepts():
    # for `or`: X == None narrows X for subsequent operands
    _v("""
    X: Optional[int] = JsonData(path='$.x', required=False)
    Ok = X == None or X >= 90
    """)


def test_equality_allows_optional_and_none():
    _v("""
    X: Optional[str] = JsonData(path='$.x', required=False)
    IsMissing = X == None
    Same = X == 'abc'
    """)


def test_imported_names_visible():
    validate_sources(
        {
            "main.sml": "Import(rules=['base.sml'])\nY = Base + 1\n",
            "base.sml": "Base: int = JsonData(path='$.b')\n",
        }
    )


# --- reject cases (golden messages) -------------------------------------------


def test_unnarrowed_optional_comparison_rejected():
    out = _errors("""
    X: Optional[int] = JsonData(path='$.x', required=False)
    Bad = X >= 90
    """)
    assert "unsupported operand types for `>=`" in out
    assert "no implementation for `int | None >= int`" in out


def test_str_lt_int_rejected():
    out = _errors("""
    S: str = JsonData(path='$.s')
    Bad = S < 3
    """)
    assert "unsupported operand types for `<`" in out
    assert "no implementation for `str < int`" in out


def test_str_plus_int_rejected():
    out = _errors("""
    S: str = JsonData(path='$.s')
    Bad = S + 1
    """)
    assert "unsupported operand types for `+`" in out
    assert "no implementation for `str + int`" in out


def test_incompatible_equality_rejected():
    out = _errors("""
    A: int = JsonData(path='$.a')
    S: str = JsonData(path='$.s')
    Bad = A == S
    """)
    assert "left and right sides have incompatible types" in out
    assert "comparison will always result in `False`" in out


def test_incompatible_not_equals_always_true():
    out = _errors("""
    A: int = JsonData(path='$.a')
    S: str = JsonData(path='$.s')
    Bad = A != S
    """)
    assert "comparison will always result in `True`" in out


def test_in_list_item_mismatch_rejected():
    out = _errors("""
    S: str = JsonData(path='$.s')
    Bad = S in [1, 2, 3]
    """)
    assert "item has incompatible type with list elements" in out
    assert "list items have type `int`" in out


def test_none_comparison_on_non_optional_warns():
    # warning only: passes normally, fails with warning_as_error
    entries = _v("""
    A: int = JsonData(path='$.a')
    Check = A == None
    """)
    assert any(e.kind == "warning" for e in entries)
    out = _errors(
        """
    A: int = JsonData(path='$.a')
    Check = A == None
    """,
        warning_as_error=True,
    )
    assert "incompatible with None" in out


def test_non_bool_boolop_operand_rejected():
    out = _errors("""
    A: int = JsonData(path='$.a')
    Bad = A and A > 3
    """)
    assert "unsupported operand type for `and`" in out
    assert "has type `int`, expected `bool`" in out


def test_not_on_non_bool_rejected():
    out = _errors("""
    S: str = JsonData(path='$.s')
    Bad = not S
    """)
    assert "`not` only works on `bool` types" in out


def test_unary_minus_on_str_rejected():
    out = _errors("""
    S: str = JsonData(path='$.s')
    Bad = -S
    """)
    assert "bad operand type for unary -" in out


def test_fstring_bad_substitution_rejected():
    out = _errors("""
    L = [1, 2, 3]
    Bad = f'list is {L}'
    """)
    assert "unsupported type for f-string substitution" in out


def test_duplicate_feature_rejected():
    with pytest.raises(ValidationFailed) as ei:
        validate_sources(
            {
                "main.sml": "X: int = JsonData(path='$.x')\n",
                "other.sml": "X: int = JsonData(path='$.x')\n",
            }
        )
    assert "features must be unique across all rule files" in ei.value.rendered
    assert "such as:" in ei.value.rendered


def test_unknown_identifier_did_you_mean():
    out = _errors("""
    UserScore: int = JsonData(path='$.s')
    Bad = UserScor + 1
    """)
    assert "unknown identifier" in out
    assert "perhaps you meant `UserScore`?" in out


def test_defined_but_not_imported():
    with pytest.raises(ValidationFailed) as ei:
        validate_sources(
            {
                "main.sml": "Y = Base + 1\n",
                "base.sml": "Base: int = JsonData(path='$.b')\n",
            }
        )
    out = ei.value.rendered
    assert "this identifier was not imported into this file" in out
    assert "however, it was found here:" in out


def test_golden_rendering_format():
    """The rustc-style rendering itself (error_utils.py:48-57): message,
    file:line:col pointer, gutter, source line, caret + hint."""
    sources = {"main.sml": "S: str = JsonData(path='$.s')\nBad = S + 1\n"}
    with pytest.raises(ValidationFailed) as ei:
        validate_sources(sources)
    golden = textwrap.dedent("""\
    error: unsupported operand types for `+`
     --> main.sml:2:6
      |
    2 | Bad = S + 1
      | ^ no implementation for `str + int`
     --> main.sml:2:6
      |
    2 | Bad = S + 1
      | ^ has type `str`
     --> main.sml:1:0
      |
    1 | S: str = JsonData(path='$.s')
      | ^ variable `S` with incompatible type `str` originally defined here
     --> main.sml:2:10
      |
    2 | Bad = S + 1
      | ^ has type `int`""")
    rendered = ei.value.rendered
    # the caret column for the main span depends on parser col info;
    # normalize caret indentation before comparing structure
    norm = "\n".join(
        line.rstrip() if set(line.strip()) <= {"^"} or "^" not in line
        else ("  | ^" + line.split("^", 1)[1]).rstrip()
        for line in rendered.splitlines()
    )
    assert norm == golden


def test_cross_feature_inferred_types():
    """Types flow through unannotated features: N is int (A+B), so
    N < 'x' must be rejected."""
    out = _errors("""
    A: int = JsonData(path='$.a')
    N = A + 2
    Bad = N < 'x'
    """)
    assert "unsupported operand types for `<`" in out
    assert "no implementation for `int < str`" in out


def test_unknown_udf_did_you_mean():
    out = _errors("""
    X = JsonDta(path='$.x')
    """)
    assert "unknown function `JsonDta`" in out
    assert "perhaps you meant `JsonData`?" in out


def test_custom_udf_returns_accepted():
    # extra_udf_returns registers plugin UDFs for validation
    from osprey_spark.sml.validators import V_BOOL

    validate_sources(
        {"main.sml": "X = MyPluginCheck(a='1')\n"},
        extra_udf_returns={"MyPluginCheck": V_BOOL},
    )

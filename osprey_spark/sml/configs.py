"""Ruleset config plane — the merged YAML config the reference ships
alongside rule sources (reference stdlib/configs/labels_config.py,
ast_validator context ``get_config_subkey``).

A ruleset's ``sources`` dict may carry a ``config.yaml`` (or
``config.yml``) entry next to the ``.sml`` files:

.. code-block:: yaml

    labels:
      flagged:
        valid_for: [Conversation]
        connotation: negative
        description: conversation was flagged by a rule
      trusted_user:
        valid_for: [User]
        connotation: positive

``parse_labels_config`` parses it WITH source spans (yaml.compose keeps
line/column marks) so validators can attach rustc-style secondary spans
pointing INTO the config ("add the label to the config here" — reference
validate_labels.py:56-66 uses ``closest_span_for_location`` the same
way). Unknown connotations and malformed shapes are reported as
validation entries, not exceptions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from osprey_spark.sml import nodes as g

CONFIG_FILES = ("config.yaml", "config.yml")
LABELS_CONFIG_SUBKEY = "labels"
CONNOTATIONS = ("positive", "negative", "neutral")


@dataclass
class LabelInfo:
    """reference LabelInfo (labels_config.py:26-29): valid_for entity
    types, connotation, description — plus the config spans validators
    point their secondary errors at."""

    valid_for: list[str] = field(default_factory=list)
    connotation: str = "neutral"
    description: str = ""
    key_span: Optional[g.Span] = None
    valid_for_span: Optional[g.Span] = None


@dataclass
class LabelsConfig:
    labels: dict[str, LabelInfo]
    labels_key_span: g.Span
    path: str


@dataclass
class ConfigError:
    message: str
    span: g.Span
    hint: str = ""


def config_path(sources: dict[str, str]) -> Optional[str]:
    for p in CONFIG_FILES:
        if p in sources:
            return p
    return None


def _span(path: str, node) -> g.Span:
    return g.Span(path, node.start_mark.line + 1, node.start_mark.column)


def parse_labels_config(
    sources: dict[str, str],
) -> tuple[Optional[LabelsConfig], list[ConfigError]]:
    """Parse the ``labels`` subkey of the ruleset config. Returns
    ``(config, errors)``; config is None when no config file is present
    or it has no ``labels`` key (validators then skip label checking —
    a ruleset without a config plane stays compilable)."""
    path = config_path(sources)
    if path is None:
        return None, []
    import yaml

    errors: list[ConfigError] = []
    try:
        root = yaml.compose(sources[path])
    except yaml.YAMLError as e:
        mark = getattr(e, "problem_mark", None)
        line = (mark.line + 1) if mark is not None else 1
        col = mark.column if mark is not None else 0
        return None, [ConfigError(f"malformed config: {e}", g.Span(path, line, col))]
    if root is None or not isinstance(root, yaml.MappingNode):
        return None, []

    labels_key = labels_val = None
    for k, v in root.value:
        if isinstance(k, yaml.ScalarNode) and k.value == LABELS_CONFIG_SUBKEY:
            labels_key, labels_val = k, v
            break
    if labels_key is None:
        return None, []
    labels_key_span = _span(path, labels_key)
    if not isinstance(labels_val, yaml.MappingNode):
        errors.append(
            ConfigError(
                "`labels` config must be a mapping of label name to settings",
                _span(path, labels_val if labels_val is not None else labels_key),
            )
        )
        return None, errors

    labels: dict[str, LabelInfo] = {}
    for name_node, body in labels_val.value:
        name = str(name_node.value)
        info = LabelInfo(key_span=_span(path, name_node))
        if isinstance(body, yaml.MappingNode):
            for fk, fv in body.value:
                fname = str(fk.value)
                if fname == "valid_for":
                    info.valid_for_span = _span(path, fv)
                    if isinstance(fv, yaml.SequenceNode):
                        info.valid_for = [str(i.value) for i in fv.value]
                    else:
                        errors.append(
                            ConfigError(
                                f"`valid_for` of label `{name}` must be a list "
                                "of entity types",
                                _span(path, fv),
                            )
                        )
                elif fname == "connotation":
                    val = str(fv.value)
                    if val not in CONNOTATIONS:
                        allowed = ", ".join(f"`{c}`" for c in CONNOTATIONS)
                        errors.append(
                            ConfigError(
                                f"unknown connotation `{val}` for label `{name}`",
                                _span(path, fv),
                                hint=f"expected one of: {allowed}",
                            )
                        )
                    else:
                        info.connotation = val
                elif fname == "description":
                    info.description = str(fv.value)
                else:
                    errors.append(
                        ConfigError(
                            f"unknown label setting `{fname}` for label `{name}`",
                            _span(path, fk),
                            hint="valid settings: `valid_for`, `connotation`, "
                            "`description`",
                        )
                    )
        elif body is not None and not (
            isinstance(body, yaml.ScalarNode) and body.value in ("", None)
        ):
            errors.append(
                ConfigError(
                    f"label `{name}` settings must be a mapping",
                    _span(path, body),
                )
            )
        labels[name] = info
    return LabelsConfig(labels=labels, labels_key_span=labels_key_span, path=path), errors

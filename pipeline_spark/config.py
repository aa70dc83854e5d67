"""Config loading: YAML/JSON text → templating → typed config model.

The reference loads a YAML/JSON config, renders it with FreeMarker using
CLI ``args.*`` parameters, then deserializes into source/transform/sink
config lists (reference: config/Config.java:294-360,461-486;
docs/config/README.md:120-167).  We use Jinja2 (public, idiomatic Python
substitute) with the same ``args.*`` namespace.

Module common attributes carried over verbatim (reference:
docs/config/README.md:44-96, config/ModuleConfig.java):
``name, module, parameters, inputs, sideInputs, waits, strategy, failFast,
ignore, schema, timestampAttribute, tags, loggings``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml


@dataclass
class ModuleConfig:
    name: str
    module: str
    kind: str  # source | transform | sink
    parameters: dict[str, Any] = field(default_factory=dict)
    inputs: list[str] = field(default_factory=list)
    side_inputs: list[str] = field(default_factory=list)
    waits: list[str] = field(default_factory=list)
    strategy: dict[str, Any] | None = None
    schema: dict[str, Any] | list[dict[str, Any]] | None = None
    timestamp_attribute: str | None = None
    tags: list[str] = field(default_factory=list)
    ignore: bool = False
    fail_fast: bool = True
    raw: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def parse(cls, d: dict[str, Any], kind: str) -> "ModuleConfig":
        return cls(
            name=d["name"],
            module=d["module"],
            kind=kind,
            parameters=d.get("parameters", {}) or {},
            inputs=_as_list(d.get("inputs") or d.get("input")),
            side_inputs=_as_list(d.get("sideInputs")),
            waits=_as_list(d.get("waits")),
            strategy=d.get("strategy"),
            schema=d.get("schema"),
            timestamp_attribute=d.get("timestampAttribute"),
            tags=_as_list(d.get("tags")),
            ignore=bool(d.get("ignore", False)),
            fail_fast=bool(d.get("failFast", True)),
            raw=d,
        )


def _as_list(v: Any) -> list[str]:
    if v is None:
        return []
    if isinstance(v, str):
        return [v]
    return list(v)


@dataclass
class Config:
    sources: list[ModuleConfig] = field(default_factory=list)
    transforms: list[ModuleConfig] = field(default_factory=list)
    sinks: list[ModuleConfig] = field(default_factory=list)
    failures: list[ModuleConfig] = field(default_factory=list)
    settings: dict[str, Any] = field(default_factory=dict)

    def modules(self) -> list[ModuleConfig]:
        # `failures` are dead-letter sinks (reference: module/FailureSink.java)
        # consuming a module's `.failures` output; they execute as sinks
        return [
            m
            for m in (*self.sources, *self.transforms, *self.sinks, *self.failures)
            if not m.ignore
        ]


def render_template(text: str, args: dict[str, Any] | None = None) -> str:
    """Render config text with Jinja2 using an ``args.*`` namespace.

    Mirrors the reference's FreeMarker templating of the whole config with
    ``args.*`` CLI parameters (reference: config/Config.java:294-360).
    """
    if "{{" not in text and "{%" not in text:
        return text
    import jinja2

    from pipeline_spark.functions.template_utils import UTILS

    env = jinja2.Environment(undefined=jinja2.StrictUndefined)
    return env.from_string(text).render(args=args or {}, utils=UTILS)


_ARGS_REF_RE = None


def _substitute_args_refs(text: str, args: dict[str, Any]) -> str:
    """Replace FreeMarker-style ``${args.name}`` references.

    The reference renders the whole config with FreeMarker and its
    exception handler re-emits unknown variables verbatim
    (TemplateUtil.java:383-420 ImputeSameVariablesTemplateExceptionHandler),
    so row templates like ``${field}`` survive config loading.  Mirrored
    here: only ``args.``-prefixed references substitute; anything else —
    including unknown args — passes through untouched.
    """
    import re as _re

    def repl(m):
        cur: Any = args
        for part in m.group(1).split("."):
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            else:
                return m.group(0)
        return str(cur)

    return _re.sub(r"\$\{\s*args\.([\w.]+)\s*\}", repl, text)


def _config_args_block(text: str) -> dict[str, Any]:
    """Extract the top-level ``args:`` defaults block (ConfigTest.testYaml:
    config-declared defaults that CLI args override)."""
    try:
        stripped = text.lstrip()
        doc = json.loads(text) if stripped.startswith("{") else yaml.safe_load(text)
        if isinstance(doc, dict) and isinstance(doc.get("args"), dict):
            return doc["args"]
    except Exception:
        pass
    return {}


def parse_config(
    text: str,
    args: dict[str, Any] | None = None,
    context: str | None = None,
) -> Config:
    merged_args = {**_config_args_block(text), **(args or {})}
    text = _substitute_args_refs(text, merged_args)
    rendered = render_template(text, merged_args)
    stripped = rendered.lstrip()
    if stripped.startswith("{"):
        doc = json.loads(rendered)
    else:
        doc = yaml.safe_load(rendered)
    if not isinstance(doc, dict):
        raise ValueError("config root must be a mapping with sources/transforms/sinks")
    cfg = Config(
        sources=[ModuleConfig.parse(d, "source") for d in doc.get("sources", [])],
        transforms=[ModuleConfig.parse(d, "transform") for d in doc.get("transforms", [])],
        sinks=[ModuleConfig.parse(d, "sink") for d in doc.get("sinks", [])],
        failures=[ModuleConfig.parse(d, "failure") for d in doc.get("failures", [])],
        settings=doc.get("settings", {}) or {},
    )
    if context:
        # tag-scoped runs: only modules carrying the active context tag
        # execute (reference: config/Config.java context handling,
        # ConfigTest.testTags — untagged modules are ignored too)
        for m in (*cfg.sources, *cfg.transforms, *cfg.sinks, *cfg.failures):
            if not m.ignore:
                m.ignore = context not in m.tags
    return cfg


def load_config(
    path: str | Path,
    args: dict[str, Any] | None = None,
    context: str | None = None,
) -> Config:
    return parse_config(Path(path).read_text(), args, context=context)

"""`scrub` transform: PII redaction over text columns.

Training-data-pipeline extension (BASELINE.json north star): corpora
headed for training need emails, phone numbers, IPs, and id numbers
masked.  Pure ``regexp_replace`` chains — whole-stage codegen, zero
Python, map-only at any scale.

The built-in patterns deliberately avoid lookarounds and engine-specific
syntax so the SAME pattern semantics hold in Spark (Java regex) and the
DuckDB oracle (RE2) — redaction output is bit-for-bit SQL-reproducible.

Built-ins (enable via ``kinds``; default all):
  email, phone (international-ish digit groups), ipv4, ssn (ddd-dd-dddd),
  credit_card (13-16 digit runs with optional separators), url
Custom rules: ``rules: [{pattern, replacement}]`` applied after built-ins.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module

# order matters: url before email would eat mailto-less addresses in
# queries; run email first, then url, then numerics (credit card before
# phone so long digit runs are not half-eaten as phone numbers)
BUILTIN_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s<>\"]+", "<URL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("credit_card", r"\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{1,4}\b", "<CC>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
]


def scrub_column(
    col: Column,
    kinds: list[str] | None = None,
    rules: list[dict[str, Any]] | None = None,
) -> Column:
    enabled = set(kinds) if kinds else {k for k, _, _ in BUILTIN_PATTERNS}
    unknown = enabled - {k for k, _, _ in BUILTIN_PATTERNS}
    if unknown:
        raise ValueError(f"scrub: unknown kinds {sorted(unknown)}")
    out = col
    for kind, pattern, repl in BUILTIN_PATTERNS:
        if kind in enabled:
            out = F.regexp_replace(out, pattern, repl)
    for rule in rules or []:
        out = F.regexp_replace(out, rule["pattern"], rule.get("replacement", "<REDACTED>"))
    return out


@module("scrub", kind=KIND_TRANSFORM)
def scrub_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    df = ctx.input
    fields = p.get("fields") or [p.get("field", "text")]
    kinds = p.get("kinds")
    rules = p.get("rules")
    out_suffix = p.get("outputSuffix", "")  # "" = redact in place
    for f in fields:
        df = df.withColumn(f + out_suffix, scrub_column(F.col(f), kinds, rules))
    return {"": df}

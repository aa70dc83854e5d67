"""Module registry.

The reference registers modules by classpath annotation scan
(reference: src/main/java/com/mercari/solution/module/Source.java:106-129,
same pattern in Transform.java / Sink.java).  Here a module is a plain
function decorated with ``@module("name", kind=...)``; the decorator records
it in a flat registry keyed by name.

A module function has the signature::

    fn(ctx: ModuleContext) -> dict[str, DataFrame]

where ``ctx`` carries the SparkSession, the module's resolved input
DataFrames, and its parameters.  Multi-output modules (e.g. partition) return
several named outputs; downstream modules address them as
``moduleName.outputName`` (reference: MPipeline.java:109-133).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

KIND_SOURCE = "source"
KIND_TRANSFORM = "transform"
KIND_SINK = "sink"


@dataclass
class ModuleContext:
    """Everything a module function needs at plan time."""

    spark: SparkSession
    name: str
    params: dict[str, Any]
    # ordered input DataFrames, matching the config's `inputs` list
    inputs: list[DataFrame] = field(default_factory=list)
    # input names parallel to `inputs` (for SQL view registration etc.)
    input_names: list[str] = field(default_factory=list)
    # side inputs (small, broadcastable) by name
    side_inputs: dict[str, DataFrame] = field(default_factory=dict)
    # raw module config (timestampAttribute, strategy, ...)
    config: dict[str, Any] = field(default_factory=dict)
    # callbacks the executor runs only after ALL sinks have materialized
    # successfully (reference: MicroBatch.java CheckpointSaveDoFn persists the
    # checkpoint after query results are emitted, not at plan time)
    post_commit: list[Callable[[], None]] = field(default_factory=list)

    def on_commit(self, fn: Callable[[], None]) -> None:
        """Defer ``fn`` until the whole pipeline run has succeeded."""
        self.post_commit.append(fn)

    @property
    def input(self) -> DataFrame:
        if not self.inputs:
            raise ValueError(f"module '{self.name}' has no inputs")
        return self.inputs[0]


@dataclass(frozen=True)
class ModuleSpec:
    name: str
    kind: str
    fn: Callable[[ModuleContext], dict[str, DataFrame]]


_REGISTRY: dict[tuple[str, str], ModuleSpec] = {}


def module(name: str, kind: str = KIND_TRANSFORM):
    """Register a module function under ``name``/``kind``."""

    def deco(fn: Callable[[ModuleContext], dict[str, DataFrame]]):
        _REGISTRY[(kind, name)] = ModuleSpec(name=name, kind=kind, fn=fn)
        return fn

    return deco


def get_module(name: str, kind: str) -> ModuleSpec:
    try:
        return _REGISTRY[(kind, name)]
    except KeyError:
        available = sorted(n for k, n in _REGISTRY if k == kind)
        raise KeyError(
            f"unknown {kind} module '{name}'; registered: {available}"
        ) from None


def registered_modules(kind: str | None = None) -> list[ModuleSpec]:
    return [s for (k, _), s in sorted(_REGISTRY.items()) if kind is None or k == kind]

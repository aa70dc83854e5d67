"""Sink modules (registration side effects on import)."""

from pipeline_spark.sinks import storage, debug  # noqa: F401

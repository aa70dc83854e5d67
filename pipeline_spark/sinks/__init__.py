"""Sink modules (registration side effects on import)."""

from pipeline_spark.sinks import storage, debug, memory, files, copyfile, jdbc, connectors, text, delta_native, warc, tableconvert, localdb, services  # noqa: F401

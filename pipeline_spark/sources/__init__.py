"""Source modules (registration side effects on import)."""

from pipeline_spark.sources import create, storage, files, jdbc, http, connectors, microbatch, delta_native, warc  # noqa: F401

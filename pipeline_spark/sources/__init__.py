"""Source modules (registration side effects on import)."""

from pipeline_spark.sources import create, storage, files, jdbc, http, connectors, microbatch  # noqa: F401

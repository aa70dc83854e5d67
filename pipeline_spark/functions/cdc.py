"""Format-agnostic CDC post-processing shared by the Delta CDF reader
and the Iceberg changelog reader."""

from __future__ import annotations

from pyspark.sql import functions as F


def compute_cdc_updates(out, names: list[str], id_cols: list[str],
                        meta_cols: list[str]):
    """Pair a key's ``delete`` + ``insert`` rows within one commit group
    (``meta_cols`` identify the group — version/snapshot/ordinal) into
    ``update_preimage`` / ``update_postimage`` rows, and DROP pairs whose
    data columns are byte-equal — the full-file-COW survivor noise — so
    the feed nets to true changes (Spark-Iceberg's compute-updates /
    delta-spark's update pairing).  Rows of any other change type pass
    through untouched.  ``names`` = the table columns; ``id_cols`` must
    be a subset."""
    bad = [c for c in id_cols if c not in names]
    if bad:
        raise ValueError(f"cdc: identifierColumns {bad} not in schema")
    data_cols = [c for c in names if c not in id_cols]
    on = id_cols + meta_cols
    keep = out.filter(~F.col("_change_type").isin("delete", "insert"))
    dd = out.filter(F.col("_change_type") == "delete").drop("_change_type")
    ii = out.filter(F.col("_change_type") == "insert").drop("_change_type")
    for c in data_cols:
        dd = dd.withColumnRenamed(c, f"__d_{c}")
        ii = ii.withColumnRenamed(c, f"__i_{c}")
    # presence flags survive the outer join via marker columns
    dd = dd.withColumn("__d__", F.lit(1))
    ii = ii.withColumn("__i__", F.lit(1))
    j = dd.join(ii, on=on, how="full_outer")
    d_side = F.col("__d__").isNotNull()
    i_side = F.col("__i__").isNotNull()
    unchanged = F.lit(True)
    for c in data_cols:
        unchanged = unchanged & F.col(f"__d_{c}").eqNullSafe(
            F.col(f"__i_{c}")
        )

    def _emit(ct, prefix):
        sel = [
            (F.col(f"{prefix}{c}") if c in data_cols else F.col(c)).alias(c)
            for c in names
        ]
        return sel + [F.lit(ct).alias("_change_type")] + [
            F.col(c) for c in meta_cols
        ]

    parts = [
        j.filter(d_side & ~i_side).select(*_emit("delete", "__d_")),
        j.filter(i_side & ~d_side).select(*_emit("insert", "__i_")),
        j.filter(d_side & i_side & ~unchanged).select(
            *_emit("update_preimage", "__d_")),
        j.filter(d_side & i_side & ~unchanged).select(
            *_emit("update_postimage", "__i_")),
    ]
    res = parts[0]
    for x in parts[1:]:
        res = res.unionByName(x)
    return res.unionByName(
        keep.select(*names, "_change_type", *meta_cols)
    )

"""Streaming support: watermarks, output modes, stateful per-key ops.

Reference streaming semantics (SURVEY §2.8): per-module ``strategy`` =
window + trigger + accumulationMode (reference: module/Strategy.java:15-55);
sources declare mode batch/streaming/microBatch (module/Source.java:34-40).

Spark mapping (documented divergences included):
  * window/trigger → ``F.window``/``session_window`` group keys +
    ``withWatermark``.  Processing-time EARLY FIRINGS (afterWatermark +
    earlyFiringTrigger afterProcessingTime, or bare afterProcessingTime)
    are emulated in triggers.py: update outputMode + ProcessingTime
    trigger + a foreachBatch pane ledger that stamps pane index/timing
    and produces per-pane deltas for discarding mode.  afterPane
    COUNT triggers ride the same ledger: a pane is withheld until its
    count aggregate (paneCountField) grows by >= elementCountAtLeast
    since the last firing, with a final ON_TIME flush at window close.
    Composite triggers (afterFirst/afterAll/afterEach over
    processing-time + count leaves) ride the same ledger: the trigger
    TREE is evaluated per pane against its current cycle (time since
    first element after the last firing, count growth since the last
    firing).  lateFiringTrigger gates LATE panes (post-ON_TIME updates);
    finalTrigger = orFinally (one last firing, then the pane closes).
    TWO BACKENDS: the default driver ledger (foreachBatch, exact
    drain-time flush) and ``paneStateBackend: executor`` (panes.py) —
    the 100×-scale path fusing the windowed aggregation and the pane
    ledger into ONE ``applyInPandasWithState`` operator whose state
    lives in Spark's checkpointed state store, with window closure via
    EventTimeTimeout timers on the REAL watermark.
  * allowedLateness → watermark delay.  Beam re-fires late panes; Spark
    drops post-watermark rows — a documented divergence
    (Strategy.java:69-71).  Inside the pane ledger's proxy-watermark
    window, late updates DO refire as LATE panes.
  * stateful buffers (OrderedListState + timers) →
    ``applyInPandasWithState`` (see state.py).
  * outputPaneInfo → a ``pane`` struct on aggregation output
    (firing_time, timing, index, is_first, is_last).  Batch matches Beam
    exactly (single ON_TIME pane, index 0).  Streaming approximates:
    firing_time = micro-batch timestamp, timing EARLY/ON_TIME by window
    end vs batch time; Beam's per-key firing INDEX needs pane state Spark
    doesn't expose — emitted null.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_spark.streaming import state  # noqa: F401


def ensure_event_time(df: DataFrame, ts_attr: str) -> DataFrame:
    """Normalize the event-time column to TIMESTAMP (session-TZ).

    Parquet writers commonly store timestamps with isAdjustedToUTC=false,
    which Spark 4 reads as TIMESTAMP_NTZ — and ``withWatermark`` rejects
    that type outright (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).  The
    reference treats timestampAttribute as "just a field"
    (module/Source.java:46-48), tolerating either encoding, so we cast
    NTZ (and DATE / ISO-string) event time to TIMESTAMP here, at the
    boundary where it becomes event time.  No-op when already TIMESTAMP
    or when the column is absent (e.g. resolves later in the plan).
    """
    if not ts_attr or ts_attr not in df.columns:
        return df
    dtype = df.schema[ts_attr].dataType
    if isinstance(dtype, T.TimestampType):
        return df
    if isinstance(dtype, (T.TimestampNTZType, T.DateType)):
        return df.withColumn(ts_attr, F.col(ts_attr).cast("timestamp"))
    if isinstance(dtype, T.StringType):
        return df.withColumn(ts_attr, F.to_timestamp(ts_attr))
    if isinstance(dtype, (T.LongType, T.IntegerType)):
        # epoch seconds — the reference's integer timestampAttribute case
        return df.withColumn(ts_attr, F.timestamp_seconds(F.col(ts_attr)))
    return df

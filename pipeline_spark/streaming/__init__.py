"""Streaming support: watermarks, output modes, stateful per-key ops.

Reference streaming semantics (SURVEY §2.8): per-module ``strategy`` =
window + trigger + accumulationMode (reference: module/Strategy.java:15-55);
sources declare mode batch/streaming/microBatch (module/Source.java:34-40).

Spark mapping (documented divergences included):
  * window/trigger → ``F.window``/``session_window`` group keys +
    ``withWatermark``; Beam's pane-accounting triggers (afterPane counts,
    early/late firings) have no Spark equivalent — accumulationMode maps to
    outputMode (discarding→append, accumulating→update) and
    processing-time triggers map to Trigger.ProcessingTime.
  * allowedLateness → watermark delay.  Beam re-fires late panes; Spark
    drops post-watermark rows — a documented divergence
    (Strategy.java:69-71).
  * stateful buffers (OrderedListState + timers) →
    ``applyInPandasWithState`` (see state.py).
  * outputPaneInfo → a ``pane`` struct on aggregation output
    (firing_time, timing, index, is_first, is_last).  Batch matches Beam
    exactly (single ON_TIME pane, index 0).  Streaming approximates:
    firing_time = micro-batch timestamp, timing EARLY/ON_TIME by window
    end vs batch time; Beam's per-key firing INDEX needs pane state Spark
    doesn't expose — emitted null.
"""

from pipeline_spark.streaming import state  # noqa: F401

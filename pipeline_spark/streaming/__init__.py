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
"""

from pipeline_spark.streaming import state  # noqa: F401

"""Cached JVM classpath probes.

``Class.forName`` through py4j costs ~5 driver→JVM round-trips (the
``_jvm.java.lang.Class`` attribute chain resolves via reflection
commands, then the call itself, then exception marshaling on a miss).
Connector modules probe on EVERY read/write, but the answer cannot
change within a JVM's lifetime — the driver classpath is fixed at JVM
start.  Cache per (gateway, class name): the gateway object identifies
the JVM (weakly referenced, so a fresh JVM/gateway starts a fresh cache),
and a long-lived session pays the reflection chain once per class.
"""

from __future__ import annotations

import weakref

from pyspark.sql import SparkSession

# {gateway -> {class name -> present}}; the gateway proxies __getattr__
# to the JVM, so the cache cannot live as an attribute ON it
_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def jvm_class_present(spark: SparkSession, cls: str) -> bool:
    """True when `cls` is loadable on the driver JVM's classpath."""
    gw = spark.sparkContext._gateway  # type: ignore[attr-defined]
    cache = _CACHE.get(gw)
    if cache is None:
        cache = {}
        _CACHE[gw] = cache
    hit = cache.get(cls)
    if hit is None:
        try:
            spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
            hit = True
        except Exception:
            hit = False
        cache[cls] = hit
    return hit

"""jvm_class_present: cached JVM classpath probe (r16 py4j-chatter cut).

The probe's answer is fixed for a JVM's lifetime, so the second call for
the same class must be a pure dict hit — zero py4j traffic — while a new
gateway (new JVM) starts a fresh cache.
"""

import py4j.clientserver
import pytest

from pipeline_spark.functions import jvmclass
from pipeline_spark.functions.jvmclass import jvm_class_present


def _count_py4j_calls(monkeypatch):
    counter = {"n": 0}
    orig = py4j.clientserver.ClientServerConnection.send_command

    def patched(self, command):
        counter["n"] += 1
        return orig(self, command)

    monkeypatch.setattr(
        py4j.clientserver.ClientServerConnection, "send_command", patched
    )
    return counter


def test_present_and_absent_answers(spark):
    assert jvm_class_present(spark, "java.lang.String") is True
    assert jvm_class_present(spark, "com.example.NoSuchClass") is False


def test_second_probe_is_free(spark, monkeypatch):
    gw = spark.sparkContext._gateway
    jvmclass._CACHE.setdefault(gw, {}).pop("java.lang.Object", None)
    jvm_class_present(spark, "java.lang.Object")  # prime (probes the JVM)
    counter = _count_py4j_calls(monkeypatch)
    assert jvm_class_present(spark, "java.lang.Object") is True
    assert counter["n"] == 0


def test_fresh_gateway_reprobes(spark):
    # the cache is keyed BY the gateway: wiping its entry simulates a new JVM
    gw = spark.sparkContext._gateway
    saved = jvmclass._CACHE.pop(gw, None)
    try:
        assert jvm_class_present(spark, "java.lang.Object") is True
        assert jvmclass._CACHE[gw]["java.lang.Object"] is True
    finally:
        if saved is not None:
            jvmclass._CACHE[gw] = saved


def test_require_class_error_preserved(spark):
    from pipeline_spark.registry import ModuleContext
    from pipeline_spark.sources.connectors import _require_class

    ctx = ModuleContext(spark=spark, name="t", params={})
    with pytest.raises(RuntimeError, match="requires its Spark connector"):
        _require_class(ctx, "spanner", "com.example.NoSuchConnector")

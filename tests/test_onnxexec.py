"""Numpy ONNX executor: a hand-encoded MLP checked against plain numpy.

The model bytes are assembled with the same wire encoder the protobuf
decoder tests use, from the public onnx.proto field numbers — so the
executor is validated against the spec, not against itself.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from pipeline_spark.functions.onnxexec import NumpyInferenceSession, OnnxGraph
from test_protodec import ld, tag, vi


def f32(fno: int, value: float) -> bytes:
    return tag(fno, 5) + struct.pack("<f", value)


def tensor(name: str, dims, values, dtype="f4") -> bytes:
    out = b"".join(vi(1, d) for d in dims)
    out += vi(2, 1 if dtype == "f4" else 7)
    out += ld(8, name.encode())
    out += ld(9, np.asarray(values, dtype=f"<{dtype}").tobytes())
    return out


def node(op: str, inputs, outputs, attrs=b"") -> bytes:
    out = b"".join(ld(1, i.encode()) for i in inputs)
    out += b"".join(ld(2, o.encode()) for o in outputs)
    out += ld(4, op.encode())
    out += attrs
    return out


def value_info(name: str) -> bytes:
    return ld(1, name.encode())


def build_mlp() -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    rng = np.random.RandomState(3)
    W = rng.randn(3, 2).astype(np.float32)
    b = rng.randn(2).astype(np.float32)
    W2 = rng.randn(2, 1).astype(np.float32)
    gemm_attrs = (
        ld(5, ld(1, b"alpha") + f32(2, 1.0))
        + ld(5, ld(1, b"beta") + f32(2, 1.0))
    )
    graph = (
        ld(1, node("Gemm", ["x", "W", "b"], ["h"], gemm_attrs))
        + ld(1, node("Relu", ["h"], ["hr"]))
        + ld(1, node("MatMul", ["hr", "W2"], ["z"]))
        + ld(1, node("Sigmoid", ["z"], ["y"]))
        + ld(2, b"mlp")
        + ld(5, tensor("W", W.shape, W))
        + ld(5, tensor("b", b.shape, b))
        + ld(5, tensor("W2", W2.shape, W2))
        + ld(11, value_info("x"))
        + ld(12, value_info("y"))
    )
    model = vi(1, 8) + ld(7, graph)  # ir_version + graph
    return model, W, b, W2


def expected(x, W, b, W2):
    h = np.maximum(x @ W + b, 0)
    return 1.0 / (1.0 + np.exp(-(h @ W2)))


def test_mlp_forward_matches_numpy():
    model, W, b, W2 = build_mlp()
    x = np.array([[0.5, -1.0, 2.0], [1.0, 1.0, 1.0]], dtype=np.float32)
    g = OnnxGraph(model)
    assert g.inputs == ["x"] and g.outputs == ["y"]
    (y,) = g.run({"x": x})
    np.testing.assert_allclose(y, expected(x, W, b, W2), rtol=1e-6)


def test_softmax_flatten_and_elementwise():
    graph = (
        ld(1, node("Mul", ["x", "x"], ["sq"]))
        + ld(1, node("Softmax", ["sq"], ["p"]))
        + ld(12, value_info("p"))
    )
    model = ld(7, graph)
    x = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    (p,) = OnnxGraph(model).run({"x": x})
    e = np.exp(x * x - np.max(x * x))
    np.testing.assert_allclose(p, e / e.sum(), rtol=1e-6)


def test_unsupported_op_names_the_op():
    model = ld(7, ld(1, node("Conv", ["x"], ["y"])))
    with pytest.raises(Exception, match="Conv"):
        OnnxGraph(model).run({"x": np.zeros((1, 1))})


def test_onnx_transform_e2e(spark, tmp_path):
    from pipeline_spark.operators.ml import onnx_transform
    from pipeline_spark.registry import ModuleContext

    model, W, b, W2 = build_mlp()
    path = tmp_path / "mlp.onnx"
    path.write_bytes(model)
    df = spark.createDataFrame(
        [Row(k=1, emb=[0.5, -1.0, 2.0]), Row(k=2, emb=[1.0, 1.0, 1.0])]
    )
    out = onnx_transform(
        ModuleContext(
            spark=spark,
            name="o",
            params={
                "model": str(path),
                "inputs": {"x": "emb"},
                "outputs": [{"name": "y", "type": "float32"}],
            },
            inputs=[df],
            input_names=["in"],
            side_inputs={},
        )
    )[""]
    rows = {r["k"]: np.array(r["y"]) for r in out.collect()}
    x = np.array([[0.5, -1.0, 2.0], [1.0, 1.0, 1.0]])
    exp = expected(x, W, b, W2)
    np.testing.assert_allclose(rows[1], exp[0], rtol=1e-5)
    np.testing.assert_allclose(rows[2], exp[1], rtol=1e-5)

"""Raw ONNX wire-format builders + the seeded test MLPs.

Protobuf varint / length-delimited primitives hand-rolled from the
PUBLIC ``onnx.proto`` field numbers (reference: module/transform/
ONNXTransform.java consumes real ONNX models; this repo's executor,
:mod:`pipeline_spark.functions.onnxexec`, parses the same wire format
natively).  Deliberately independent of the executor's own parser so
models built here validate it against the spec, not against itself.

ADVICE r14: the driver entry row (``__spark_entry__._build_mlp64_onnx``),
the examples fixture, and ``tests/test_onnxexec.py`` each carried their
own copy of these builders and of the seeded 64->16->1 scorer — three
definitions that could drift apart.  This module is the single source.
"""

from __future__ import annotations

import struct


def varint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        out += bytes([b7 | (0x80 if v else 0)])
        if not v:
            return out


def tag(fno: int, wt: int) -> bytes:
    return varint((fno << 3) | wt)


def vi(fno: int, v: int) -> bytes:
    return tag(fno, 0) + varint(v)


def ld(fno: int, payload: bytes) -> bytes:
    return tag(fno, 2) + varint(len(payload)) + payload


def f32(fno: int, value: float) -> bytes:
    return tag(fno, 5) + struct.pack("<f", value)


def tensor(name: str, dims, values, dtype: str = "f4") -> bytes:
    """onnx.proto TensorProto: dims(1) data_type(2) name(8) raw_data(9)."""
    import numpy as np

    out = b"".join(vi(1, d) for d in dims)
    out += vi(2, 1 if dtype == "f4" else 7)  # FLOAT / INT64
    out += ld(8, name.encode())
    out += ld(9, np.asarray(values, dtype=f"<{dtype}").tobytes())
    return out


def node(op: str, inputs, outputs, attrs: bytes = b"") -> bytes:
    """onnx.proto NodeProto: input(1) output(2) op_type(4) attribute(5)."""
    out = b"".join(ld(1, i.encode()) for i in inputs)
    out += b"".join(ld(2, o.encode()) for o in outputs)
    out += ld(4, op.encode())
    return out + attrs


def value_info(name: str) -> bytes:
    return ld(1, name.encode())


def model(graph: bytes, ir_version: int = 8) -> bytes:
    """onnx.proto ModelProto: ir_version(1) graph(7)."""
    return vi(1, ir_version) + ld(7, graph)


def build_mlp64() -> bytes:
    """The seeded 64->16->1 Gemm/Relu/MatMul/Sigmoid scorer used by the
    ``onnx_score`` driver oracle row and the onnx-score-embeddings
    example.  Weights are RandomState(7)-deterministic; the DuckDB
    oracle re-derives the forward pass from the same seed."""
    import numpy as np

    rng = np.random.RandomState(7)
    W = rng.randn(64, 16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    W2 = rng.randn(16, 1).astype(np.float32)
    gemm_attrs = (
        ld(5, ld(1, b"alpha") + f32(2, 1.0))
        + ld(5, ld(1, b"beta") + f32(2, 1.0))
    )
    graph = (
        ld(1, node("Gemm", ["x", "W", "b"], ["h"], gemm_attrs))
        + ld(1, node("Relu", ["h"], ["hr"]))
        + ld(1, node("MatMul", ["hr", "W2"], ["z"]))
        + ld(1, node("Sigmoid", ["z"], ["score"]))
        + ld(2, b"scorer")
        + ld(5, tensor("W", W.shape, W))
        + ld(5, tensor("b", b.shape, b))
        + ld(5, tensor("W2", W2.shape, W2))
        + ld(11, value_info("x"))
        + ld(12, value_info("score"))
    )
    return model(graph)

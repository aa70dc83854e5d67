"""Numpy executor for simple ONNX graphs (stdlib + numpy only).

onnxruntime is not installed in this container, so the ``onnx`` transform
falls back to this executor for MLP-class models — continuing the
zero-dependency fallback family (avro/protobuf wire decoders, PDF text).
The model file is protobuf; it is parsed with the same wire-format
primitives as functions/protodec.py using the PUBLIC onnx.proto field
numbers (https://github.com/onnx/onnx/blob/main/onnx/onnx.proto), no
descriptor needed.

Supported ops: MatMul, Gemm, Add, Sub, Mul, Div, Relu, Sigmoid, Tanh,
Softmax, Identity, Flatten, Constant.  That covers linear/MLP scoring
heads — embedding projections, quality classifiers, rerankers.  Anything
else raises a clear error naming the op; real models with conv/attention
belong to onnxruntime when it is installed.

Nodes execute in graph order (ONNX requires topological ordering).
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

from pipeline_spark.functions.protodec import ProtoError, _fields_map


def _s(b: bytes) -> str:
    return b.decode("utf-8")


_DTYPES = {
    1: np.float32,   # FLOAT
    6: np.int32,     # INT32
    7: np.int64,     # INT64
    11: np.float64,  # DOUBLE
}


def _varint_list(vals: list) -> list[int]:
    """Repeated int64 field values, tolerating both packed and unpacked."""
    from pipeline_spark.functions.protodec import _read_varint

    out: list[int] = []
    for v in vals:
        if isinstance(v, bytes):
            pos = 0
            while pos < len(v):
                d, pos = _read_varint(v, pos)
                out.append(d)
        else:
            out.append(v)
    return out


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    f = _fields_map(buf)
    dims = _varint_list(f.get(1, []))
    dtype_code = f.get(2, [1])[0]
    name = _s(f[8][0]) if 8 in f else ""
    np_dtype = _DTYPES.get(dtype_code)
    if np_dtype is None:
        raise ProtoError(f"onnx tensor '{name}': unsupported data_type {dtype_code}")
    if 9 in f:  # raw_data: little-endian per spec
        arr = np.frombuffer(f[9][0], dtype=np.dtype(np_dtype).newbyteorder("<"))
    elif 4 in f and dtype_code == 1:  # float_data: packed bytes, or (rare
        # unpacked form) raw fixed32 bit patterns that need reinterpreting
        parts = [
            np.frombuffer(b, dtype="<f4")
            if isinstance(b, bytes)
            else np.array([b], dtype=np.uint32).view(np.float32)
            for b in f[4]
        ]
        arr = np.concatenate(parts) if parts else np.zeros(0, dtype=np.float32)
    elif 7 in f and dtype_code == 7:  # packed int64_data (varints)
        vals: list[int] = []
        for b in f[7]:
            if isinstance(b, bytes):
                pos = 0
                from pipeline_spark.functions.protodec import _read_varint

                while pos < len(b):
                    v, pos = _read_varint(b, pos)
                    vals.append(v - (1 << 64) if v >= 1 << 63 else v)
            else:
                vals.append(b)
        arr = np.array(vals, dtype=np.int64)
    elif 10 in f and dtype_code == 11:  # packed double_data
        arr = np.concatenate([np.frombuffer(b, dtype="<f8") for b in f[10]])
    else:
        arr = np.zeros(0, dtype=np_dtype)
    return name, arr.astype(np_dtype).reshape(dims or [-1])


def _parse_attrs(bufs: list[bytes]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for buf in bufs:
        f = _fields_map(buf)
        name = _s(f[1][0]) if 1 in f else ""
        if 2 in f:  # float f (fixed32 bits)
            out[name] = struct.unpack("<f", int(f[2][0]).to_bytes(4, "little"))[0]
        elif 3 in f:  # int64 i
            v = f[3][0]
            out[name] = v - (1 << 64) if v >= 1 << 63 else v
        elif 5 in f:  # tensor t
            out[name] = _parse_tensor(f[5][0])[1]
        elif 7 in f:  # floats
            out[name] = [
                struct.unpack("<f", int(v).to_bytes(4, "little"))[0] for v in f[7]
            ]
        elif 8 in f:  # ints
            out[name] = list(f[8])
        elif 4 in f:  # bytes s
            out[name] = f[4][0]
    return out


class OnnxGraph:
    def __init__(self, model_bytes: bytes):
        model = _fields_map(model_bytes)
        if 7 not in model:
            raise ProtoError("onnx model has no graph")
        g = _fields_map(model[7][0])
        self.nodes = []
        for nb in g.get(1, []):
            nf = _fields_map(nb)
            self.nodes.append(
                {
                    "inputs": [_s(b) for b in nf.get(1, [])],
                    "outputs": [_s(b) for b in nf.get(2, [])],
                    "op": _s(nf[4][0]) if 4 in nf else "",
                    "attrs": _parse_attrs(nf.get(5, [])),
                }
            )
        self.initializers = dict(
            _parse_tensor(b) for b in g.get(5, [])
        )
        self.inputs = [
            _s(_fields_map(b)[1][0]) for b in g.get(11, []) if 1 in _fields_map(b)
        ]
        self.outputs = [
            _s(_fields_map(b)[1][0]) for b in g.get(12, []) if 1 in _fields_map(b)
        ]

    def run(self, feeds: dict[str, np.ndarray], outputs: list[str] | None = None):
        vals: dict[str, np.ndarray] = dict(self.initializers)
        vals.update({k: np.asarray(v) for k, v in feeds.items()})
        for node in self.nodes:
            op, a = node["op"], node["attrs"]
            x = [vals[i] for i in node["inputs"] if i]
            if op == "MatMul":
                r = x[0] @ x[1]
            elif op == "Gemm":
                A = x[0].T if a.get("transA") else x[0]
                B = x[1].T if a.get("transB") else x[1]
                r = a.get("alpha", 1.0) * (A @ B)
                if len(x) > 2:
                    r = r + a.get("beta", 1.0) * x[2]
            elif op == "Add":
                r = x[0] + x[1]
            elif op == "Sub":
                r = x[0] - x[1]
            elif op == "Mul":
                r = x[0] * x[1]
            elif op == "Div":
                r = x[0] / x[1]
            elif op == "Relu":
                r = np.maximum(x[0], 0)
            elif op == "Sigmoid":
                r = 1.0 / (1.0 + np.exp(-x[0]))
            elif op == "Tanh":
                r = np.tanh(x[0])
            elif op == "Softmax":
                axis = int(a.get("axis", -1))
                e = np.exp(x[0] - np.max(x[0], axis=axis, keepdims=True))
                r = e / np.sum(e, axis=axis, keepdims=True)
            elif op == "Identity":
                r = x[0]
            elif op == "Flatten":
                axis = int(a.get("axis", 1))
                shape = x[0].shape
                r = x[0].reshape(int(np.prod(shape[:axis]) or 1), -1)
            elif op == "Constant":
                r = a.get("value")
                if r is None:
                    raise ProtoError("Constant node without value tensor")
            else:
                raise ProtoError(
                    f"onnx op '{op}' not supported by the numpy fallback "
                    "(install onnxruntime for full coverage)"
                )
            outs = node["outputs"]
            if len(outs) == 1:
                vals[outs[0]] = np.asarray(r)
            else:
                for nm, rv in zip(outs, r):
                    vals[nm] = np.asarray(rv)
        wanted = outputs or self.outputs
        return [vals[n] for n in wanted]


class NumpyInferenceSession:
    """Duck-type of onnxruntime.InferenceSession for the supported subset."""

    def __init__(self, model_bytes: bytes):
        self.graph = OnnxGraph(model_bytes)

    def run(self, output_names, feeds):
        return self.graph.run(feeds, output_names)

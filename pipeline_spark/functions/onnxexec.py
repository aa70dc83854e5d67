"""Numpy executor for simple ONNX graphs (stdlib + numpy only).

onnxruntime is not installed in this container, so the ``onnx`` transform
falls back to this executor for MLP-class models — continuing the
zero-dependency fallback family (avro/protobuf wire decoders, PDF text).
The model file is protobuf; it is parsed with the same wire-format
primitives as functions/protodec.py using the PUBLIC onnx.proto field
numbers (https://github.com/onnx/onnx/blob/main/onnx/onnx.proto), no
descriptor needed.

Supported ops: MatMul, Gemm, Add, Sub, Mul, Div, Pow, Sqrt, Exp, Log,
Neg, Abs, Relu, LeakyRelu, Elu, Clip, Sigmoid, Tanh, Erf, Gelu, Softmax,
Identity, Flatten, Constant, ConstantOfShape, Conv (2D, groups/
dilations/pads), MaxPool, AveragePool, GlobalAveragePool,
BatchNormalization (inference), LayerNormalization, Reshape, Transpose,
Concat, Shape, Gather, Unsqueeze, Squeeze, Slice, Split, Expand, Cast,
Where, Equal, Greater, Less, ReduceMean, ReduceSum, ReduceMax,
ReduceMin, ReduceProd, ArgMax, ArgMin, TopK (stable tie-break),
variadic Min/Max/Sum/Mean, Floor, Ceil, Round (half-to-even),
Reciprocal, Softplus, HardSigmoid, PRelu, Not/And/Or/Xor, Mod, Tile,
Range, CumSum (exclusive/reverse), GatherElements, Pad (constant/
reflect/edge/wrap), LSTM, GRU, and the control-flow trio If / Loop /
Scan (subgraph attributes execute with ONNX nested-scope name
capture).  That covers linear/MLP scoring heads, small CNN-class models
(LeNet/VGG-style feature extractors), recurrent encoders, the building
blocks of transformer attention (MatMul+Softmax+LayerNorm+Gelu),
classification heads (ArgMax/TopK), and iterative/conditional graphs.
Anything else — training ops, ScatterND, string ops — raises a clear
error naming the op; those belong to onnxruntime when it is installed.

Nodes execute in graph order (ONNX requires topological ordering).
"""

from __future__ import annotations

import math
import struct
from typing import Any

import numpy as np

from pipeline_spark.functions.protodec import ProtoError, _fields_map


def _s(b: bytes) -> str:
    return b.decode("utf-8")


_DTYPES = {
    1: np.float32,   # FLOAT
    2: np.uint8,     # UINT8 (quantized activations)
    3: np.int8,      # INT8 (quantized weights)
    4: np.uint16,    # UINT16
    5: np.int16,     # INT16
    6: np.int32,     # INT32
    7: np.int64,     # INT64
    9: np.bool_,     # BOOL
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
    elif 5 in f and dtype_code in (2, 3, 4, 5, 6, 9):
        # int32_data: the proto's carrier for int8/uint8/int16/uint16/
        # int32/bool initializers (zero points, quantized weights)
        vals = _varint_list(f[5])
        # varints are the two's-complement int32 widened to uint64
        arr = np.array(
            [v - (1 << 64) if v >= 1 << 63 else v for v in vals],
            dtype=np.int64,
        ).astype(np.int32)
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
        elif 6 in f:  # subgraph g (If branches, Loop/Scan bodies)
            out[name] = _Graph(f[6][0])
        elif 4 in f:  # bytes s
            out[name] = f[4][0]
    return out


def _pool_window(X: np.ndarray, kernel: list[int], strides: list[int],
                 pads: list[int], dilations: list[int] | None = None,
                 pad_value: float = 0.0) -> np.ndarray:
    """NCHW → (N, C, oh, ow, kH, kW) strided window view (copy-free until
    the reduction).  ``pads`` is the ONNX order [top, left, bottom, right]."""
    from numpy.lib.stride_tricks import sliding_window_view

    dh, dw = dilations or [1, 1]
    kh, kw = kernel
    sh, sw = strides
    kh_eff, kw_eff = (kh - 1) * dh + 1, (kw - 1) * dw + 1
    pt, pl, pb, pr = pads
    if any(pads):
        X = np.pad(X, ((0, 0), (0, 0), (pt, pb), (pl, pr)),
                   constant_values=pad_value)
    win = sliding_window_view(X, (kh_eff, kw_eff), axis=(2, 3))
    return win[:, :, ::sh, ::sw, ::dh, ::dw]


def _resolve_pads(attrs: dict[str, Any], in_hw: tuple[int, int],
                  kernel: list[int], strides: list[int],
                  dilations: list[int]) -> list[int]:
    """Explicit pads, or SAME_UPPER/SAME_LOWER/VALID per the ONNX spec:
    SAME pads so out = ceil(in / stride), extra pixel at the end (UPPER)
    or start (LOWER)."""
    auto = attrs.get("auto_pad", b"NOTSET")
    auto = auto.decode() if isinstance(auto, bytes) else str(auto)
    if auto in ("NOTSET", ""):
        return [int(v) for v in attrs.get("pads", [0, 0, 0, 0])]
    if auto == "VALID":
        return [0, 0, 0, 0]
    if auto not in ("SAME_UPPER", "SAME_LOWER"):
        raise ProtoError(f"onnx: unknown auto_pad '{auto}'")
    pads = [0, 0, 0, 0]  # top, left, bottom, right
    for axis, (size, k, s, d) in enumerate(
        zip(in_hw, kernel, strides, dilations)
    ):
        eff_k = (k - 1) * d + 1
        out = -(-size // s)  # ceil
        total = max((out - 1) * s + eff_k - size, 0)
        small, big = total // 2, total - total // 2
        begin, end = (small, big) if auto == "SAME_UPPER" else (big, small)
        pads[axis] = begin
        pads[axis + 2] = end
    return pads


def _conv2d(X: np.ndarray, W: np.ndarray, B: np.ndarray | None,
            attrs: dict[str, Any]) -> np.ndarray:
    """ONNX Conv (2D, NCHW) via strided im2col + einsum — one BLAS-backed
    contraction per group instead of a Python loop over output pixels."""
    if X.ndim != 4 or W.ndim != 4:
        raise ProtoError("onnx Conv: only 2D (NCHW) convolutions supported")
    kh, kw = [int(v) for v in attrs.get("kernel_shape", W.shape[2:])]
    strides = [int(v) for v in attrs.get("strides", [1, 1])]
    dilations = [int(v) for v in attrs.get("dilations", [1, 1])]
    pads = _resolve_pads(attrs, X.shape[2:], [kh, kw], strides, dilations)
    group = int(attrs.get("group", 1))
    win = _pool_window(X, [kh, kw], strides, pads, dilations)
    n, c, oh, ow = win.shape[:4]
    m = W.shape[0]
    if group == 1:
        out = np.einsum("nchwij,mcij->nmhw", win, W, optimize=True)
    else:
        cg, mg = c // group, m // group
        parts = [
            np.einsum("nchwij,mcij->nmhw",
                      win[:, g * cg : (g + 1) * cg],
                      W[g * mg : (g + 1) * mg], optimize=True)
            for g in range(group)
        ]
        out = np.concatenate(parts, axis=1)
    if B is not None:
        out = out + B.reshape(1, -1, 1, 1)
    return out.astype(X.dtype, copy=False)


_CAST_DTYPES = {
    1: "<f4", 2: "u1", 3: "i1", 4: "<u2", 5: "<i2", 6: "<i4", 7: "<i8",
    9: "?", 10: "<f2", 11: "<f8", 12: "<u4", 13: "<u8",
}


def _erf(x: np.ndarray) -> np.ndarray:
    # exact vectorized erf via the stdlib (numpy has none without scipy);
    # models run this on small activations, not the hot data path
    return np.vectorize(math.erf, otypes=[np.float64])(
        np.asarray(x, dtype=np.float64)
    ).astype(np.asarray(x).dtype, copy=False)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _rnn_prep(x: list[np.ndarray], a: dict, n_gates: int):
    """Shared LSTM/GRU input unpacking per the ONNX spec: X [seq,batch,in]
    (layout 0) or [batch,seq,in] (layout 1), W [D,G*H,in], R [D,G*H,H],
    B [D,2*G*H]; returns per-direction iteration order too."""
    X, W, R = x[0], x[1], x[2]
    if int(a.get("layout", 0)) == 1:
        X = np.transpose(X, (1, 0, 2))
    seq, batch, _ = X.shape
    ndir, gh, _ = W.shape
    hidden = gh // n_gates
    B = x[3] if len(x) > 3 and x[3] is not None and np.size(x[3]) else None
    if B is None:
        B = np.zeros((ndir, 2 * n_gates * hidden), dtype=X.dtype)
    seq_lens = (
        np.asarray(x[4], dtype=np.int64)
        if len(x) > 4 and x[4] is not None and np.size(x[4])
        else np.full((batch,), seq, dtype=np.int64)
    )
    direction = str(a.get("direction", b"forward").decode()
                    if isinstance(a.get("direction"), bytes)
                    else a.get("direction", "forward"))
    dirs = {"forward": [False], "reverse": [True],
            "bidirectional": [False, True]}[direction]
    if len(dirs) != ndir:
        raise ProtoError(
            f"RNN direction '{direction}' expects {len(dirs)} weight "
            f"direction(s), got {ndir}"
        )
    return X, W, R, B, seq_lens, dirs, seq, batch, hidden


def _lstm(x: list[np.ndarray], a: dict) -> tuple:
    """ONNX LSTM (gate order iofc, optional peepholes, forward/reverse/
    bidirectional, sequence_lens masking).  Y is zero-padded past each
    batch row's length, matching onnxruntime."""
    X, W, R, B, seq_lens, dirs, seq, batch, H = _rnn_prep(x, a, 4)
    init_h = x[5] if len(x) > 5 and x[5] is not None and np.size(x[5]) else None
    init_c = x[6] if len(x) > 6 and x[6] is not None and np.size(x[6]) else None
    P = x[7] if len(x) > 7 and x[7] is not None and np.size(x[7]) else None
    Y = np.zeros((seq, len(dirs), batch, H), dtype=X.dtype)
    Yh = np.zeros((len(dirs), batch, H), dtype=X.dtype)
    Yc = np.zeros((len(dirs), batch, H), dtype=X.dtype)
    for d, rev in enumerate(dirs):
        Wi, Wo, Wf, Wc = (W[d][i * H:(i + 1) * H] for i in range(4))
        Ri, Ro, Rf, Rc = (R[d][i * H:(i + 1) * H] for i in range(4))
        b = B[d]
        bi, bo, bf, bc = (b[i * H:(i + 1) * H] + b[(4 + i) * H:(5 + i) * H]
                          for i in range(4))
        pi, po, pf = (
            (P[d][i * H:(i + 1) * H] for i in range(3))
            if P is not None
            else (np.zeros(H, X.dtype),) * 3
        )
        h = (init_h[d] if init_h is not None
             else np.zeros((batch, H), dtype=X.dtype)).copy()
        c = (init_c[d] if init_c is not None
             else np.zeros((batch, H), dtype=X.dtype)).copy()
        steps = range(seq - 1, -1, -1) if rev else range(seq)
        for t in steps:
            xt = X[t]
            # reverse direction starts each row at its own length
            alive = (
                (seq - 1 - t) < seq_lens if rev else t < seq_lens
            )[:, None]
            i_g = _sigmoid(xt @ Wi.T + h @ Ri.T + bi + pi * c)
            f_g = _sigmoid(xt @ Wf.T + h @ Rf.T + bf + pf * c)
            c_t = np.tanh(xt @ Wc.T + h @ Rc.T + bc)
            c_new = f_g * c + i_g * c_t
            o_g = _sigmoid(xt @ Wo.T + h @ Ro.T + bo + po * c_new)
            h_new = o_g * np.tanh(c_new)
            h = np.where(alive, h_new, h)
            c = np.where(alive, c_new, c)
            Y[t, d] = np.where(alive, h_new, 0)
        Yh[d], Yc[d] = h, c
    if int(a.get("layout", 0)) == 1:
        return (np.transpose(Y, (2, 0, 1, 3)), np.transpose(Yh, (1, 0, 2)),
                np.transpose(Yc, (1, 0, 2)))
    return Y, Yh, Yc


def _gru(x: list[np.ndarray], a: dict) -> tuple:
    """ONNX GRU (gate order zrh, linear_before_reset, directions,
    sequence_lens masking)."""
    X, W, R, B, seq_lens, dirs, seq, batch, H = _rnn_prep(x, a, 3)
    init_h = x[5] if len(x) > 5 and x[5] is not None and np.size(x[5]) else None
    lbr = int(a.get("linear_before_reset", 0))
    Y = np.zeros((seq, len(dirs), batch, H), dtype=X.dtype)
    Yh = np.zeros((len(dirs), batch, H), dtype=X.dtype)
    for d, rev in enumerate(dirs):
        Wz, Wr, Wh = (W[d][i * H:(i + 1) * H] for i in range(3))
        Rz, Rr, Rh = (R[d][i * H:(i + 1) * H] for i in range(3))
        b = B[d]
        wbz, wbr, wbh = (b[i * H:(i + 1) * H] for i in range(3))
        rbz, rbr, rbh = (b[(3 + i) * H:(4 + i) * H] for i in range(3))
        h = (init_h[d] if init_h is not None
             else np.zeros((batch, H), dtype=X.dtype)).copy()
        steps = range(seq - 1, -1, -1) if rev else range(seq)
        for t in steps:
            xt = X[t]
            alive = (
                (seq - 1 - t) < seq_lens if rev else t < seq_lens
            )[:, None]
            z = _sigmoid(xt @ Wz.T + h @ Rz.T + wbz + rbz)
            r_g = _sigmoid(xt @ Wr.T + h @ Rr.T + wbr + rbr)
            if lbr:
                h_t = np.tanh(xt @ Wh.T + r_g * (h @ Rh.T + rbh) + wbh)
            else:
                h_t = np.tanh(xt @ Wh.T + (r_g * h) @ Rh.T + rbh + wbh)
            h_new = (1 - z) * h_t + z * h
            h = np.where(alive, h_new, h)
            Y[t, d] = np.where(alive, h_new, 0)
        Yh[d] = h
    if int(a.get("layout", 0)) == 1:
        return np.transpose(Y, (2, 0, 1, 3)), np.transpose(Yh, (1, 0, 2))
    return Y, Yh


def _saturate(arr: np.ndarray, dtype) -> np.ndarray:
    info = np.iinfo(dtype)
    return np.clip(arr, info.min, info.max).astype(dtype)


def _zp_rows(zp, like: np.ndarray) -> np.ndarray:
    """Zero point aligned for subtraction from ``like``.

    Per-channel 1-D zero points align to the FIRST axis (ONNX: matmul A's
    rows, conv weights' output channels) — raw numpy broadcasting would
    silently align them to the LAST axis instead."""
    arr = np.asarray(zp, dtype=np.int32)
    if arr.ndim == 1 and arr.size > 1:
        return arr.reshape((-1,) + (1,) * (like.ndim - 1))
    return arr


def _axis_shape(scale: np.ndarray, like: np.ndarray, axis: int):
    """Broadcast a per-axis 1-D scale/zero-point along ``axis`` of x."""
    s = np.asarray(scale)
    if s.ndim == 1 and s.size > 1:
        shape = [1] * like.ndim
        shape[axis] = s.size
        return s.reshape(shape)
    return s


def _quantize_linear(x, scale, zp, axis):
    """y = saturate(round(x / scale) + zero_point), round half to even
    (np.rint), uint8 default when no zero point is given."""
    dtype = zp.dtype if zp is not None else np.uint8
    z = _axis_shape(zp, x, axis).astype(np.int32) if zp is not None else 0
    q = np.rint(x / _axis_shape(scale, x, axis)) + z
    return _saturate(q, dtype)


def _dequantize_linear(x, scale, zp, axis):
    z = _axis_shape(zp, x, axis).astype(np.int32) if zp is not None else 0
    return (
        (x.astype(np.int32) - z) * _axis_shape(scale, x, axis)
    ).astype(np.float32)


def _dynamic_quantize_linear(x):
    """Per-tensor uint8 dynamic quantization (ONNX spec formulas)."""
    xmin = min(float(x.min()), 0.0)
    xmax = max(float(x.max()), 0.0)
    scale = (xmax - xmin) / 255.0 or 1.0
    zp = int(np.clip(np.rint(-xmin / scale), 0, 255))
    y = _saturate(np.rint(x / scale) + zp, np.uint8)
    return (
        y,
        np.array(scale, dtype=np.float32),
        np.array(zp, dtype=np.uint8),
    )


class _Graph:
    """A parsed GraphProto: the top-level model graph or a control-flow
    subgraph (If branch, Loop/Scan body).  Subgraphs see the enclosing
    scope's values via ``outer`` (ONNX nested-scope name resolution)."""

    def __init__(self, graph_bytes: bytes):
        g = _fields_map(graph_bytes)
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

    def run(
        self,
        feeds: dict[str, np.ndarray],
        outputs: list[str] | None = None,
        outer: dict[str, np.ndarray] | None = None,
    ):
        vals: dict[str, np.ndarray] = dict(outer) if outer else {}
        vals.update(self.initializers)
        vals.update({k: np.asarray(v) for k, v in feeds.items()})
        for node in self.nodes:
            op, a = node["op"], node["attrs"]
            # "" marks an omitted OPTIONAL input — keep positions so e.g.
            # LSTM's sequence_lens stays at index 4 when B is omitted
            x = [vals[i] if i else None for i in node["inputs"]]
            while x and x[-1] is None:
                x.pop()
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
            elif op == "Conv":
                r = _conv2d(x[0], x[1], x[2] if len(x) > 2 else None, a)
            elif op == "MaxPool":
                kernel = [int(v) for v in a["kernel_shape"]]
                strides = [int(v) for v in a.get("strides", [1, 1])]
                dil = [int(v) for v in a.get("dilations", [1, 1])]
                pads = _resolve_pads(a, x[0].shape[2:], kernel, strides, dil)
                # pad with the dtype's own minimum: -inf cannot cast into
                # integer tensors
                pad_min = (
                    np.iinfo(x[0].dtype).min
                    if np.issubdtype(x[0].dtype, np.integer)
                    else -np.inf
                )
                win = _pool_window(x[0], kernel, strides, pads, dilations=dil,
                                   pad_value=pad_min)
                r = win.max(axis=(4, 5)).astype(x[0].dtype, copy=False)
            elif op == "AveragePool":
                kernel = [int(v) for v in a["kernel_shape"]]
                strides = [int(v) for v in a.get("strides", [1, 1])]
                pads = _resolve_pads(a, x[0].shape[2:], kernel, strides, [1, 1])
                win = _pool_window(x[0], kernel, strides, pads)
                if a.get("count_include_pad") or not any(pads):
                    r = win.mean(axis=(4, 5))
                else:
                    # divisor = count of non-pad cells under each window
                    ones = np.ones((1, 1, *x[0].shape[2:]), dtype=x[0].dtype)
                    cnt = _pool_window(ones, kernel, strides, pads).sum(axis=(4, 5))
                    r = win.sum(axis=(4, 5)) / cnt
                r = r.astype(x[0].dtype, copy=False)
            elif op == "GlobalAveragePool":
                r = x[0].mean(axis=tuple(range(2, x[0].ndim)), keepdims=True)
            elif op == "BatchNormalization":
                # inference form: scale, B, input_mean, input_var
                scale, bias, mean, var = x[1], x[2], x[3], x[4]
                eps = a.get("epsilon", 1e-5)
                shape = (1, -1) + (1,) * (x[0].ndim - 2)
                r = (x[0] - mean.reshape(shape)) / np.sqrt(
                    var.reshape(shape) + eps
                ) * scale.reshape(shape) + bias.reshape(shape)
            elif op == "Reshape":
                shape = [int(v) for v in x[1]]
                # ONNX: 0 = copy input dim, -1 = infer
                shape = [
                    x[0].shape[i] if v == 0 else v for i, v in enumerate(shape)
                ]
                r = x[0].reshape(shape)
            elif op == "Transpose":
                perm = [int(v) for v in a.get("perm", [])] or None
                r = np.transpose(x[0], perm)
            elif op == "Concat":
                r = np.concatenate(x, axis=int(a.get("axis", 0)))
            elif op == "Pow":
                r = np.power(x[0], x[1])
            elif op == "Sqrt":
                r = np.sqrt(x[0])
            elif op == "Exp":
                r = np.exp(x[0])
            elif op == "Log":
                r = np.log(x[0])
            elif op == "Neg":
                r = -x[0]
            elif op == "Abs":
                r = np.abs(x[0])
            elif op == "Erf":
                r = _erf(x[0])
            elif op == "Gelu":
                approx = a.get("approximate", b"none")
                approx = approx.decode() if isinstance(approx, bytes) else approx
                if approx == "tanh":
                    r = 0.5 * x[0] * (1.0 + np.tanh(
                        math.sqrt(2.0 / math.pi)
                        * (x[0] + 0.044715 * x[0] ** 3)
                    ))
                else:
                    r = 0.5 * x[0] * (1.0 + _erf(x[0] / math.sqrt(2.0)))
            elif op == "LeakyRelu":
                alpha = a.get("alpha", 0.01)
                r = np.where(x[0] >= 0, x[0], alpha * x[0])
            elif op == "Elu":
                alpha = a.get("alpha", 1.0)
                r = np.where(x[0] >= 0, x[0], alpha * (np.exp(x[0]) - 1))
            elif op == "Clip":
                lo = x[1] if len(x) > 1 else a.get("min")
                hi = x[2] if len(x) > 2 else a.get("max")
                r = np.clip(x[0], lo, hi)
            elif op == "Where":
                r = np.where(x[0], x[1], x[2])
            elif op == "Equal":
                r = x[0] == x[1]
            elif op == "Greater":
                r = x[0] > x[1]
            elif op == "Less":
                r = x[0] < x[1]
            elif op == "Cast":
                to = int(a.get("to", 1))
                if to not in _CAST_DTYPES:
                    raise ProtoError(f"Cast to onnx dtype {to} not supported")
                r = x[0].astype(np.dtype(_CAST_DTYPES[to]))
            elif op == "Shape":
                r = np.asarray(x[0].shape, dtype=np.int64)
            elif op == "Expand":
                r = x[0] * np.ones([int(v) for v in x[1]], dtype=x[0].dtype)
            elif op == "ConstantOfShape":
                fill = a.get("value")
                fill_v = fill.ravel()[0] if fill is not None else np.float32(0)
                r = np.full([int(v) for v in x[0]], fill_v)
            elif op == "Gather":
                r = np.take(x[0], x[1].astype(np.int64),
                            axis=int(a.get("axis", 0)))
            elif op == "Unsqueeze":
                axes = x[1] if len(x) > 1 else a.get("axes", [])
                r = x[0]
                for ax in sorted(int(v) for v in axes):
                    r = np.expand_dims(r, ax if ax >= 0 else ax + r.ndim + 1)
            elif op == "Squeeze":
                axes = x[1] if len(x) > 1 else a.get("axes", [])
                axes = tuple(int(v) for v in axes)
                r = np.squeeze(x[0], axis=axes or None)
            elif op == "Slice":
                # opset >= 10: starts/ends/axes/steps as inputs; opset 1:
                # starts/ends/axes attributes
                if len(x) > 1:
                    starts = [int(v) for v in x[1]]
                    ends = [int(v) for v in x[2]]
                    axes = ([int(v) for v in x[3]] if len(x) > 3
                            else list(range(len(starts))))
                    steps = ([int(v) for v in x[4]] if len(x) > 4
                             else [1] * len(starts))
                else:
                    starts = [int(v) for v in a.get("starts", [])]
                    ends = [int(v) for v in a.get("ends", [])]
                    axes = ([int(v) for v in a["axes"]] if "axes" in a
                            else list(range(len(starts))))
                    steps = [1] * len(starts)
                idx = [slice(None)] * x[0].ndim
                for s, e, ax, st in zip(starts, ends, axes, steps):
                    idx[ax] = slice(s, e, st)
                r = x[0][tuple(idx)]
            elif op == "Split":
                axis = int(a.get("axis", 0))
                n_out = len(node["outputs"])
                if len(x) > 1:
                    sizes = [int(v) for v in x[1]]
                elif "split" in a:
                    sizes = [int(v) for v in a["split"]]
                else:
                    dim = x[0].shape[axis]
                    q, rem = divmod(dim, n_out)
                    sizes = [q + (1 if i < rem else 0) for i in range(n_out)]
                r = list(np.split(x[0], np.cumsum(sizes)[:-1], axis=axis))
            elif op in ("ReduceMean", "ReduceSum"):
                axes = x[1] if len(x) > 1 else a.get("axes", [])
                axes = tuple(int(v) for v in axes) or None
                keep = bool(a.get("keepdims", 1))
                fn = np.mean if op == "ReduceMean" else np.sum
                r = fn(x[0], axis=axes, keepdims=keep)
                r = np.asarray(r, dtype=x[0].dtype)
            elif op in ("ReduceMax", "ReduceMin", "ReduceProd"):
                axes = x[1] if len(x) > 1 else a.get("axes", [])
                axes = tuple(int(v) for v in axes) or None
                keep = bool(a.get("keepdims", 1))
                fn = {"ReduceMax": np.max, "ReduceMin": np.min,
                      "ReduceProd": np.prod}[op]
                r = np.asarray(fn(x[0], axis=axes, keepdims=keep),
                               dtype=x[0].dtype)
            elif op in ("ArgMax", "ArgMin"):
                axis = int(a.get("axis", 0))
                keep = bool(a.get("keepdims", 1))
                fn = np.argmax if op == "ArgMax" else np.argmin
                if a.get("select_last_index"):
                    flipped = np.flip(x[0], axis=axis)
                    idx = fn(flipped, axis=axis)
                    idx = x[0].shape[axis] - 1 - idx
                else:
                    idx = fn(x[0], axis=axis)
                r = np.asarray(idx, dtype=np.int64)
                if keep:
                    r = np.expand_dims(r, axis)
            elif op == "TopK":
                k = int(np.asarray(x[1]).reshape(-1)[0])
                axis = int(a.get("axis", -1))
                largest = int(a.get("largest", 1))
                key = -x[0] if largest else x[0]
                # stable argsort: spec breaks value ties by ascending index
                idx = np.argsort(key, axis=axis, kind="stable")
                sl = [slice(None)] * x[0].ndim
                sl[axis] = slice(0, k)
                idx = idx[tuple(sl)]
                r = (np.take_along_axis(x[0], idx, axis=axis),
                     idx.astype(np.int64))
            elif op in ("Min", "Max", "Sum", "Mean"):
                fn = {"Min": np.minimum, "Max": np.maximum}.get(op)
                if fn is not None:
                    r = x[0]
                    for t in x[1:]:
                        r = fn(r, t)
                else:
                    r = x[0].astype(np.float64, copy=True)
                    for t in x[1:]:
                        r = r + t
                    if op == "Mean":
                        r = r / len(x)
                    r = r.astype(x[0].dtype, copy=False)
            elif op in ("Floor", "Ceil", "Round"):
                # Round = round-half-to-even per spec == np.rint
                fn = {"Floor": np.floor, "Ceil": np.ceil, "Round": np.rint}[op]
                r = fn(x[0]).astype(x[0].dtype, copy=False)
            elif op == "Reciprocal":
                r = 1.0 / x[0]
            elif op == "Softplus":
                r = np.log1p(np.exp(-np.abs(x[0]))) + np.maximum(x[0], 0)
            elif op == "HardSigmoid":
                alpha = float(a.get("alpha", 0.2))
                beta = float(a.get("beta", 0.5))
                r = np.clip(alpha * x[0] + beta, 0.0, 1.0).astype(
                    x[0].dtype, copy=False
                )
            elif op == "PRelu":
                r = np.where(x[0] >= 0, x[0], x[0] * x[1])
            elif op == "Not":
                r = ~np.asarray(x[0], dtype=bool)
            elif op in ("And", "Or", "Xor"):
                lhs = np.asarray(x[0], dtype=bool)
                rhs = np.asarray(x[1], dtype=bool)
                r = {"And": np.logical_and, "Or": np.logical_or,
                     "Xor": np.logical_xor}[op](lhs, rhs)
            elif op == "Mod":
                # fmod=1 -> C-style remainder (sign of dividend)
                r = np.fmod(x[0], x[1]) if a.get("fmod") else np.mod(x[0], x[1])
            elif op == "Tile":
                r = np.tile(x[0], [int(v) for v in x[1]])
            elif op == "Range":
                start, limit, delta = (np.asarray(v).reshape(-1)[0] for v in x[:3])
                # pin the output dtype to the inputs' — a bare np.arange
                # promotes float32->float64 and int32->int64
                r = np.arange(start, limit, delta, dtype=np.asarray(x[0]).dtype)
            elif op == "CumSum":
                axis = int(np.asarray(x[1]).reshape(-1)[0])
                r = x[0]
                if a.get("reverse"):
                    r = np.flip(r, axis=axis)
                if a.get("exclusive"):
                    c = np.cumsum(r, axis=axis)
                    pad_sl = [slice(None)] * r.ndim
                    pad_sl[axis] = slice(0, -1)
                    zeros_shape = list(r.shape)
                    zeros_shape[axis] = 1
                    c = np.concatenate(
                        [np.zeros(zeros_shape, dtype=c.dtype), c[tuple(pad_sl)]],
                        axis=axis,
                    )
                else:
                    c = np.cumsum(r, axis=axis)
                if a.get("reverse"):
                    c = np.flip(c, axis=axis)
                r = c.astype(x[0].dtype, copy=False)
            elif op == "GatherElements":
                r = np.take_along_axis(
                    x[0], x[1].astype(np.int64), axis=int(a.get("axis", 0))
                )
            elif op == "Pad":
                mode = a.get("mode", b"constant")
                mode = mode.decode() if isinstance(mode, bytes) else str(mode)
                if len(x) > 1:
                    pads = [int(v) for v in np.asarray(x[1]).reshape(-1)]
                    cval = (np.asarray(x[2]).reshape(-1)[0]
                            if len(x) > 2 and x[2] is not None else 0)
                    axes = ([int(v) for v in x[3]] if len(x) > 3
                            else list(range(x[0].ndim)))
                else:
                    pads = [int(v) for v in a.get("pads", [])]
                    cval = a.get("value", 0)
                    axes = list(range(x[0].ndim))
                nax = len(axes)
                width = [(0, 0)] * x[0].ndim
                for i, ax in enumerate(axes):
                    ax = ax if ax >= 0 else ax + x[0].ndim
                    width[ax] = (pads[i], pads[i + nax])
                np_mode = {"constant": "constant", "reflect": "reflect",
                           "edge": "edge", "wrap": "wrap"}.get(mode)
                if np_mode is None:
                    raise ProtoError(f"onnx Pad: unknown mode '{mode}'")
                # negative pads crop (spec, opset >= 11): slice first,
                # then np.pad the non-negative remainder
                crop = [slice(max(-b, 0), dim - max(-e, 0))
                        for (b, e), dim in zip(width, x[0].shape)]
                arr = x[0][tuple(crop)]
                width = [(max(b, 0), max(e, 0)) for b, e in width]
                if np_mode == "constant":
                    r = np.pad(arr, width, mode="constant",
                               constant_values=cval)
                else:
                    r = np.pad(arr, width, mode=np_mode)
            elif op == "LayerNormalization":
                axis = int(a.get("axis", -1))
                eps = a.get("epsilon", 1e-5)
                axes = tuple(range(axis if axis >= 0 else x[0].ndim + axis,
                                   x[0].ndim))
                mean = np.mean(x[0], axis=axes, keepdims=True)
                var = np.var(x[0], axis=axes, keepdims=True)
                inv = 1.0 / np.sqrt(var + eps)
                y = (x[0] - mean) * inv * x[1]
                if len(x) > 2:
                    y = y + x[2]
                r = (y, mean, inv) if len(node["outputs"]) > 1 else y
            elif op == "LSTM":
                r = _lstm(x, a)
            elif op == "GRU":
                r = _gru(x, a)
            elif op == "QuantizeLinear":
                r = _quantize_linear(
                    x[0], x[1],
                    x[2] if len(x) > 2 and x[2] is not None else None,
                    int(a.get("axis", 1)),
                )
            elif op == "DequantizeLinear":
                zp = x[2] if len(x) > 2 and x[2] is not None else None
                r = _dequantize_linear(x[0], x[1], zp, int(a.get("axis", 1)))
            elif op == "DynamicQuantizeLinear":
                r = _dynamic_quantize_linear(x[0])
            elif op == "MatMulInteger":
                a_zp = x[2] if len(x) > 2 and x[2] is not None else 0
                b_zp = x[3] if len(x) > 3 and x[3] is not None else 0
                r = (
                    (x[0].astype(np.int32) - _zp_rows(a_zp, x[0]))
                    @ (x[1].astype(np.int32) - np.asarray(b_zp, dtype=np.int32))
                )
            elif op == "QLinearMatMul":
                # a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp
                acc = (
                    (x[0].astype(np.int32) - _zp_rows(x[2], x[0]))
                    @ (x[3].astype(np.int32) - np.asarray(x[5], dtype=np.int32))
                )
                scale = (
                    x[1].astype(np.float64) * x[4].astype(np.float64)
                ) / x[6].astype(np.float64)
                r = _saturate(
                    np.rint(acc * scale) + x[7].astype(np.int32), x[7].dtype
                )
            elif op == "ConvInteger":
                x_zp = x[2] if len(x) > 2 and x[2] is not None else 0
                w_zp = x[3] if len(x) > 3 and x[3] is not None else 0
                r = _conv2d(
                    x[0].astype(np.int32) - np.asarray(x_zp, dtype=np.int32),
                    x[1].astype(np.int32) - _zp_rows(w_zp, x[1]),
                    None, a,
                )
            elif op == "QLinearConv":
                # x, x_scale, x_zp, w, w_scale, w_zp, y_scale, y_zp, [B]
                acc = _conv2d(
                    x[0].astype(np.int32) - np.asarray(x[2], dtype=np.int32),
                    x[3].astype(np.int32) - _zp_rows(x[5], x[3]),
                    x[8] if len(x) > 8 and x[8] is not None else None, a,
                )
                w_scale = x[4].astype(np.float64)
                if w_scale.ndim == 1 and w_scale.size > 1:  # per-out-channel
                    w_scale = w_scale.reshape(1, -1, 1, 1)
                scale = x[1].astype(np.float64) * w_scale / x[6].astype(
                    np.float64
                )
                r = _saturate(
                    np.rint(acc * scale) + x[7].astype(np.int32), x[7].dtype
                )
            elif op == "If":
                cond = bool(np.asarray(x[0]).reshape(()).item())
                branch = a["then_branch"] if cond else a["else_branch"]
                r = tuple(branch.run({}, outer=vals))
                if len(r) == 1:
                    r = r[0]
            elif op == "Loop":
                r = _run_loop(x, a, vals)
                if len(r) == 1:
                    r = r[0]
            elif op == "Scan":
                r = _run_scan(x, a, vals)
                if len(r) == 1:
                    r = r[0]
            else:
                raise ProtoError(
                    f"onnx op '{op}' not supported by the numpy fallback "
                    "(install onnxruntime for full coverage)"
                )
            outs = node["outputs"]
            if len(outs) == 1 or not isinstance(r, (tuple, list)):
                # single array result: bind to the first output only (e.g.
                # MaxPool may declare an optional Indices output we don't
                # produce — binding rows of the array to it would corrupt)
                vals[outs[0]] = np.asarray(r)
            else:
                for nm, rv in zip(outs, r):
                    if nm:  # "" marks an unused optional output
                        vals[nm] = np.asarray(rv)
        wanted = outputs or self.outputs
        return [vals[n] for n in wanted]


def _run_loop(x: list, a: dict, outer: dict) -> tuple:
    """ONNX Loop: generic while/for loop with carried deps + scan outputs.

    Node inputs: M (optional max trip count), cond (optional), then the
    initial loop-carried values.  Body graph inputs: (iter_num, cond_in,
    carried...); body outputs: (cond_out, carried..., scan...).  The
    node's outputs are the final carried values followed by the scan
    outputs stacked along a new axis 0."""
    body = a["body"]
    max_trips = (
        None if x[0] is None else int(np.asarray(x[0]).reshape(()).item())
    )
    cond = (
        True
        if len(x) < 2 or x[1] is None
        else bool(np.asarray(x[1]).reshape(()).item())
    )
    carried = [np.asarray(v) for v in x[2:]]
    n_carried = len(carried)
    n_scan = len(body.outputs) - 1 - n_carried
    if n_scan < 0:
        raise ProtoError("onnx Loop: body outputs fewer than carried inputs")
    scans: list[list[np.ndarray]] = [[] for _ in range(n_scan)]
    trips = 0
    while cond and (max_trips is None or trips < max_trips):
        feeds = {
            body.inputs[0]: np.array(trips, dtype=np.int64),
            body.inputs[1]: np.array(cond),
        }
        for name, v in zip(body.inputs[2:], carried):
            feeds[name] = v
        res = body.run(feeds, outer=outer)
        cond = bool(np.asarray(res[0]).reshape(()).item())
        carried = [np.asarray(v) for v in res[1 : 1 + n_carried]]
        for acc, v in zip(scans, res[1 + n_carried :]):
            acc.append(np.asarray(v))
        trips += 1
    stacked = [
        np.stack(acc) if acc else np.zeros((0,), dtype=np.float32)
        for acc in scans
    ]
    return tuple(carried + stacked)


def _run_scan(x: list, a: dict, outer: dict) -> tuple:
    """ONNX Scan: fold over slices of the scan inputs carrying state.

    Node inputs: initial state values, then num_scan_inputs sequences;
    body inputs mirror (state..., slice...); body outputs are
    (state..., scan_slice...), with slices stacked per scan_output_axes/
    directions."""
    body = a["body"]
    n_scan_in = int(a["num_scan_inputs"])
    n_state = len(x) - n_scan_in
    if n_state < 0:
        raise ProtoError("onnx Scan: num_scan_inputs exceeds node inputs")
    state = [np.asarray(v) for v in x[:n_state]]
    seqs = [np.asarray(v) for v in x[n_state:]]
    in_axes = [int(v) for v in a.get("scan_input_axes", [0] * n_scan_in)]
    in_dirs = [int(v) for v in a.get("scan_input_directions", [0] * n_scan_in)]
    n_scan_out = len(body.outputs) - n_state
    out_axes = [int(v) for v in a.get("scan_output_axes", [0] * n_scan_out)]
    out_dirs = [
        int(v) for v in a.get("scan_output_directions", [0] * n_scan_out)
    ]
    n_iter = seqs[0].shape[in_axes[0]] if seqs else 0
    collected: list[list[np.ndarray]] = [[] for _ in range(n_scan_out)]
    for t in range(n_iter):
        feeds: dict[str, np.ndarray] = {}
        for name, v in zip(body.inputs[:n_state], state):
            feeds[name] = v
        for k, (arr, ax, d) in enumerate(zip(seqs, in_axes, in_dirs)):
            idx = (n_iter - 1 - t) if d else t
            feeds[body.inputs[n_state + k]] = np.take(arr, idx, axis=ax)
        res = body.run(feeds, outer=outer)
        state = [np.asarray(v) for v in res[:n_state]]
        for acc, v in zip(collected, res[n_state:]):
            acc.append(np.asarray(v))
    outs = list(state)
    for acc, ax, d in zip(collected, out_axes, out_dirs):
        if d:
            acc = acc[::-1]
        outs.append(
            np.stack(acc, axis=ax)
            if acc
            else np.zeros((0,), dtype=np.float32)
        )
    return tuple(outs)


class OnnxGraph:
    """A parsed ModelProto ready to execute (wraps the top-level _Graph)."""

    def __init__(self, model_bytes: bytes):
        model = _fields_map(model_bytes)
        if 7 not in model:
            raise ProtoError("onnx model has no graph")
        self._g = _Graph(model[7][0])

    @property
    def inputs(self):
        return self._g.inputs

    @property
    def outputs(self):
        return self._g.outputs

    @property
    def initializers(self):
        return self._g.initializers

    def run(self, feeds: dict[str, np.ndarray], outputs: list[str] | None = None):
        return self._g.run(feeds, outputs)


class NumpyInferenceSession:
    """Duck-type of onnxruntime.InferenceSession for the supported subset."""

    def __init__(self, model_bytes: bytes):
        self.graph = OnnxGraph(model_bytes)

    def run(self, output_names, feeds):
        return self.graph.run(feeds, output_names)

"""Numpy ONNX executor: a hand-encoded MLP checked against plain numpy.

The model bytes are assembled with the shared hand-rolled wire encoder
(functions/onnxwire.py), built from the public onnx.proto field numbers
independently of the executor's parser — so the executor is validated
against the spec, not against itself.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from pipeline_spark.functions.onnxexec import NumpyInferenceSession, OnnxGraph
from pipeline_spark.functions.onnxwire import (  # noqa: F401
    f32,
    ld,
    node,
    tag,
    tensor,
    value_info,
    vi,
)


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
    model = ld(7, ld(1, node("ScatterND", ["x"], ["y"])))
    with pytest.raises(Exception, match="ScatterND"):
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


# ------------------------------------------------- conv / pooling ops

def ints_attr(name: str, values) -> bytes:
    body = ld(1, name.encode()) + b"".join(vi(8, int(v)) for v in values)
    return ld(5, body)


def int_attr(name: str, value: int) -> bytes:
    return ld(5, ld(1, name.encode()) + vi(3, int(value)))


def naive_conv2d(X, W, B, strides=(1, 1), pads=(0, 0, 0, 0), dilations=(1, 1), group=1):
    """Direct-loop reference conv, independent of the executor."""
    N, C, H, Wd = X.shape
    M, Cg, kH, kW = W.shape
    sh, sw = strides
    dh, dw = dilations
    pt, pl, pb, pr = pads
    Xp = np.pad(X, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    oh = (H + pt + pb - ((kH - 1) * dh + 1)) // sh + 1
    ow = (Wd + pl + pr - ((kW - 1) * dw + 1)) // sw + 1
    out = np.zeros((N, M, oh, ow), dtype=np.float64)
    mg = M // group
    for n in range(N):
        for m in range(M):
            g = m // mg
            for y in range(oh):
                for x_ in range(ow):
                    acc = 0.0
                    for c in range(Cg):
                        for i in range(kH):
                            for j in range(kW):
                                acc += (Xp[n, g * Cg + c, y * sh + i * dh, x_ * sw + j * dw]
                                        * W[m, c, i, j])
                    out[n, m, y, x_] = acc + (B[m] if B is not None else 0.0)
    return out.astype(np.float32)


def test_conv2d_matches_naive_loop():
    rng = np.random.RandomState(7)
    X = rng.randn(2, 4, 9, 8).astype(np.float32)
    W = rng.randn(6, 4, 3, 3).astype(np.float32)
    B = rng.randn(6).astype(np.float32)
    attrs = (ints_attr("kernel_shape", [3, 3]) + ints_attr("strides", [2, 1])
             + ints_attr("pads", [1, 0, 1, 0]) + ints_attr("dilations", [1, 2]))
    graph = (
        ld(1, node("Conv", ["x", "W", "B"], ["y"], attrs))
        + ld(2, b"conv")
        + ld(5, tensor("W", W.shape, W)) + ld(5, tensor("B", B.shape, B))
        + ld(11, value_info("x")) + ld(12, value_info("y"))
    )
    model = vi(1, 8) + ld(7, graph)
    (y,) = OnnxGraph(model).run({"x": X})
    np.testing.assert_allclose(
        y, naive_conv2d(X, W, B, (2, 1), (1, 0, 1, 0), (1, 2)), rtol=1e-4, atol=1e-5
    )


def test_grouped_conv():
    rng = np.random.RandomState(11)
    X = rng.randn(1, 4, 5, 5).astype(np.float32)
    W = rng.randn(8, 2, 3, 3).astype(np.float32)  # group=2: 4 in → 8 out
    attrs = ints_attr("kernel_shape", [3, 3]) + int_attr("group", 2)
    graph = (
        ld(1, node("Conv", ["x", "W"], ["y"], attrs))
        + ld(2, b"gconv") + ld(5, tensor("W", W.shape, W))
        + ld(11, value_info("x")) + ld(12, value_info("y"))
    )
    model = vi(1, 8) + ld(7, graph)
    (y,) = OnnxGraph(model).run({"x": X})
    np.testing.assert_allclose(
        y, naive_conv2d(X, W, None, group=2), rtol=1e-4, atol=1e-5
    )


def test_pool_bn_reshape_cnn_head():
    """A LeNet-ish chain: Conv → BN → Relu → MaxPool → AveragePool(pad) →
    GlobalAveragePool → Reshape → Gemm, all checked against plain numpy."""
    rng = np.random.RandomState(5)
    X = rng.randn(2, 3, 8, 8).astype(np.float32)
    W = rng.randn(4, 3, 3, 3).astype(np.float32)
    scale = rng.rand(4).astype(np.float32) + 0.5
    bias = rng.randn(4).astype(np.float32)
    mean = rng.randn(4).astype(np.float32)
    var = rng.rand(4).astype(np.float32) + 0.5
    Wfc = rng.randn(4, 2).astype(np.float32)
    graph = (
        ld(1, node("Conv", ["x", "W"], ["c"], ints_attr("kernel_shape", [3, 3])))
        + ld(1, node("BatchNormalization",
                     ["c", "scale", "bias", "mean", "var"], ["bn"]))
        + ld(1, node("Relu", ["bn"], ["r"]))
        + ld(1, node("MaxPool", ["r"], ["mp"],
                     ints_attr("kernel_shape", [2, 2]) + ints_attr("strides", [2, 2])))
        + ld(1, node("AveragePool", ["mp"], ["ap"],
                     ints_attr("kernel_shape", [2, 2]) + ints_attr("pads", [1, 1, 0, 0])))
        + ld(1, node("GlobalAveragePool", ["ap"], ["gap"]))
        + ld(1, node("Reshape", ["gap", "shape"], ["flat"]))
        + ld(1, node("MatMul", ["flat", "Wfc"], ["y"]))
        + ld(2, b"cnn")
        + ld(5, tensor("W", W.shape, W))
        + ld(5, tensor("scale", scale.shape, scale))
        + ld(5, tensor("bias", bias.shape, bias))
        + ld(5, tensor("mean", mean.shape, mean))
        + ld(5, tensor("var", var.shape, var))
        + ld(5, tensor("shape", [2], [0, -1], dtype="i8"))
        + ld(5, tensor("Wfc", Wfc.shape, Wfc))
        + ld(11, value_info("x")) + ld(12, value_info("y"))
    )
    model = vi(1, 8) + ld(7, graph)
    (y,) = OnnxGraph(model).run({"x": X})

    # plain-numpy expectation
    c = naive_conv2d(X, W, None)
    bn = (c - mean.reshape(1, -1, 1, 1)) / np.sqrt(var.reshape(1, -1, 1, 1) + 1e-5) \
        * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)
    r = np.maximum(bn, 0)
    mp = r.reshape(2, 4, 3, 2, 3, 2).max(axis=(3, 5))
    # avg pool k=2 s=1 pads [top=1,left=1,bottom=0,right=0], exclude pad
    ap = np.zeros((2, 4, 3, 3), dtype=np.float64)
    padded = np.pad(mp, ((0, 0), (0, 0), (1, 0), (1, 0)))
    counts = np.pad(np.ones_like(mp[0, 0]), ((1, 0), (1, 0)))
    for y_ in range(3):
        for x_ in range(3):
            ap[:, :, y_, x_] = (
                padded[:, :, y_ : y_ + 2, x_ : x_ + 2].sum(axis=(2, 3))
                / counts[y_ : y_ + 2, x_ : x_ + 2].sum()
            )
    gap = ap.mean(axis=(2, 3), keepdims=True)
    expected_y = gap.reshape(2, -1) @ Wfc
    np.testing.assert_allclose(y, expected_y, rtol=1e-4, atol=1e-5)


def test_transpose_concat():
    rng = np.random.RandomState(2)
    A = rng.randn(2, 3, 4).astype(np.float32)
    graph = (
        ld(1, node("Transpose", ["x"], ["t"], ints_attr("perm", [0, 2, 1])))
        + ld(1, node("Concat", ["t", "t"], ["y"], int_attr("axis", 2)))
        + ld(2, b"tc")
        + ld(11, value_info("x")) + ld(12, value_info("y"))
    )
    model = vi(1, 8) + ld(7, graph)
    (y,) = OnnxGraph(model).run({"x": A})
    t = np.transpose(A, (0, 2, 1))
    np.testing.assert_allclose(y, np.concatenate([t, t], axis=2))


def str_attr(name: str, value: str) -> bytes:
    return ld(5, ld(1, name.encode()) + ld(4, value.encode()))


def test_conv_auto_pad_same_upper():
    """SAME_UPPER: out = ceil(in/stride), asymmetric pad goes to the end."""
    rng = np.random.RandomState(1)
    X = rng.randn(1, 2, 7, 7).astype(np.float32)
    W = rng.randn(3, 2, 3, 3).astype(np.float32)
    attrs = (ints_attr("kernel_shape", [3, 3]) + ints_attr("strides", [2, 2])
             + str_attr("auto_pad", "SAME_UPPER"))
    graph = (
        ld(1, node("Conv", ["x", "W"], ["y"], attrs))
        + ld(2, b"sp") + ld(5, tensor("W", W.shape, W))
        + ld(11, value_info("x")) + ld(12, value_info("y"))
    )
    (y,) = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"x": X})
    # in=7 stride=2 k=3 → out=4, total pad = 3*2+3-7 = 2 → (1, 1)
    assert y.shape == (1, 3, 4, 4)
    np.testing.assert_allclose(
        y, naive_conv2d(X, W, None, (2, 2), (1, 1, 1, 1)), rtol=1e-4, atol=1e-5
    )


def test_maxpool_auto_pad_valid():
    X = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    attrs = (ints_attr("kernel_shape", [2, 2]) + ints_attr("strides", [2, 2])
             + str_attr("auto_pad", "VALID"))
    graph = (
        ld(1, node("MaxPool", ["x"], ["y"], attrs)) + ld(2, b"vp")
        + ld(11, value_info("x")) + ld(12, value_info("y"))
    )
    (y,) = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"x": X})
    assert y[0, 0].tolist() == [[5.0, 7.0], [13.0, 15.0]]


# ---------------------------------------------------------------------------
# recurrent cells + transformer building blocks (LSTM/GRU/LayerNorm/Gelu/
# attention composition), each checked against a naive direct-loop or
# closed-form numpy reference independent of the executor.


def _sig(v):
    return 1.0 / (1.0 + np.exp(-v))


def naive_lstm(X, W, R, B, seq_lens=None, init_h=None, init_c=None, rev=False):
    """Direct-loop single-direction LSTM per the ONNX spec (iofc order)."""
    seq, batch, _ = X.shape
    H = W.shape[0] // 4
    h = np.zeros((batch, H)) if init_h is None else init_h.astype(np.float64).copy()
    c = np.zeros((batch, H)) if init_c is None else init_c.astype(np.float64).copy()
    if seq_lens is None:
        seq_lens = np.full(batch, seq)
    Wi, Wo, Wf, Wc = (W[i * H:(i + 1) * H].astype(np.float64) for i in range(4))
    Ri, Ro, Rf, Rc = (R[i * H:(i + 1) * H].astype(np.float64) for i in range(4))
    bi, bo, bf, bc = (
        (B[i * H:(i + 1) * H] + B[(4 + i) * H:(5 + i) * H]).astype(np.float64)
        for i in range(4)
    )
    Y = np.zeros((seq, batch, H))
    steps = range(seq - 1, -1, -1) if rev else range(seq)
    for t in steps:
        for b in range(batch):
            pos = seq - 1 - t if rev else t
            if pos >= seq_lens[b]:
                continue
            xt = X[t, b].astype(np.float64)
            i_g = _sig(Wi @ xt + Ri @ h[b] + bi)
            f_g = _sig(Wf @ xt + Rf @ h[b] + bf)
            c_t = np.tanh(Wc @ xt + Rc @ h[b] + bc)
            c[b] = f_g * c[b] + i_g * c_t
            o_g = _sig(Wo @ xt + Ro @ h[b] + bo)
            h[b] = o_g * np.tanh(c[b])
            Y[t, b] = h[b]
    return Y, h, c


def naive_gru(X, W, R, B, lbr=0):
    seq, batch, _ = X.shape
    H = W.shape[0] // 3
    h = np.zeros((batch, H))
    Wz, Wr, Wh = (W[i * H:(i + 1) * H].astype(np.float64) for i in range(3))
    Rz, Rr, Rh = (R[i * H:(i + 1) * H].astype(np.float64) for i in range(3))
    wbz, wbr, wbh = (B[i * H:(i + 1) * H].astype(np.float64) for i in range(3))
    rbz, rbr, rbh = (B[(3 + i) * H:(4 + i) * H].astype(np.float64) for i in range(3))
    Y = np.zeros((seq, batch, H))
    for t in range(seq):
        for b in range(batch):
            xt = X[t, b].astype(np.float64)
            z = _sig(Wz @ xt + Rz @ h[b] + wbz + rbz)
            r = _sig(Wr @ xt + Rr @ h[b] + wbr + rbr)
            if lbr:
                ht = np.tanh(Wh @ xt + r * (Rh @ h[b] + rbh) + wbh)
            else:
                ht = np.tanh(Wh @ xt + Rh @ (r * h[b]) + rbh + wbh)
            h[b] = (1 - z) * ht + z * h[b]
            Y[t, b] = h[b]
    return Y, h


def _lstm_model(W, R, B, direction="forward", extra_inputs=()):
    attrs = int_attr("hidden_size", W.shape[1] // 4) + str_attr(
        "direction", direction
    )
    ins = ["x", "W", "R", "B", *extra_inputs]
    graph = (
        ld(1, node("LSTM", ins, ["Y", "Y_h", "Y_c"], attrs))
        + ld(2, b"lstm")
        + ld(5, tensor("W", W.shape, W))
        + ld(5, tensor("R", R.shape, R))
        + ld(5, tensor("B", B.shape, B))
        + ld(11, value_info("x"))
        + ld(12, value_info("Y")) + ld(12, value_info("Y_h"))
        + ld(12, value_info("Y_c"))
    )
    return vi(1, 8) + ld(7, graph)


def test_lstm_forward_matches_naive_loop():
    rng = np.random.RandomState(7)
    seq, batch, inp, H = 4, 2, 3, 2
    X = rng.randn(seq, batch, inp).astype(np.float32)
    W = rng.randn(1, 4 * H, inp).astype(np.float32)
    R = rng.randn(1, 4 * H, H).astype(np.float32)
    B = rng.randn(1, 8 * H).astype(np.float32)
    Y, Yh, Yc = OnnxGraph(_lstm_model(W, R, B)).run({"x": X})
    nY, nh, nc = naive_lstm(X, W[0], R[0], B[0])
    assert Y.shape == (seq, 1, batch, H)
    np.testing.assert_allclose(Y[:, 0], nY, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Yh[0], nh, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Yc[0], nc, rtol=1e-4, atol=1e-5)


def test_lstm_bidirectional_with_sequence_lens():
    rng = np.random.RandomState(11)
    seq, batch, inp, H = 5, 3, 2, 2
    X = rng.randn(seq, batch, inp).astype(np.float32)
    W = rng.randn(2, 4 * H, inp).astype(np.float32)
    R = rng.randn(2, 4 * H, H).astype(np.float32)
    B = rng.randn(2, 8 * H).astype(np.float32)
    lens = np.array([5, 3, 4], dtype=np.int32)
    model = _lstm_model(W, R, B, direction="bidirectional",
                        extra_inputs=("lens",))
    Y, Yh, Yc = OnnxGraph(model).run({"x": X, "lens": lens})
    fY, fh, fc = naive_lstm(X, W[0], R[0], B[0], seq_lens=lens)
    rY, rh, rc = naive_lstm(X, W[1], R[1], B[1], seq_lens=lens, rev=True)
    np.testing.assert_allclose(Y[:, 0], fY, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Y[:, 1], rY, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Yh[0], fh, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Yh[1], rh, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Yc[1], rc, rtol=1e-4, atol=1e-5)
    # Y zero-padded past each row's length (forward direction)
    assert np.all(Y[3:, 0, 1] == 0) and np.all(Y[4:, 0, 2] == 0)


@pytest.mark.parametrize("lbr", [0, 1])
def test_gru_matches_naive_loop(lbr):
    rng = np.random.RandomState(5)
    seq, batch, inp, H = 4, 2, 3, 2
    X = rng.randn(seq, batch, inp).astype(np.float32)
    W = rng.randn(1, 3 * H, inp).astype(np.float32)
    R = rng.randn(1, 3 * H, H).astype(np.float32)
    B = rng.randn(1, 6 * H).astype(np.float32)
    attrs = (int_attr("hidden_size", H)
             + int_attr("linear_before_reset", lbr))
    graph = (
        ld(1, node("GRU", ["x", "W", "R", "B"], ["Y", "Y_h"], attrs))
        + ld(2, b"gru")
        + ld(5, tensor("W", W.shape, W)) + ld(5, tensor("R", R.shape, R))
        + ld(5, tensor("B", B.shape, B))
        + ld(11, value_info("x"))
        + ld(12, value_info("Y")) + ld(12, value_info("Y_h"))
    )
    Y, Yh = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"x": X})
    nY, nh = naive_gru(X, W[0], R[0], B[0], lbr=lbr)
    np.testing.assert_allclose(Y[:, 0], nY, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Yh[0], nh, rtol=1e-4, atol=1e-5)


def test_layernorm_gelu_block():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4).astype(np.float32)
    scale = rng.randn(4).astype(np.float32)
    bias = rng.randn(4).astype(np.float32)
    graph = (
        ld(1, node("LayerNormalization", ["x", "s", "b"], ["h"]))
        + ld(1, node("Gelu", ["h"], ["y"]))
        + ld(2, b"ln")
        + ld(5, tensor("s", scale.shape, scale))
        + ld(5, tensor("b", bias.shape, bias))
        + ld(11, value_info("x")) + ld(12, value_info("y"))
    )
    (y,) = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"x": x})
    import math as m

    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    h = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
    erf = np.vectorize(m.erf)
    expect = 0.5 * h * (1.0 + erf(h / m.sqrt(2.0)))
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-5)


def test_self_attention_composition():
    """Single-head self-attention assembled from MatMul/Transpose/Mul/
    Softmax — the transformer block the executor now covers."""
    rng = np.random.RandomState(9)
    T_, D = 3, 4
    x = rng.randn(T_, D).astype(np.float32)
    Wq = rng.randn(D, D).astype(np.float32)
    Wk = rng.randn(D, D).astype(np.float32)
    Wv = rng.randn(D, D).astype(np.float32)
    scale = np.float32(1.0 / np.sqrt(D))
    graph = (
        ld(1, node("MatMul", ["x", "Wq"], ["q"]))
        + ld(1, node("MatMul", ["x", "Wk"], ["k"]))
        + ld(1, node("MatMul", ["x", "Wv"], ["v"]))
        + ld(1, node("Transpose", ["k"], ["kT"]))
        + ld(1, node("MatMul", ["q", "kT"], ["qk"]))
        + ld(1, node("Mul", ["qk", "scale"], ["scores"]))
        + ld(1, node("Softmax", ["scores"], ["attn"]))
        + ld(1, node("MatMul", ["attn", "v"], ["y"]))
        + ld(2, b"attn")
        + ld(5, tensor("Wq", Wq.shape, Wq))
        + ld(5, tensor("Wk", Wk.shape, Wk))
        + ld(5, tensor("Wv", Wv.shape, Wv))
        + ld(5, tensor("scale", [], [scale]))
        + ld(11, value_info("x")) + ld(12, value_info("y"))
    )
    (y,) = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"x": x})
    q, k, v = x @ Wq, x @ Wk, x @ Wv
    s = (q @ k.T) * scale
    e = np.exp(s - s.max(axis=-1, keepdims=True))
    a = e / e.sum(axis=-1, keepdims=True)
    np.testing.assert_allclose(y, a @ v, rtol=1e-4, atol=1e-5)


def test_shape_ops_gather_slice_split_cast_reduce():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 6).astype(np.float32)
    graph = (
        ld(1, node("Shape", ["x"], ["sh"]))
        + ld(1, node("Gather", ["x", "idx"], ["g"], int_attr("axis", 1)))
        + ld(1, node("Slice", ["x", "st", "en", "ax"], ["sl"]))
        + ld(1, node("Split", ["x"], ["s1", "s2"], int_attr("axis", 1)))
        + ld(1, node("Cast", ["x"], ["ci"], int_attr("to", 7)))
        + ld(1, node("ReduceMean", ["x"], ["rm"],
                     ints_attr("axes", [1]) + int_attr("keepdims", 0)))
        + ld(2, b"shapes")
        + ld(5, tensor("idx", [2], [0, 3], dtype="i8"))
        + ld(5, tensor("st", [1], [1], dtype="i8"))
        + ld(5, tensor("en", [1], [4], dtype="i8"))
        + ld(5, tensor("ax", [1], [1], dtype="i8"))
        + ld(11, value_info("x"))
        + ld(12, value_info("sh")) + ld(12, value_info("g"))
        + ld(12, value_info("sl")) + ld(12, value_info("s1"))
        + ld(12, value_info("s2")) + ld(12, value_info("ci"))
        + ld(12, value_info("rm"))
    )
    sh, g, sl, s1, s2, ci, rm = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"x": x})
    assert sh.tolist() == [2, 6]
    np.testing.assert_allclose(g, x[:, [0, 3]])
    np.testing.assert_allclose(sl, x[:, 1:4])
    np.testing.assert_allclose(s1, x[:, :3])
    np.testing.assert_allclose(s2, x[:, 3:])
    assert ci.dtype == np.int64
    np.testing.assert_allclose(rm, x.mean(axis=1), rtol=1e-6)


# ------------------------------------------------------------ control flow


def graph_attr(name: str, graph_bytes: bytes) -> bytes:
    return ld(5, ld(1, name.encode()) + ld(6, graph_bytes))


def test_if_branches_capture_outer_scope():
    # then: y = x * two   else: y = x + ten   (x, two, ten live in the
    # OUTER graph — the branches have no inputs of their own)
    then_g = ld(1, node("Mul", ["x", "two"], ["y_t"])) + ld(12, value_info("y_t"))
    else_g = ld(1, node("Add", ["x", "ten"], ["y_e"])) + ld(12, value_info("y_e"))
    graph = (
        ld(1, node("If", ["cond"], ["y"],
                   graph_attr("then_branch", then_g)
                   + graph_attr("else_branch", else_g)))
        + ld(2, b"ifg")
        + ld(5, tensor("two", [1], [2.0]))
        + ld(5, tensor("ten", [1], [10.0]))
        + ld(11, value_info("cond")) + ld(11, value_info("x"))
        + ld(12, value_info("y"))
    )
    model = vi(1, 8) + ld(7, graph)
    x = np.array([1.5, -3.0], dtype=np.float32)
    (y,) = OnnxGraph(model).run({"cond": np.array(True), "x": x})
    np.testing.assert_allclose(y, x * 2)
    (y,) = OnnxGraph(model).run({"cond": np.array(False), "x": x})
    np.testing.assert_allclose(y, x + 10)


def test_loop_carried_state_and_scan_output():
    # for i in range(M): acc += i, scanning acc — checks trip counting,
    # carried deps, and scan-output stacking
    body = (
        ld(1, node("Identity", ["cond_in"], ["cond_out"]))
        + ld(1, node("Add", ["acc", "i"], ["acc_out"]))
        + ld(1, node("Identity", ["acc_out"], ["scan"]))
        + ld(2, b"body")
        + ld(11, value_info("i")) + ld(11, value_info("cond_in"))
        + ld(11, value_info("acc"))
        + ld(12, value_info("cond_out")) + ld(12, value_info("acc_out"))
        + ld(12, value_info("scan"))
    )
    graph = (
        ld(1, node("Loop", ["M", "", "acc0"], ["acc_final", "trace"],
                   graph_attr("body", body)))
        + ld(2, b"loopg")
        + ld(5, tensor("M", [], [5], dtype="i8"))
        + ld(5, tensor("acc0", [], [0], dtype="i8"))
        + ld(12, value_info("acc_final")) + ld(12, value_info("trace"))
    )
    acc, trace = OnnxGraph(vi(1, 8) + ld(7, graph)).run({})
    assert int(np.ravel(acc)[0]) == 10  # 0+1+2+3+4
    assert np.ravel(trace).tolist() == [0, 1, 3, 6, 10]


def test_loop_condition_termination():
    # while acc < 20: acc *= 2 — cond computed in the body, no max-trip M
    body = (
        ld(1, node("Mul", ["acc", "two"], ["acc_out"]))
        + ld(1, node("Less", ["acc_out", "twenty"], ["cond_out"]))
        + ld(2, b"body")
        + ld(11, value_info("i")) + ld(11, value_info("cond_in"))
        + ld(11, value_info("acc"))
        + ld(12, value_info("cond_out")) + ld(12, value_info("acc_out"))
    )
    graph = (
        ld(1, node("Loop", ["", "c0", "acc0"], ["acc_final"],
                   graph_attr("body", body)))
        + ld(2, b"whileg")
        + ld(5, tensor("two", [], [2.0]))
        + ld(5, tensor("twenty", [], [20.0]))
        + ld(5, tensor("acc0", [], [1.0]))
        + ld(12, value_info("acc_final"))
    )
    (acc,) = OnnxGraph(vi(1, 8) + ld(7, graph)).run(
        {"c0": np.array(True)}
    )
    # 1→2→4→8→16→32: the body runs once more after 16 (cond checked after)
    assert float(np.asarray(acc).ravel()[0]) == 32.0


def test_scan_running_sum():
    body = (
        ld(1, node("Add", ["s", "xt"], ["s_out"]))
        + ld(1, node("Identity", ["s_out"], ["y"]))
        + ld(2, b"body")
        + ld(11, value_info("s")) + ld(11, value_info("xt"))
        + ld(12, value_info("s_out")) + ld(12, value_info("y"))
    )
    graph = (
        ld(1, node("Scan", ["s0", "seq"], ["s_final", "ys"],
                   graph_attr("body", body) + int_attr("num_scan_inputs", 1)))
        + ld(2, b"scang")
        + ld(5, tensor("s0", [1], [0.0]))
        + ld(11, value_info("seq"))
        + ld(12, value_info("s_final")) + ld(12, value_info("ys"))
    )
    seq = np.array([[1.0], [2.5], [3.5], [-1.0]], dtype=np.float32)
    s, ys = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"seq": seq})
    np.testing.assert_allclose(s, [6.0])
    np.testing.assert_allclose(ys[:, 0], [1.0, 3.5, 7.0, 6.0])


def test_scan_reverse_direction():
    body = (
        ld(1, node("Add", ["s", "xt"], ["s_out"]))
        + ld(1, node("Identity", ["s_out"], ["y"]))
        + ld(2, b"body")
        + ld(11, value_info("s")) + ld(11, value_info("xt"))
        + ld(12, value_info("s_out")) + ld(12, value_info("y"))
    )
    graph = (
        ld(1, node("Scan", ["s0", "seq"], ["s_final", "ys"],
                   graph_attr("body", body)
                   + int_attr("num_scan_inputs", 1)
                   + ints_attr("scan_input_directions", [1])
                   + ints_attr("scan_output_directions", [1])))
        + ld(2, b"scanrev")
        + ld(5, tensor("s0", [1], [0.0]))
        + ld(11, value_info("seq"))
        + ld(12, value_info("s_final")) + ld(12, value_info("ys"))
    )
    seq = np.array([[1.0], [2.0], [4.0]], dtype=np.float32)
    s, ys = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"seq": seq})
    np.testing.assert_allclose(s, [7.0])  # consumed back-to-front
    # outputs re-reversed into input order: suffix sums
    np.testing.assert_allclose(ys[:, 0], [7.0, 6.0, 4.0])


# ---------------------------------------------------------------- quantized


def test_quantize_dequantize_linear():
    x = np.array([0.0, 2.0, 3.0, 1000.0, -254.0, -1000.0], dtype=np.float32)
    graph = (
        ld(1, node("QuantizeLinear", ["x", "s", "zp"], ["q"]))
        + ld(1, node("DequantizeLinear", ["q", "s", "zp"], ["d"]))
        + ld(2, b"qdq")
        + ld(5, tensor("s", [], [2.0]))
        + ld(5, tensor_int8("zp", [], [128], dtype_code=2))
        + ld(11, value_info("x"))
        + ld(12, value_info("q")) + ld(12, value_info("d"))
    )
    q, d = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"x": x})
    assert q.dtype == np.uint8
    assert q.tolist() == [128, 129, 130, 255, 1, 0]  # ONNX spec example
    np.testing.assert_allclose(d, (q.astype(np.int32) - 128) * 2.0)


def tensor_int8(name, dims, values, dtype_code=3):
    """int8/uint8 TensorProto via the int32_data field (field 5)."""
    out = b"".join(vi(1, d) for d in dims)
    out += vi(2, dtype_code)
    out += ld(8, name.encode())
    for v in values:
        out += vi(5, v & 0xFFFFFFFFFFFFFFFF if v < 0 else v)
    return out


def test_qlinear_matmul_matches_float_reference():
    rng = np.random.RandomState(5)
    a = rng.randint(0, 256, size=(2, 4)).astype(np.uint8)
    b = rng.randint(0, 256, size=(4, 3)).astype(np.uint8)
    a_s, a_z = 0.05, 113
    b_s, b_z = 0.1, 127
    y_s, y_z = 0.4, 120
    graph = (
        ld(1, node("QLinearMatMul",
                   ["a", "as_", "az", "b", "bs", "bz", "ys", "yz"], ["y"]))
        + ld(2, b"qmm")
        + ld(5, tensor("as_", [], [a_s]))
        + ld(5, tensor_int8("az", [], [a_z], dtype_code=2))
        + ld(5, tensor("bs", [], [b_s]))
        + ld(5, tensor_int8("bz", [], [b_z], dtype_code=2))
        + ld(5, tensor("ys", [], [y_s]))
        + ld(5, tensor_int8("yz", [], [y_z], dtype_code=2))
        + ld(11, value_info("a")) + ld(11, value_info("b"))
        + ld(12, value_info("y"))
    )
    (y,) = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"a": a, "b": b})
    # independent reference: dequantize -> float matmul -> quantize
    fa = (a.astype(np.int32) - a_z) * a_s
    fb = (b.astype(np.int32) - b_z) * b_s
    ref = np.clip(np.rint((fa @ fb) / y_s) + y_z, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(y, ref)


def test_matmul_integer():
    a = np.array([[11, 7, 3], [4, 5, 6]], dtype=np.uint8)
    b = np.array([[1, 4], [2, 5], [3, 6]], dtype=np.uint8)
    graph = (
        ld(1, node("MatMulInteger", ["a", "b", "az", "bz"], ["y"]))
        + ld(2, b"mmi")
        + ld(5, tensor_int8("az", [], [12], dtype_code=2))
        + ld(5, tensor_int8("bz", [], [0], dtype_code=2))
        + ld(11, value_info("a")) + ld(11, value_info("b"))
        + ld(12, value_info("y"))
    )
    (y,) = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"a": a, "b": b})
    ref = (a.astype(np.int32) - 12) @ b.astype(np.int32)
    np.testing.assert_array_equal(y, ref)
    assert y.dtype == np.int32


def test_dynamic_quantize_linear():
    x = np.array([0.0, 2.0, -3.0, -2.5, 1.34, 0.5], dtype=np.float32)
    graph = (
        ld(1, node("DynamicQuantizeLinear", ["x"], ["y", "ys", "yz"]))
        + ld(2, b"dql")
        + ld(11, value_info("x"))
        + ld(12, value_info("y")) + ld(12, value_info("ys"))
        + ld(12, value_info("yz"))
    )
    y, ys, yz = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"x": x})
    scale = (2.0 - (-3.0)) / 255.0
    zp = int(np.clip(np.rint(3.0 / scale), 0, 255))
    ref = np.clip(np.rint(x / scale) + zp, 0, 255).astype(np.uint8)
    assert float(ys) == np.float32(scale)
    assert int(yz) == zp
    np.testing.assert_array_equal(y, ref)


def test_qlinear_conv_per_channel():
    rng = np.random.RandomState(9)
    X = rng.randint(0, 256, size=(1, 2, 5, 5)).astype(np.uint8)
    W = rng.randint(-128, 128, size=(3, 2, 3, 3)).astype(np.int8)
    x_s, x_z = 0.02, 128
    w_s = np.array([0.01, 0.015, 0.02], dtype=np.float32)  # per out channel
    y_s, y_z = 0.1, 100
    graph = (
        ld(1, node("QLinearConv",
                   ["x", "xs", "xz", "w", "ws", "wz", "ys", "yz"], ["y"],
                   ints_attr("kernel_shape", [3, 3])
                   + ints_attr("pads", [1, 1, 1, 1])))
        + ld(2, b"qconv")
        + ld(5, tensor("xs", [], [x_s]))
        + ld(5, tensor_int8("xz", [], [x_z], dtype_code=2))
        + ld(5, tensor("ws", [3], list(w_s)))
        + ld(5, tensor_int8("wz", [3], [0, 0, 0]))
        + ld(5, tensor_int8("yz", [], [y_z], dtype_code=2))
        + ld(5, tensor("ys", [], [y_s]))
        + ld(11, value_info("x")) + ld(11, value_info("w"))
        + ld(12, value_info("y"))
    )
    (y,) = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"x": X, "w": W})
    # independent reference: direct loops over output pixels
    acc = np.zeros((1, 3, 5, 5), dtype=np.int64)
    xp = np.pad(X.astype(np.int32) - x_z, ((0, 0), (0, 0), (1, 1), (1, 1)))
    for m in range(3):
        for i in range(5):
            for j in range(5):
                acc[0, m, i, j] = np.sum(
                    xp[0, :, i : i + 3, j : j + 3] * W[m].astype(np.int32)
                )
    scale = x_s * w_s.reshape(1, 3, 1, 1).astype(np.float64) / y_s
    ref = np.clip(np.rint(acc * scale) + y_z, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(y, ref)


def test_qlinear_conv_per_channel_zero_points():
    """1-D w_zero_point aligns to OUTPUT channels, not the kernel axis."""
    rng = np.random.RandomState(13)
    X = rng.randint(0, 256, size=(1, 2, 4, 4)).astype(np.uint8)
    W = rng.randint(-100, 100, size=(3, 2, 3, 3)).astype(np.int8)
    w_zp = np.array([3, -5, 7], dtype=np.int8)  # per out channel, size==kW!
    x_s, x_z = 0.02, 120
    y_s, y_z = 0.15, 100
    graph = (
        ld(1, node("QLinearConv",
                   ["x", "xs", "xz", "w", "ws", "wz", "ys", "yz"], ["y"],
                   ints_attr("kernel_shape", [3, 3])
                   + ints_attr("pads", [1, 1, 1, 1])))
        + ld(2, b"qconvzp")
        + ld(5, tensor("xs", [], [x_s]))
        + ld(5, tensor_int8("xz", [], [x_z], dtype_code=2))
        + ld(5, tensor("ws", [], [0.01]))
        + ld(5, tensor_int8("wz", [3], [int(v) for v in w_zp]))
        + ld(5, tensor("ys", [], [y_s]))
        + ld(5, tensor_int8("yz", [], [y_z], dtype_code=2))
        + ld(11, value_info("x")) + ld(11, value_info("w"))
        + ld(12, value_info("y"))
    )
    (y,) = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"x": X, "w": W})
    acc = np.zeros((1, 3, 4, 4), dtype=np.int64)
    xp = np.pad(X.astype(np.int32) - x_z, ((0, 0), (0, 0), (1, 1), (1, 1)))
    for m in range(3):
        wm = W[m].astype(np.int32) - int(w_zp[m])  # zp per OUT channel
        for i in range(4):
            for j in range(4):
                acc[0, m, i, j] = np.sum(xp[0, :, i:i+3, j:j+3] * wm)
    ref = np.clip(np.rint(acc * (x_s * 0.01 / y_s)) + y_z, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(y, ref)


def test_matmul_integer_per_row_zero_point():
    a = np.array([[10, 20, 30], [1, 2, 3]], dtype=np.uint8)
    b = np.array([[1, 0], [0, 1], [1, 1]], dtype=np.uint8)
    a_zp = np.array([5, 1], dtype=np.uint8)  # one zp per ROW of a
    graph = (
        ld(1, node("MatMulInteger", ["a", "b", "az"], ["y"]))
        + ld(2, b"mmirow")
        + ld(5, tensor_int8("az", [2], [5, 1], dtype_code=2))
        + ld(11, value_info("a")) + ld(11, value_info("b"))
        + ld(12, value_info("y"))
    )
    (y,) = OnnxGraph(vi(1, 8) + ld(7, graph)).run({"a": a, "b": b})
    ref = (a.astype(np.int32) - a_zp[:, None]) @ b.astype(np.int32)
    np.testing.assert_array_equal(y, ref)


# ---------------------------------------------------------------- new op batch


def _run1(graph_nodes, feeds, out="y"):
    outs = [out] if isinstance(out, str) else out
    graph = b"".join(ld(1, n) for n in graph_nodes) + b"".join(
        ld(12, value_info(o)) for o in outs
    )
    return OnnxGraph(ld(7, graph)).run(feeds)


def test_argmax_argmin_keepdims_and_last_index():
    x = np.array([[1.0, 3.0, 3.0, 0.0], [5.0, 2.0, 5.0, 1.0]], dtype=np.float32)
    (y,) = _run1([node("ArgMax", ["x"], ["y"], int_attr("axis", 1))], {"x": x})
    assert y.shape == (2, 1) and y.dtype == np.int64
    assert y.ravel().tolist() == [1, 0]  # first max wins by default
    (y,) = _run1(
        [node("ArgMax", ["x"], ["y"],
              int_attr("axis", 1) + int_attr("keepdims", 0)
              + int_attr("select_last_index", 1))],
        {"x": x},
    )
    assert y.tolist() == [2, 2]  # last max index
    (y,) = _run1(
        [node("ArgMin", ["x"], ["y"], int_attr("axis", 0) + int_attr("keepdims", 0))],
        {"x": x},
    )
    assert y.tolist() == [0, 1, 0, 0]


def test_topk_values_indices_and_ties():
    x = np.array([[1.0, 5.0, 3.0, 5.0, 2.0]], dtype=np.float32)
    k = np.array([3], dtype=np.int64)
    vals, idx = _run1(
        [node("TopK", ["x", "k"], ["y", "i"], int_attr("axis", 1))],
        {"x": x, "k": k}, out=["y", "i"],
    )
    # ties break by ascending index (spec): both 5s, lower index first
    assert idx.tolist() == [[1, 3, 2]]
    assert vals.tolist() == [[5.0, 5.0, 3.0]]
    vals, idx = _run1(
        [node("TopK", ["x", "k"], ["y", "i"],
              int_attr("axis", 1) + int_attr("largest", 0))],
        {"x": x, "k": k}, out=["y", "i"],
    )
    assert idx.tolist() == [[0, 4, 2]]


def test_reduce_max_min_prod():
    x = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    (y,) = _run1(
        [node("ReduceMax", ["x"], ["y"], ints_attr("axes", [0]) + int_attr("keepdims", 0))],
        {"x": x},
    )
    assert y.tolist() == [3.0, 4.0]
    (y,) = _run1([node("ReduceProd", ["x"], ["y"])], {"x": x})
    assert float(np.asarray(y).reshape(-1)[0]) == 24.0


def test_variadic_min_max_sum_mean():
    a = np.array([1.0, 5.0], dtype=np.float32)
    b = np.array([3.0, 2.0], dtype=np.float32)
    c = np.array([2.0, 2.0], dtype=np.float32)
    (y,) = _run1([node("Min", ["a", "b", "c"], ["y"])], {"a": a, "b": b, "c": c})
    assert y.tolist() == [1.0, 2.0]
    (y,) = _run1([node("Mean", ["a", "b", "c"], ["y"])], {"a": a, "b": b, "c": c})
    assert y.tolist() == [2.0, 3.0]


def test_rounding_and_activations():
    x = np.array([-1.5, -0.5, 0.5, 1.5, 2.5], dtype=np.float32)
    (y,) = _run1([node("Round", ["x"], ["y"])], {"x": x})
    assert y.tolist() == [-2.0, -0.0, 0.0, 2.0, 2.0]  # half-to-even
    (y,) = _run1([node("Floor", ["x"], ["y"])], {"x": x})
    assert y.tolist() == [-2.0, -1.0, 0.0, 1.0, 2.0]
    (y,) = _run1([node("HardSigmoid", ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(y, np.clip(0.2 * x + 0.5, 0, 1), rtol=1e-6)
    (y,) = _run1([node("Softplus", ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(y, np.log(1 + np.exp(x.astype(np.float64))), rtol=1e-6)
    slope = np.array([0.1], dtype=np.float32)
    (y,) = _run1([node("PRelu", ["x", "s"], ["y"])], {"x": x, "s": slope})
    np.testing.assert_allclose(y, np.where(x >= 0, x, 0.1 * x), rtol=1e-6)


def test_logical_and_mod():
    t = np.array([True, True, False, False])
    u = np.array([True, False, True, False])
    (y,) = _run1([node("Xor", ["t", "u"], ["y"])], {"t": t, "u": u})
    assert y.tolist() == [False, True, True, False]
    (y,) = _run1([node("Not", ["t"], ["y"])], {"t": t})
    assert y.tolist() == [False, False, True, True]
    a = np.array([-7, 7], dtype=np.int64)
    b = np.array([3, 3], dtype=np.int64)
    (y,) = _run1([node("Mod", ["a", "b"], ["y"])], {"a": a, "b": b})
    assert y.tolist() == [2, 1]  # python-style
    (y,) = _run1([node("Mod", ["a", "b"], ["y"], int_attr("fmod", 1))], {"a": a, "b": b})
    assert y.tolist() == [-1, 1]  # C-style


def test_tile_range_cumsum():
    x = np.array([[1, 2]], dtype=np.float32)
    reps = np.array([2, 3], dtype=np.int64)
    (y,) = _run1([node("Tile", ["x", "r"], ["y"])], {"x": x, "r": reps})
    assert y.shape == (2, 6) and y[1].tolist() == [1, 2, 1, 2, 1, 2]
    (y,) = _run1(
        [node("Range", ["s", "l", "d"], ["y"])],
        {"s": np.array(2.0, dtype=np.float32), "l": np.array(9.0, dtype=np.float32),
         "d": np.array(3.0, dtype=np.float32)},
    )
    assert y.tolist() == [2.0, 5.0, 8.0]
    x = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    ax = np.array(0, dtype=np.int64)
    (y,) = _run1([node("CumSum", ["x", "a"], ["y"])], {"x": x, "a": ax})
    assert y.tolist() == [1.0, 3.0, 6.0, 10.0]
    (y,) = _run1(
        [node("CumSum", ["x", "a"], ["y"], int_attr("exclusive", 1))],
        {"x": x, "a": ax},
    )
    assert y.tolist() == [0.0, 1.0, 3.0, 6.0]
    (y,) = _run1(
        [node("CumSum", ["x", "a"], ["y"], int_attr("reverse", 1))],
        {"x": x, "a": ax},
    )
    assert y.tolist() == [10.0, 9.0, 7.0, 4.0]


def test_pad_modes_and_gather_elements():
    x = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    pads = np.array([0, 1, 0, 1], dtype=np.int64)  # begin(rank) then end(rank)
    (y,) = _run1([node("Pad", ["x", "p"], ["y"])], {"x": x, "p": pads})
    assert y.tolist() == [[0, 1, 2, 0], [0, 3, 4, 0]]
    cv = np.array(9.0, dtype=np.float32)
    (y,) = _run1([node("Pad", ["x", "p", "c"], ["y"])], {"x": x, "p": pads, "c": cv})
    assert y[0].tolist() == [9, 1, 2, 9]
    (y,) = _run1(
        [node("Pad", ["x", "p"], ["y"], str_attr("mode", "edge"))],
        {"x": x, "p": pads},
    )
    assert y[0].tolist() == [1, 1, 2, 2]
    idx = np.array([[1, 0]], dtype=np.int64)
    (y,) = _run1(
        [node("GatherElements", ["x", "i"], ["y"], int_attr("axis", 0))],
        {"x": x, "i": idx},
    )
    assert y.tolist() == [[3.0, 2.0]]


def test_range_preserves_dtype_and_negative_pad_crops():
    (y,) = _run1(
        [node("Range", ["s", "l", "d"], ["y"])],
        {"s": np.array(0, dtype=np.float32), "l": np.array(4, dtype=np.float32),
         "d": np.array(1, dtype=np.float32)},
    )
    assert y.dtype == np.float32
    (y,) = _run1(
        [node("Range", ["s", "l", "d"], ["y"])],
        {"s": np.array(0, dtype=np.int32), "l": np.array(4, dtype=np.int32),
         "d": np.array(1, dtype=np.int32)},
    )
    assert y.dtype == np.int32
    # negative pads crop (spec, opset >= 11)
    x = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], dtype=np.float32)
    pads = np.array([0, -1, 0, 1], dtype=np.int64)  # trim first col, pad last
    (y,) = _run1([node("Pad", ["x", "p"], ["y"])], {"x": x, "p": pads})
    assert y.tolist() == [[2.0, 3.0, 0.0], [5.0, 6.0, 0.0]]

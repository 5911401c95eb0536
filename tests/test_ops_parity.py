"""Per-op numerical parity tests: dipoorlet_tpu.ops vs torch CPU.

The reference gets op semantics from onnxruntime (forward_net.py); we
validate ours against torch's reference CPU kernels on random tensors."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dipoorlet_tpu.ops import OP_REGISTRY, OpContext


def run_op(op_type, attrs, *inputs, opset=13):
    ctx = OpContext(attrs, opset=opset)
    out = OP_REGISTRY[op_type](ctx, *inputs)
    if isinstance(out, tuple):
        return tuple(np.asarray(o) for o in out)
    return np.asarray(out)


def assert_close(got, ref, tol=1e-4):
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


@pytest.mark.parametrize("stride,pad,dil,group", [
    (1, 1, 1, 1), (2, 1, 1, 1), (1, 0, 2, 1), (1, 1, 1, 4), (2, 2, 1, 8),
])
def test_conv2d(rng, stride, pad, dil, group):
    x = rng.randn(2, 8, 14, 14).astype(np.float32)
    w = rng.randn(16, 8 // group, 3, 3).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride, pad, dil, group).numpy()
    got = run_op("Conv", {"kernel_shape": [3, 3], "strides": [stride, stride],
                          "pads": [pad, pad, pad, pad], "dilations": [dil, dil],
                          "group": group},
                 x, w, b)
    assert_close(got, ref)


def test_conv_autopad_same_upper(rng):
    x = rng.randn(1, 3, 13, 13).astype(np.float32)
    w = rng.randn(6, 3, 3, 3).astype(np.float32)
    got = run_op("Conv", {"kernel_shape": [3, 3], "strides": [2, 2],
                          "auto_pad": b"SAME_UPPER"}, x, w)
    assert got.shape == (1, 6, 7, 7)


@pytest.mark.parametrize("stride,pad,outpad,group", [
    (2, 1, 1, 1), (2, 0, 0, 1), (1, 1, 0, 1), (2, 1, 1, 4),
])
def test_conv_transpose2d(rng, stride, pad, outpad, group):
    x = rng.randn(2, 8, 7, 7).astype(np.float32)
    w = rng.randn(8, 16 // group, 3, 3).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                             stride, pad, outpad, group).numpy()
    got = run_op("ConvTranspose", {"kernel_shape": [3, 3], "strides": [stride, stride],
                                   "pads": [pad, pad, pad, pad],
                                   "output_padding": [outpad, outpad], "group": group},
                 x, w, b)
    assert_close(got, ref)


@pytest.mark.parametrize("transA,transB,alpha,beta", [
    (0, 0, 1.0, 1.0), (0, 1, 1.0, 1.0), (1, 0, 0.5, 2.0), (1, 1, 2.0, 0.0),
])
def test_gemm(rng, transA, transB, alpha, beta):
    a = rng.randn(4, 6).astype(np.float32)
    b = rng.randn(6, 5).astype(np.float32)
    c = rng.randn(5).astype(np.float32)
    A = a.T if transA else a  # op transposes back internally
    B = b.T if transB else b
    got = run_op("Gemm", {"transA": transA, "transB": transB, "alpha": alpha, "beta": beta},
                 A, B, c)
    assert_close(got, alpha * a @ b + beta * c, tol=1e-5)


def test_batchnorm(rng):
    x = rng.randn(2, 5, 8, 8).astype(np.float32)
    scale = rng.rand(5).astype(np.float32) + 0.5
    bias = rng.randn(5).astype(np.float32)
    mean = rng.randn(5).astype(np.float32)
    var = rng.rand(5).astype(np.float32) + 0.1
    ref = F.batch_norm(torch.from_numpy(x), torch.from_numpy(mean), torch.from_numpy(var),
                       torch.from_numpy(scale), torch.from_numpy(bias), False, 0.0, 1e-5).numpy()
    got = run_op("BatchNormalization", {"epsilon": 1e-5}, x, scale, bias, mean, var)
    assert_close(got, ref)


@pytest.mark.parametrize("ceil_mode", [0, 1])
def test_maxpool(rng, ceil_mode):
    x = rng.randn(1, 4, 13, 13).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), 3, 2, 1, ceil_mode=bool(ceil_mode)).numpy()
    got = run_op("MaxPool", {"kernel_shape": [3, 3], "strides": [2, 2],
                             "pads": [1, 1, 1, 1], "ceil_mode": ceil_mode}, x)
    assert_close(got, ref)


@pytest.mark.parametrize("count_include_pad", [0, 1])
def test_averagepool(rng, count_include_pad):
    x = rng.randn(1, 4, 12, 12).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x), 3, 2, 1,
                       count_include_pad=bool(count_include_pad)).numpy()
    got = run_op("AveragePool", {"kernel_shape": [3, 3], "strides": [2, 2],
                                 "pads": [1, 1, 1, 1],
                                 "count_include_pad": count_include_pad}, x)
    assert_close(got, ref)


def test_global_average_pool(rng):
    x = rng.randn(2, 6, 9, 9).astype(np.float32)
    assert_close(run_op("GlobalAveragePool", {}, x), x.mean(axis=(2, 3), keepdims=True))


def test_softmax(rng):
    x = rng.randn(3, 7).astype(np.float32)
    assert_close(run_op("Softmax", {"axis": -1}, x),
                 F.softmax(torch.from_numpy(x), -1).numpy())


def test_activations(rng):
    x = rng.randn(3, 9).astype(np.float32) * 3
    assert_close(run_op("Relu", {}, x), np.maximum(x, 0))
    assert_close(run_op("Sigmoid", {}, x), 1 / (1 + np.exp(-x)), tol=1e-5)
    assert_close(run_op("HardSigmoid", {"alpha": 1 / 6, "beta": 0.5}, x),
                 F.hardsigmoid(torch.from_numpy(x)).numpy(), tol=1e-5)
    assert_close(run_op("LeakyRelu", {"alpha": 0.1}, x),
                 F.leaky_relu(torch.from_numpy(x), 0.1).numpy())
    assert_close(run_op("Clip", {}, x, np.float32(0.0), np.float32(6.0)),
                 np.clip(x, 0, 6))
    slope = rng.rand(9).astype(np.float32)
    assert_close(run_op("PRelu", {}, x, slope), np.where(x >= 0, x, slope * x))


def test_prelu_channelwise(rng):
    x = rng.randn(2, 4, 5, 5).astype(np.float32)
    slope = rng.rand(4).astype(np.float32)
    ref = F.prelu(torch.from_numpy(x), torch.from_numpy(slope)).numpy()
    assert_close(run_op("PRelu", {}, x, slope), ref)


def test_reshape_flatten_transpose(rng):
    x = rng.randn(2, 3, 4).astype(np.float32)
    assert run_op("Reshape", {}, x, np.array([0, -1])).shape == (2, 12)
    assert run_op("Flatten", {"axis": 2}, x).shape == (6, 4)
    assert run_op("Transpose", {"perm": [2, 0, 1]}, x).shape == (4, 2, 3)


def test_concat_split(rng):
    a = rng.randn(2, 3).astype(np.float32)
    b = rng.randn(2, 5).astype(np.float32)
    got = run_op("Concat", {"axis": 1}, a, b)
    assert_close(got, np.concatenate([a, b], 1))
    parts = run_op("Split", {"axis": 1}, got, np.array([3, 5]))
    assert_close(parts[0], a)
    assert_close(parts[1], b)


def test_slice_pad_gather(rng):
    x = rng.randn(4, 6).astype(np.float32)
    got = run_op("Slice", {}, x, np.array([1]), np.array([5]), np.array([1]), np.array([2]))
    assert_close(got, x[:, 1:5:2])
    got = run_op("Pad", {"mode": b"constant"}, x, np.array([1, 0, 1, 0]))
    assert got.shape == (6, 6)
    idx = np.array([2, 0])
    assert_close(run_op("Gather", {"axis": 0}, x, idx), x[idx])


def test_resize_nearest_and_linear(rng):
    x = rng.randn(1, 2, 4, 4).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    got = run_op("Resize", {"mode": b"nearest",
                            "coordinate_transformation_mode": b"asymmetric",
                            "nearest_mode": b"floor"},
                 x, None, np.array([1.0, 1.0, 2.0, 2.0]))
    assert_close(got, ref)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="bilinear",
                        align_corners=False).numpy()
    got = run_op("Resize", {"mode": b"linear",
                            "coordinate_transformation_mode": b"pytorch_half_pixel"},
                 x, None, np.array([1.0, 1.0, 2.0, 2.0]))
    assert_close(got, ref)


def test_reduce_ops(rng):
    x = rng.randn(3, 4, 5).astype(np.float32)
    assert_close(run_op("ReduceMean", {"keepdims": 1}, x, np.array([1])),
                 x.mean(1, keepdims=True), tol=1e-5)
    assert_close(run_op("ReduceSum", {"keepdims": 0}, x, np.array([0, 2])),
                 x.sum((0, 2)), tol=1e-4)
    assert_close(run_op("ReduceMax", {"keepdims": 1}, x), x.max(keepdims=True))


def test_quantize_dequantize_linear(rng):
    x = rng.randn(1, 4, 5, 5).astype(np.float32) * 3
    scale = np.float32(0.05)
    zp = np.int8(3)
    q = run_op("QuantizeLinear", {}, x, scale, zp)
    assert q.dtype == np.int8
    ref_q = np.clip(np.round(x / scale) + 3, -128, 127)
    # round-half-to-even matches numpy round
    assert np.array_equal(q.astype(np.float32), ref_q)
    dq = run_op("DequantizeLinear", {}, q, scale, zp)
    assert_close(dq, (ref_q - 3) * scale, tol=1e-6)


def test_quantize_per_channel(rng):
    w = rng.randn(8, 4, 3, 3).astype(np.float32)
    scale = (np.abs(w).max(axis=(1, 2, 3)) / 127).astype(np.float32)
    zp = np.zeros(8, dtype=np.int8)
    q = run_op("QuantizeLinear", {"axis": 0}, w, scale, zp)
    dq = run_op("DequantizeLinear", {"axis": 0}, q, scale, zp)
    err = np.abs(dq - w).max(axis=(1, 2, 3))
    assert (err <= scale * 0.5 + 1e-7).all()


def test_matmul_lrn(rng):
    a = rng.randn(2, 3, 4).astype(np.float32)
    b = rng.randn(2, 4, 5).astype(np.float32)
    assert_close(run_op("MatMul", {}, a, b), a @ b, tol=1e-5)
    x = rng.randn(1, 8, 6, 6).astype(np.float32)
    ref = F.local_response_norm(torch.from_numpy(x), 5, 1e-4, 0.75, 1.0).numpy()
    assert_close(run_op("LRN", {"size": 5, "alpha": 1e-4, "beta": 0.75, "bias": 1.0}, x),
                 ref, tol=1e-5)


def test_group_norm(rng):
    x = rng.randn(2, 8, 5, 5).astype(np.float32)
    scale = rng.rand(8).astype(np.float32) + 0.5
    bias = rng.randn(8).astype(np.float32)
    ref = F.group_norm(torch.from_numpy(x), 4, torch.from_numpy(scale),
                       torch.from_numpy(bias)).numpy()
    got = run_op("GroupNormalization", {"num_groups": 4, "epsilon": 1e-5},
                 x, scale, bias)
    assert_close(got, ref, tol=1e-4)


def test_einsum(rng):
    a = rng.randn(2, 3, 4).astype(np.float32)
    b = rng.randn(2, 4, 5).astype(np.float32)
    got = run_op("Einsum", {"equation": b"bij,bjk->bik"}, a, b)
    assert_close(got, np.einsum("bij,bjk->bik", a, b), tol=1e-5)


def test_long_tail_unary_vs_torch(rng):
    """Round-3 ORT-breadth ops vs torch reference kernels."""
    x = rng.randn(64).astype(np.float32) * 0.8
    t = torch.from_numpy(x)
    cases = {
        "Selu": F.selu(t), "Celu": F.celu(t), "Mish": F.mish(t),
        "Softsign": F.softsign(t), "Tan": torch.tan(t), "Atan": torch.atan(t),
        "Sinh": torch.sinh(t), "Cosh": torch.cosh(t), "Asinh": torch.asinh(t),
    }
    for op, ref in cases.items():
        assert_close(run_op(op, {}, x), ref.numpy(), tol=1e-4)
    xs = np.abs(x) * 0.9  # domain-restricted
    assert_close(run_op("Asin", {}, xs), np.arcsin(xs))
    assert_close(run_op("Acos", {}, xs), np.arccos(xs))
    assert_close(run_op("Atanh", {}, xs), np.arctanh(xs))
    assert_close(run_op("Acosh", {}, 1.0 + xs), np.arccosh(1.0 + xs))
    assert_close(run_op("ThresholdedRelu", {"alpha": 0.5}, x),
                 F.threshold(t, 0.5, 0.0).numpy())
    assert_close(run_op("Shrink", {"lambd": 0.5, "bias": 0.2}, x),
                 np.where(x < -0.5, x + 0.2, np.where(x > 0.5, x - 0.2, 0.0)))


def test_long_tail_structured(rng):
    x = rng.randn(3, 5).astype(np.float32)
    # CumSum: forward / exclusive / reverse
    assert_close(run_op("CumSum", {}, x, np.int64([1])), np.cumsum(x, 1))
    excl = run_op("CumSum", {"exclusive": 1}, x, np.int64([1]))
    assert_close(excl[:, 0], np.zeros(3))
    assert_close(excl[:, 1:], np.cumsum(x, 1)[:, :-1])
    rev = run_op("CumSum", {"reverse": 1}, x, np.int64([1]))
    assert_close(rev, np.cumsum(x[:, ::-1], 1)[:, ::-1])
    # reverse+exclusive together (round-4 advisor fix): suffix-sum of the
    # elements strictly AFTER each position, e.g. [1,2,3] -> [5,3,0]
    rev_ex = run_op("CumSum", {"reverse": 1, "exclusive": 1}, x, np.int64([1]))
    assert_close(rev_ex, np.cumsum(x[:, ::-1], 1)[:, ::-1] - x)
    # OneHot with off/on values and negative index wrap
    oh = run_op("OneHot", {}, np.asarray([0, -1]), np.int64([4]),
                np.asarray([2.0, 7.0], np.float32))
    assert_close(oh, np.asarray([[7, 2, 2, 2], [2, 2, 2, 7]], np.float32))
    # Trilu upper/lower with offset
    m = np.arange(16, dtype=np.float32).reshape(4, 4)
    assert_close(run_op("Trilu", {"upper": 1}, m, np.int64([1])), np.triu(m, 1))
    assert_close(run_op("Trilu", {"upper": 0}, m, np.int64([-1])), np.tril(m, -1))
    # Hardmax / LpNormalization / MVN / ReduceLogSum
    assert_close(run_op("Hardmax", {"axis": 1}, x),
                 (x == x.max(1, keepdims=True)).astype(np.float32))
    assert_close(run_op("LpNormalization", {"axis": 1, "p": 2}, x),
                 x / np.linalg.norm(x, axis=1, keepdims=True))
    img = rng.randn(2, 3, 4, 4).astype(np.float32)
    mvn = run_op("MeanVarianceNormalization", {}, img)
    assert abs(mvn[:, 0].mean()) < 1e-5 and abs(mvn[:, 0].std() - 1) < 1e-4
    pos = np.abs(x) + 0.1
    assert_close(run_op("ReduceLogSum", {"axes": [1], "keepdims": 0}, pos),
                 np.log(pos.sum(1)))
    assert_close(run_op("EyeLike", {"k": 1}, np.zeros((3, 4), np.float32)),
                 np.eye(3, 4, k=1, dtype=np.float32))
    assert_close(run_op("BitShift", {"direction": "RIGHT"},
                        np.asarray([8, 9], np.int32), np.asarray([2, 1], np.int32)),
                 np.asarray([2, 4], np.int32))


def test_einsum(rng):
    a = rng.randn(2, 3, 4).astype(np.float32)
    b = rng.randn(2, 4, 5).astype(np.float32)
    assert_close(run_op("Einsum", {"equation": b"bij,bjk->bik"}, a, b),
                 np.einsum("bij,bjk->bik", a, b))
    assert_close(run_op("Einsum", {"equation": "ii->i"},
                        np.eye(3, dtype=np.float32) * 2), np.full(3, 2.0))

"""Quantized-ONNX op fidelity (QDQ + QOperator interchange formats).

The reference's RKNN backend consumes pre-quantized model artifacts
(reference detector.py:705-869 — uint8 input, NPU-side int8 math); the
ONNX ecosystem's equivalents are the QDQ format (QuantizeLinear /
DequantizeLinear pairs, what torch exports for fake-quantized models and
onnxruntime's static quantizer emits) and the QOperator format
(ConvInteger / MatMulInteger / QLinearConv / QLinearMatMul, onnxruntime's
dynamic + QOperator quantizers). These tests pin both executors:

* op semantics against manual per-spec math (round-half-to-even,
  saturation, per-axis scales, zero-point padding, exact int32
  accumulation past float32's 2^24 mantissa limit);
* bit-level agreement between the numpy oracle (``onnx_exec``) and the
  jitted JAX path (``onnx_jax``), whose integer convs/matmuls decompose
  into int8-operand MXU ops + rank-reduced zero-point terms;
* torch itself, via a fake-quantized model exported to a QDQ graph.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_analytics_tpu.models.onnx_exec import run_graph  # noqa: E402
from realtime_analytics_tpu.models.onnx_jax import compile_graph  # noqa: E402
from realtime_analytics_tpu.models.onnx_lite import (  # noqa: E402
    OnnxGraph,
    OnnxNode,
    read_onnx_model,
)

from test_onnx_graph_exec import _export  # noqa: E402


def _both(g, feeds, n_outputs=1):
    """Run a graph through the numpy oracle AND the jitted JAX compiler;
    require bit-level agreement; return the oracle outputs."""
    np_outs = run_graph(g, feeds)
    fn = compile_graph(g)
    names = list(feeds)
    jitted = jax.jit(lambda *a: fn(dict(zip(names, a))))
    jax_outs = jitted(*[jnp.asarray(feeds[n]) for n in names])
    assert len(np_outs) == len(jax_outs) == n_outputs
    for i, (n, j) in enumerate(zip(np_outs, jax_outs)):
        j = np.asarray(j)
        assert n.dtype == j.dtype, f"out {i}: {n.dtype} vs {j.dtype}"
        if np.issubdtype(n.dtype, np.integer) or n.dtype == np.bool_:
            np.testing.assert_array_equal(n, j, err_msg=f"out {i}")
        else:
            np.testing.assert_allclose(n, j, atol=1e-6, rtol=1e-6,
                                       err_msg=f"out {i}")
    return np_outs


def _node_graph(op, inputs, outputs, initializers, attrs=None,
                graph_inputs=("x",), graph_outputs=("y",)):
    return OnnxGraph(
        nodes=[OnnxNode(op, inputs=list(inputs), outputs=list(outputs),
                        attrs=dict(attrs or {}))],
        initializers=dict(initializers),
        inputs=list(graph_inputs), outputs=list(graph_outputs),
    )


# ---------------------------------------------------------------- Q / DQ --


def test_quantize_linear_round_half_even_and_saturation():
    # x/scale lands exactly on .5 boundaries: ONNX rounds half to even
    scale = np.float32(0.5)
    x = np.array([0.25, 0.75, 1.25, -0.25, -0.75, 100.0, -100.0],
                 np.float32)
    g = _node_graph("QuantizeLinear", ["x", "s", "zp"], ["y"],
                    {"s": scale, "zp": np.int8(0)})
    (y,) = _both(g, {"x": x})
    # 0.5->0, 1.5->2, 2.5->2 (half-even); +/-100/0.5 saturates int8
    np.testing.assert_array_equal(
        y, np.array([0, 2, 2, 0, -2, 127, -128], np.int8))
    assert y.dtype == np.int8


def test_quantize_linear_default_uint8_and_zero_point():
    x = np.array([-1.0, 0.0, 0.6, 300.0], np.float32)
    g = _node_graph("QuantizeLinear", ["x", "s"], ["y"],
                    {"s": np.float32(1.0)})
    (y,) = _both(g, {"x": x})
    np.testing.assert_array_equal(y, np.array([0, 0, 1, 255], np.uint8))

    g = _node_graph("QuantizeLinear", ["x", "s", "zp"], ["y"],
                    {"s": np.float32(1.0), "zp": np.uint8(128)})
    (y,) = _both(g, {"x": x})
    np.testing.assert_array_equal(y, np.array([127, 128, 129, 255], np.uint8))


def test_qdq_per_axis_roundtrip():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    scales = np.array([0.01, 0.02, 0.05], np.float32)
    zps = np.array([10, -5, 0], np.int8)
    g = OnnxGraph(
        nodes=[
            OnnxNode("QuantizeLinear", inputs=["x", "s", "zp"],
                     outputs=["q"], attrs={"axis": 1}),
            OnnxNode("DequantizeLinear", inputs=["q", "s", "zp"],
                     outputs=["y"], attrs={"axis": 1}),
        ],
        initializers={"s": scales, "zp": zps},
        inputs=["x"], outputs=["q", "y"],
    )
    q, y = _both(g, {"x": x}, n_outputs=2)
    s_b = scales.reshape(1, 3, 1, 1)
    z_b = zps.astype(np.int32).reshape(1, 3, 1, 1)
    want_q = np.clip(np.rint(x / s_b) + z_b, -128, 127).astype(np.int8)
    np.testing.assert_array_equal(q, want_q)
    np.testing.assert_allclose(
        y, (want_q.astype(np.int32) - z_b).astype(np.float32) * s_b,
        atol=1e-7)
    # dequantization error bounded by half a quantum per channel where the
    # value is inside the representable range (outside it saturates)
    lo = (-128 - z_b) * s_b
    hi = (127 - z_b) * s_b
    inside = (x > lo + s_b) & (x < hi - s_b)
    assert np.max(np.abs((y - x) * inside)) <= 0.5 * scales.max() + 1e-6


def test_dequantize_linear_int32_bias():
    # ORT's static quantizer dequantizes int32 biases with scale only
    b = np.array([123456, -98765], np.int32)
    g = _node_graph("DequantizeLinear", ["x", "s"], ["y"],
                    {"s": np.float32(2e-4)}, graph_inputs=("x",))
    (y,) = _both(g, {"x": b})
    np.testing.assert_allclose(y, b.astype(np.float32) * 2e-4, rtol=1e-6)


def test_dynamic_quantize_linear_spec_cases():
    # mixed-sign, all-positive (range must include 0), all-negative, zeros
    cases = [
        np.array([-1.0, 0.5, 2.0], np.float32),
        np.array([1.0, 2.0, 3.0], np.float32),
        np.array([-3.0, -1.0], np.float32),
        np.zeros((4,), np.float32),
    ]
    g = _node_graph("DynamicQuantizeLinear", ["x"], ["y", "s", "zp"], {},
                    graph_outputs=("y", "s", "zp"))
    for x in cases:
        y, s, zp = _both(g, {"x": x}, n_outputs=3)
        xmin = min(float(x.min()), 0.0)
        xmax = max(float(x.max()), 0.0)
        want_s = (xmax - xmin) / 255.0 or 1.0
        want_zp = np.clip(np.rint(-xmin / want_s), 0, 255)
        assert abs(float(s) - want_s) < 1e-7, x
        assert int(zp) == int(want_zp), x
        want_y = np.clip(np.rint(x / want_s) + want_zp, 0, 255)
        np.testing.assert_array_equal(y, want_y.astype(np.uint8))


# ------------------------------------------------------------- QOperator --


def test_matmul_integer_exact_past_f32_mantissa():
    """K=4096 of maxed operands overflows float32's 24-bit mantissa —
    the accumulation must be exact integer math."""
    a = np.full((2, 4096), 255, np.uint8)
    b = np.full((4096, 3), 127, np.int8)
    g = _node_graph("MatMulInteger", ["x", "w"], ["y"], {"w": b})
    (y,) = _both(g, {"x": a})
    assert y.dtype == np.int32
    np.testing.assert_array_equal(y, np.full((2, 3), 255 * 127 * 4096,
                                             np.int64).astype(np.int32))


def test_matmul_integer_zero_points():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    b = rng.integers(-128, 128, (7, 4), dtype=np.int8)
    azp = np.uint8(113)
    bzp = np.int8(-9)
    g = _node_graph("MatMulInteger", ["x", "w", "azp", "bzp"], ["y"],
                    {"w": b, "azp": azp, "bzp": bzp})
    (y,) = _both(g, {"x": a})
    want = (a.astype(np.int64) - 113) @ (b.astype(np.int64) + 9)
    np.testing.assert_array_equal(y, want.astype(np.int32))

    # per-row a_zp, per-column b_zp
    azp_r = rng.integers(0, 256, (5,), dtype=np.uint8)
    bzp_c = rng.integers(-128, 128, (4,), dtype=np.int8)
    g = _node_graph("MatMulInteger", ["x", "w", "azp", "bzp"], ["y"],
                    {"w": b, "azp": azp_r, "bzp": bzp_c})
    (y,) = _both(g, {"x": a})
    want = ((a.astype(np.int64) - azp_r[:, None])
            @ (b.astype(np.int64) - bzp_c[None, :]))
    np.testing.assert_array_equal(y, want.astype(np.int32))


def _conv_int_ref(x, w, xzp, wzp, strides, pads, dilations=1, groups=1):
    """Independent reference: float64 conv of the zero-point-subtracted
    operands with explicit x_zp padding, via torch."""
    xs = x.astype(np.float64) - float(xzp)
    wz = np.asarray(wzp, np.float64)
    if wz.ndim == 1 and wz.size > 1:
        wz = wz.reshape(-1, 1, 1, 1)
    ws = w.astype(np.float64) - wz
    y = F.conv2d(torch.from_numpy(xs), torch.from_numpy(ws),
                 stride=strides, padding=pads, dilation=dilations,
                 groups=groups)
    return y.numpy().astype(np.int64)


def test_conv_integer_zero_point_padding_and_groups():
    """Implicit padding pads x with x_zero_point (spec) — the padded
    border must contribute zero after zp subtraction."""
    rng = np.random.default_rng(13)
    x = rng.integers(0, 256, (2, 4, 9, 9), dtype=np.uint8)
    w = rng.integers(-128, 128, (6, 2, 3, 3), dtype=np.int8)
    xzp = np.uint8(77)
    wzp_pc = rng.integers(-100, 100, (6,), dtype=np.int8)
    g = _node_graph(
        "ConvInteger", ["x", "w", "xzp", "wzp"], ["y"],
        {"w": w, "xzp": xzp, "wzp": wzp_pc},
        attrs={"strides": [2, 2], "pads": [1, 1, 1, 1], "group": 2},
    )
    (y,) = _both(g, {"x": x})
    want = _conv_int_ref(x, w, 77, wzp_pc, (2, 2), (1, 1), groups=2)
    np.testing.assert_array_equal(y, want.astype(np.int32))


def test_conv_integer_symmetric_fast_path():
    # s8 x with no zero points: the jax path is a single int8 MXU conv
    rng = np.random.default_rng(17)
    x = rng.integers(-128, 128, (1, 3, 8, 8), dtype=np.int8)
    w = rng.integers(-128, 128, (4, 3, 3, 3), dtype=np.int8)
    g = _node_graph("ConvInteger", ["x", "w"], ["y"], {"w": w},
                    attrs={"pads": [1, 1, 1, 1]})
    (y,) = _both(g, {"x": x})
    want = _conv_int_ref(x, w, 0, 0, (1, 1), (1, 1))
    np.testing.assert_array_equal(y, want.astype(np.int32))


def test_qlinear_conv_per_channel_requant_with_bias():
    rng = np.random.default_rng(19)
    x = rng.integers(0, 256, (2, 3, 8, 8), dtype=np.uint8)
    w = rng.integers(-128, 128, (5, 3, 3, 3), dtype=np.int8)
    bias = rng.integers(-(2 ** 14), 2 ** 14, (5,), dtype=np.int32)
    x_s, y_s = np.float32(0.02), np.float32(0.11)
    w_s = rng.uniform(0.005, 0.03, (5,)).astype(np.float32)
    x_zp, y_zp = np.uint8(128), np.uint8(120)
    w_zp = np.zeros((5,), np.int8)  # symmetric weights (the common case)
    g = _node_graph(
        "QLinearConv",
        ["x", "xs", "xzp", "w", "ws", "wzp", "ys", "yzp", "b"], ["y"],
        {"xs": x_s, "xzp": x_zp, "w": w, "ws": w_s, "wzp": w_zp,
         "ys": y_s, "yzp": y_zp, "b": bias},
        attrs={"pads": [1, 1, 1, 1]},
    )
    (y,) = _both(g, {"x": x})
    acc = _conv_int_ref(x, w, 128, 0, (1, 1), (1, 1))
    acc = acc + bias.reshape(1, -1, 1, 1)
    mul = (x_s * w_s / y_s).astype(np.float32).reshape(1, -1, 1, 1)
    want = np.clip(
        np.rint(acc.astype(np.float32) * mul) + 120, 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(y, want)


def test_qlinear_matmul():
    rng = np.random.default_rng(23)
    a = rng.integers(0, 256, (4, 16), dtype=np.uint8)
    b = rng.integers(-128, 128, (16, 6), dtype=np.int8)
    a_s, b_s, y_s = np.float32(0.05), np.float32(0.01), np.float32(0.2)
    a_zp, y_zp = np.uint8(100), np.uint8(128)
    g = _node_graph(
        "QLinearMatMul",
        ["x", "as", "azp", "w", "bs", "bzp", "ys", "yzp"], ["y"],
        {"as": a_s, "azp": a_zp, "w": b, "bs": b_s,
         "bzp": np.int8(0), "ys": y_s, "yzp": y_zp},
    )
    (y,) = _both(g, {"x": a})
    acc = (a.astype(np.int64) - 100) @ b.astype(np.int64)
    mul = np.float32(a_s) * np.float32(b_s) / np.float32(y_s)
    want = np.clip(np.rint(acc.astype(np.float32) * mul) + 128,
                   0, 255).astype(np.uint8)
    np.testing.assert_array_equal(y, want)


# -------------------------------------------------- torch QDQ export oracle


class _FakeQuantModel(nn.Module):
    """A float model with fake-quantization on weights (per-channel) and
    activations (per-tensor) — torch exports these aten fake_quantize ops
    as QuantizeLinear/DequantizeLinear pairs, producing exactly the QDQ
    graphs onnxruntime's static quantizer emits."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(3)
        self.w1 = nn.Parameter(torch.randn(8, 3, 3, 3) * 0.2)
        self.b1 = nn.Parameter(torch.zeros(8))
        self.w2 = nn.Parameter(torch.randn(4, 8, 3, 3) * 0.2)
        self.b2 = nn.Parameter(torch.zeros(4))

    @staticmethod
    def _qw(w):
        scales = w.detach().abs().amax(dim=(1, 2, 3)) / 127.0
        zps = torch.zeros_like(scales, dtype=torch.int32)
        return torch.fake_quantize_per_channel_affine(
            w, scales, zps, 0, -128, 127)

    @staticmethod
    def _qa(x, scale):
        return torch.fake_quantize_per_tensor_affine(x, scale, 128, 0, 255)

    def forward(self, x):
        x = self._qa(x, 0.02)
        x = F.relu(F.conv2d(x, self._qw(self.w1), self.b1, padding=1))
        x = self._qa(x, 0.05)
        x = F.relu(F.conv2d(x, self._qw(self.w2), self.b2, stride=2,
                            padding=1))
        return x.flatten(1)


def test_torch_qdq_export_oracle(tmp_path):
    """torch's own QDQ export is the external reference output path:
    fake-quant model forward == numpy executor == jitted JAX path."""
    m = _FakeQuantModel().eval()
    x = torch.rand(2, 3, 16, 16)
    path = tmp_path / "qdq.onnx"
    _export(m, x, str(path))
    g = read_onnx_model(str(path))
    ops = {n.op_type for n in g.nodes}
    assert "QuantizeLinear" in ops and "DequantizeLinear" in ops, (
        "export did not produce a QDQ graph; ops: %s" % sorted(ops))
    with torch.no_grad():
        want = m(x).numpy()
    (got_np,) = run_graph(g, {g.inputs[0]: x.numpy()})
    np.testing.assert_allclose(got_np, want, atol=1e-5, rtol=1e-5)
    fn = compile_graph(g)
    name = g.inputs[0]
    (got_jax,) = jax.jit(lambda a: fn({name: a}))(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got_jax), want, atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_jax), got_np, atol=1e-6)


class _QdqForeignDetector(nn.Module):
    """Fake-quantized foreign detector (stride-8 head, v8-style output
    matrix) — exports to a QDQ detection graph like onnxruntime's static
    quantizer produces. No documented checkpoint layout matches it, so the
    engine must serve its graph directly, quantized ops and all."""

    def __init__(self, hw, nc):
        super().__init__()
        torch.manual_seed(5)
        self.c1 = nn.Conv2d(3, 16, 3, stride=2, padding=1)
        self.c2 = nn.Conv2d(16, 32, 3, stride=2, padding=1)
        self.c3 = nn.Conv2d(32, 32, 3, stride=2, padding=1)
        self.head = nn.Conv2d(32, 4 + nc, 1)
        self.size = float(hw[0])
        # scales precomputed as constants so the exporter's constant
        # folding turns every weight into an int8 initializer + a
        # DequantizeLinear node (the real QDQ artifact shape)
        for name, conv in (("c1", self.c1), ("c2", self.c2),
                           ("c3", self.c3), ("head", self.head)):
            s = conv.weight.detach().abs().amax(dim=(1, 2, 3)) / 127.0
            self.register_buffer(f"{name}_s", s + 1e-8)
            self.register_buffer(
                f"{name}_z", torch.zeros_like(s, dtype=torch.int32))

    def _qw(self, name, w):
        return torch.fake_quantize_per_channel_affine(
            w, getattr(self, f"{name}_s"), getattr(self, f"{name}_z"),
            0, -128, 127)

    @staticmethod
    def _qa(x, scale):
        return torch.fake_quantize_per_tensor_affine(x, scale, 128, 0, 255)

    def forward(self, x):
        x = self._qa(x, 0.004)  # input in [0, 1]
        x = F.relu(F.conv2d(x, self._qw("c1", self.c1.weight), self.c1.bias,
                            stride=2, padding=1))
        x = self._qa(x, 0.02)
        x = F.relu(F.conv2d(x, self._qw("c2", self.c2.weight), self.c2.bias,
                            stride=2, padding=1))
        x = self._qa(x, 0.02)
        x = F.relu(F.conv2d(x, self._qw("c3", self.c3.weight), self.c3.bias,
                            stride=2, padding=1))
        p = F.conv2d(x, self._qw("head", self.head.weight), self.head.bias)
        p = p.flatten(2)  # float head tail (QDQ exports keep heads float)
        xywh = torch.sigmoid(p[:, :4]) * self.size
        return torch.cat([xywh, torch.sigmoid(p[:, 4:])], dim=1)


def test_qdq_detector_serves_through_engine(tmp_path):
    """A pre-quantized (QDQ) detection export serves end to end through
    the fused engine step — the TPU analog of the reference's RKNN
    backend consuming a pre-quantized artifact (detector.py:705-869) —
    with int8 weights riding as device params, and detections matching
    the numpy-oracle reference path."""
    from test_onnx_graph_serving import HW, NC, _engine_for, \
        _reference_detections

    m = _QdqForeignDetector(HW, NC).eval()
    path = tmp_path / "qdq_det.onnx"
    _export(m, torch.rand(1, 3, *HW), str(path),
            dynamic_axes={"x": {0: "n"}})
    g = read_onnx_model(str(path))
    assert any(n.op_type == "QuantizeLinear" for n in g.nodes)

    eng = _engine_for(str(path))
    assert getattr(eng.model, "graph_backed", False)
    # quantized weights must ride as int8 runtime params, not folded fp32
    int8_params = [k for k, v in eng.model.init_params().items()
                   if np.asarray(v).dtype == np.int8]
    assert len(int8_params) >= 4, int8_params

    rng = np.random.default_rng(29)
    frames = rng.integers(0, 256, (2, *HW, 3), dtype=np.uint8)
    got = eng.predict_arrays(frames)
    ref = _reference_detections(
        str(path), frames, eng.config.confidence_threshold,
        eng.config.iou_threshold, eng.config.max_detections,
    )
    for i, (rb, rc, rid) in enumerate(ref):
        n = int(got.num_valid[i])
        assert n == len(rb), f"frame {i}: {n} vs oracle {len(rb)}"
        order = np.argsort(-got.scores[i][:n])
        np.testing.assert_allclose(
            got.scores[i][:n][order], rc, atol=1e-3, rtol=1e-3)
        np.testing.assert_array_equal(got.class_ids[i][:n][order], rid)
        np.testing.assert_allclose(got.boxes_xyxy[i][:n][order], rb,
                                   atol=0.5)


def test_unsupported_blocked_quantization_raises():
    x = np.zeros((2, 4), np.float32)
    g = _node_graph("QuantizeLinear", ["x", "s"], ["y"],
                    {"s": np.ones((2, 2), np.float32)})
    with pytest.raises(Exception, match="blocked quantization"):
        run_graph(g, {"x": x})


# ------------------------------------------------- review-fix regressions


def test_dynamic_quantize_then_matmul_integer_end_to_end():
    """The ORT dynamic-quantizer graph shape: DynamicQuantizeLinear
    feeding MatMulInteger with TRACED scale and zero point — both
    executors bit-agree, including the f32 scale arithmetic."""
    rng = np.random.default_rng(51)
    w = rng.integers(-128, 128, (6, 4), dtype=np.int8)
    g = OnnxGraph(
        nodes=[
            OnnxNode(op_type="DynamicQuantizeLinear", inputs=["x"],
                     outputs=["xq", "xs", "xzp"]),
            OnnxNode(op_type="MatMulInteger",
                     inputs=["xq", "w", "xzp", ""], outputs=["acc"]),
            OnnxNode(op_type="Cast", inputs=["acc"], outputs=["accf"],
                     attrs={"to": 1}),
            OnnxNode(op_type="Mul", inputs=["accf", "xs"], outputs=["y"]),
        ],
        initializers={"w": w},
        inputs=["x"],
        outputs=["y", "xs", "xzp"],
    )
    for seed in range(6):
        x = np.random.default_rng(seed).standard_normal(
            (3, 6)).astype(np.float32) * (seed + 0.3)
        want_y, want_s, want_z = run_graph(g, {"x": x})
        fn = compile_graph(g)
        got_y, got_s, got_z = jax.jit(lambda a: fn({"x": a}))(
            jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(got_s), want_s)
        np.testing.assert_array_equal(np.asarray(got_z), want_z)
        np.testing.assert_array_equal(np.asarray(got_y), want_y)


def test_dynamic_quantize_then_conv_integer_traced_zp():
    """ConvInteger with a TRACED x_zero_point (from DynamicQuantizeLinear)
    — exercises the traced-zp padding and correction-term branches."""
    rng = np.random.default_rng(53)
    w = rng.integers(-40, 40, (2, 3, 3, 3), dtype=np.int8)
    g = OnnxGraph(
        nodes=[
            OnnxNode(op_type="DynamicQuantizeLinear", inputs=["x"],
                     outputs=["xq", "xs", "xzp"]),
            OnnxNode(op_type="ConvInteger",
                     inputs=["xq", "w", "xzp"], outputs=["acc"],
                     attrs={"pads": [1, 1, 1, 1], "strides": [1, 1]}),
        ],
        initializers={"w": w},
        inputs=["x"],
        outputs=["acc"],
    )
    x = rng.standard_normal((1, 3, 6, 6)).astype(np.float32) * 2.0
    (want,) = run_graph(g, {"x": x})
    fn = compile_graph(g)
    (got,) = jax.jit(lambda a: fn({"x": a}))(jnp.asarray(x))
    assert np.asarray(got).dtype == want.dtype == np.int32
    np.testing.assert_array_equal(np.asarray(got), want)


def test_matmul_integer_1d_operands():
    """1-D MatMulInteger operands follow numpy matmul rank semantics in
    both executors (the jnp path previously crashed on nonzero zps)."""
    a = np.asarray([10, 200, 30, 77], dtype=np.uint8)
    b = np.arange(-8, 8, dtype=np.int8).reshape(4, 4)
    cases = [
        (["a", "b", "azp", "bzp"], {"a": a, "azp": np.uint8(7),
                                    "bzp": np.int8(-2)}, (4,)),
        (["b", "a2", "bzp", "azp"], {"a2": a.astype(np.int8),
                                     "azp": np.int8(3),
                                     "bzp": np.int8(1)}, (4,)),
    ]
    for inputs, extra, want_shape in cases:
        inits = {"b": b}
        inits.update(extra)
        g = OnnxGraph(
            nodes=[OnnxNode(op_type="MatMulInteger", inputs=inputs,
                            outputs=["y"])],
            initializers=inits, inputs=[], outputs=["y"],
        )
        (want,) = run_graph(g, {})
        assert want.shape == want_shape
        fn = compile_graph(g)
        (got,) = jax.jit(lambda: fn({}))()
        assert np.asarray(got).shape == want.shape
        np.testing.assert_array_equal(np.asarray(got), want)


def test_qlinear_requant_wraps_int32_like_device():
    """QLinearMatMul accumulators past 2^31 wrap to int32 in BOTH
    executors (the numpy oracle previously requantized from unwrapped
    int64, diverging from the device exactly where exactness docs
    claimed)."""
    k = 70000
    a = np.full((1, k), 255, dtype=np.uint8)
    b = np.full((k, 1), -128, dtype=np.int8)
    # acc = 255*-128*70000 = -2.2848e9 < -2^31: wraps positive in int32
    g = OnnxGraph(
        nodes=[OnnxNode(
            op_type="QLinearMatMul",
            inputs=["a", "as_", "azp", "b", "bs", "bzp", "ys", "yzp"],
            outputs=["y"])],
        initializers={
            "a": a, "as_": np.float32(1.0), "azp": np.uint8(0),
            "b": b, "bs": np.float32(1.0), "bzp": np.int8(0),
            "ys": np.float32(2.0e7), "yzp": np.uint8(128),
        },
        inputs=[], outputs=["y"],
    )
    (want,) = run_graph(g, {})
    fn = compile_graph(g)
    (got,) = jax.jit(lambda: fn({}))()
    np.testing.assert_array_equal(np.asarray(got), want)
    # and the wrapped value is the int32 one: -2284800000 + 2^32 > 0
    wrapped = np.int64(-255 * 128 * k) + (1 << 32)
    expect = np.clip(np.rint(np.float32(wrapped) * np.float32(1 / 2.0e7))
                     + 128, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(want, expect.reshape(want.shape))


def test_bf16_policy_keeps_quant_scales_fp32(tmp_path):
    """Under graph_precision: bf16 the engine's param cast must NOT
    truncate quantization scales to bf16 — the grid is the model's
    numerics. Weights still ride bf16/int8."""
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_onnx_graph_serving import HW, _engine_for

    m = _QdqForeignDetector(HW, 6).eval()
    path = tmp_path / "qdq_det.onnx"
    _export(m, torch.rand(1, 3, *HW), str(path),
            dynamic_axes={"x": {0: "n"}})
    eng = _engine_for(str(path), graph_precision="bf16")
    scale_names = eng.model.fp32_param_names
    assert scale_names, "expected quant scales riding as runtime params"
    f32 = bf16 = 0
    for k, v in eng.params.items():
        dt = jnp.asarray(v).dtype
        if k in scale_names:
            assert dt == jnp.float32, (k, dt)
            f32 += 1
        elif jnp.issubdtype(dt, jnp.floating):
            assert dt == jnp.bfloat16, (k, dt)
            bf16 += 1
    assert f32 >= 1 and bf16 >= 1
    # and serving still agrees with the fp32-served engine on detections
    e32 = _engine_for(str(path))
    rng = np.random.default_rng(61)
    frames = rng.integers(0, 256, (2, *HW, 3), dtype=np.uint8)
    a = e32.predict_arrays(frames)
    bq = eng.predict_arrays(frames)
    np.testing.assert_array_equal(a.num_valid, bq.num_valid)

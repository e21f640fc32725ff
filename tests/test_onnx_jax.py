"""ONNX->JAX graph compiler fidelity (models/onnx_jax.py).

The generic-graph serving path must agree with BOTH oracles:

* torch itself (the exporter's semantics) — same harness as the numpy
  executor's op gates;
* the numpy executor ``onnx_exec.run_graph`` (already pinned op-by-op
  against torch) — full-graph agreement at tight tolerance.

Everything runs through ``jax.jit`` — the compiler's whole point is that
an arbitrary user ONNX graph becomes ONE fused XLA program with static
shapes (reference detector.py:484-609 serves arbitrary graphs through ONNX
Runtime; this is the TPU-native counterpart).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_analytics_tpu.models.onnx_exec import run_graph  # noqa: E402
from realtime_analytics_tpu.models.onnx_jax import (  # noqa: E402
    compile_graph,
    graph_input_name,
)
from realtime_analytics_tpu.models.onnx_lite import read_onnx_model  # noqa: E402

from test_onnx_graph_exec import _export  # noqa: E402


def _check_jax(model, x, path, atol=1e-4, fold=True):
    """Export, compile with onnx_jax, run under jit, diff vs torch AND vs
    the numpy executor."""
    model = model.eval()
    _export(model, x, str(path), fold=fold)
    with torch.no_grad():
        want = model(x)
    wants = want if isinstance(want, (tuple, list)) else (want,)

    g = read_onnx_model(str(path))
    fn = compile_graph(g)
    name = g.inputs[0]
    jitted = jax.jit(lambda a: fn({name: a}))
    outs = jitted(jnp.asarray(x.numpy()))
    np_outs = run_graph(g, {name: x.numpy()})
    assert len(outs) == len(wants) == len(np_outs)
    for got, w, np_got in zip(outs, wants, np_outs):
        got = np.asarray(got)
        np.testing.assert_allclose(got, w.numpy(), atol=atol, rtol=1e-4)
        np.testing.assert_allclose(got, np_got, atol=atol, rtol=1e-4)


# ---------------------------------------------------------------------------
# op-level: the jnp twins agree with torch and the numpy executor


def test_conv_variants(tmp_path):
    torch.manual_seed(0)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.Conv2d(3, 8, 3, stride=2, padding=1)
            self.b = nn.Conv2d(8, 8, 3, padding=2, dilation=2, groups=8)
            self.c = nn.Conv2d(8, 6, 1, bias=False)

        def forward(self, x):
            return self.c(self.b(self.a(x)))

    _check_jax(M(), torch.rand(2, 3, 33, 47), tmp_path / "conv.onnx")


def test_conv3d_and_pools(tmp_path):
    torch.manual_seed(1)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.Conv3d(2, 6, 3, stride=(1, 2, 2), padding=1)
            self.b = nn.Conv3d(6, 6, (1, 3, 3), padding=(0, 1, 1), groups=3)

        def forward(self, x):
            y = torch.relu(self.a(x))
            y = nn.functional.max_pool3d(y, (1, 2, 2))
            y = self.b(y)
            return nn.functional.avg_pool3d(y, 2, stride=1)

    _check_jax(M(), torch.rand(2, 2, 5, 18, 21), tmp_path / "c3.onnx")


def test_pool_ceil_and_pad(tmp_path):
    torch.manual_seed(2)

    class M(nn.Module):
        def forward(self, x):
            y = nn.functional.max_pool2d(x, 3, stride=2, padding=1)
            y = nn.functional.max_pool2d(y, 3, stride=2, ceil_mode=True)
            return nn.functional.avg_pool2d(y, 2, stride=2, ceil_mode=True)

    _check_jax(M(), torch.rand(1, 3, 29, 31), tmp_path / "pool.onnx")


def test_norm_linear_act_resize(tmp_path):
    torch.manual_seed(3)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.bn = nn.BatchNorm2d(3)
            self.fc = nn.Linear(3 * 8 * 8, 11)

        def forward(self, x):
            y = self.bn(x)
            y = nn.functional.interpolate(y, scale_factor=2, mode="nearest")
            y = nn.functional.interpolate(
                y, size=(8, 8), mode="bilinear", align_corners=False
            )
            y = torch.sigmoid(y) * torch.tanh(y) + y.clamp(0.1, 0.7)
            return nn.functional.softmax(self.fc(y.flatten(1)), dim=-1)

    # BN stats need fold=False to survive as BatchNormalization
    m = M().eval()
    with torch.no_grad():
        m.bn.running_mean.uniform_(-0.3, 0.3)
        m.bn.running_var.uniform_(0.6, 1.5)
    _check_jax(m, torch.rand(2, 3, 13, 9), tmp_path / "misc.onnx", fold=False)


def test_shuffling_ops(tmp_path):
    torch.manual_seed(4)

    class M(nn.Module):
        def forward(self, x):
            a, b = torch.chunk(x, 2, dim=1)
            y = torch.cat([b, a], dim=1).permute(0, 2, 3, 1)
            y = y.reshape(y.shape[0], -1, y.shape[-1])
            return y[:, 2:-2:2].unsqueeze(1).squeeze(1)

    _check_jax(M(), torch.rand(2, 4, 9, 8), tmp_path / "shuf.onnx")


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_scan(bidirectional, tmp_path):
    torch.manual_seed(5)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(10, 7, batch_first=True,
                                bidirectional=bidirectional)

        def forward(self, x):
            hs, (h, c) = self.lstm(x)
            return hs, h, c

    _check_jax(M(), torch.rand(3, 6, 10), tmp_path / "lstm.onnx")


@pytest.mark.parametrize("bidirectional", [False, True])
def test_gru_scan(bidirectional, tmp_path):
    torch.manual_seed(6)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.gru = nn.GRU(8, 5, batch_first=True,
                              bidirectional=bidirectional)

        def forward(self, x):
            hs, h = self.gru(x)
            return hs, h

    _check_jax(M(), torch.rand(2, 9, 8), tmp_path / "gru.onnx")


def test_unsupported_op_raises(tmp_path):
    from realtime_analytics_tpu.models.onnx_exec import UnsupportedOnnxOp

    class M(nn.Module):  # torch.nonzero -> ONNX NonZero: dynamic output
        def forward(self, x):  # shape, unjittable by design
            return torch.nonzero(x > 0.5)

    _export(M().eval(), torch.rand(1, 2, 5, 5), str(tmp_path / "nz.onnx"))
    g = read_onnx_model(str(tmp_path / "nz.onnx"))
    fn = compile_graph(g)
    with pytest.raises(UnsupportedOnnxOp, match="NonZero"):
        jax.jit(lambda a: fn({g.inputs[0]: a}))(
            jnp.zeros((1, 2, 5, 5), jnp.float32)
        )


# ---------------------------------------------------------------------------
# full-graph: one jitted XLA program per model family


def test_full_yolo_graph_jits(tmp_path):
    """The exported YOLO mirror (v8) compiles to ONE jitted program whose
    outputs match the numpy executor's."""
    from torch_mirror import TorchYoloMirror

    from realtime_analytics_tpu.models.yolo import build_yolo

    torch.manual_seed(7)
    tm = TorchYoloMirror(build_yolo("yolov8", "n", nc=80)).eval()
    path = tmp_path / "v8.onnx"
    _export(tm, torch.rand(1, 3, 160, 160), str(path))
    g = read_onnx_model(str(path))
    x = np.random.default_rng(11).random((1, 3, 160, 160)).astype(np.float32)
    fn = compile_graph(g)
    jitted = jax.jit(lambda a: fn({g.inputs[0]: a}))
    got = [np.asarray(o) for o in jitted(jnp.asarray(x))]
    ref = run_graph(g, {g.inputs[0]: x})
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-3)


def test_full_temporal_graphs_jit(tmp_path):
    """All four temporal-family exports run as jitted programs and match
    the numpy executor (LSTM scan, unrolled ConvGRU, 3-D convs)."""
    from test_temporal_checkpoints import CLIP, MIRRORS

    for i, (model_type, M) in enumerate(sorted(MIRRORS.items())):
        torch.manual_seed(30 + i)
        tm = M().eval()
        clips = torch.rand(*CLIP)
        path = tmp_path / f"{model_type}.onnx"
        _export(tm, clips, str(path))
        g = read_onnx_model(str(path))
        fn = compile_graph(g)
        name = graph_input_name(g)
        jitted = jax.jit(lambda a, fn=fn, name=name: fn({name: a}))
        (got,) = jitted(jnp.asarray(clips.numpy()))
        (ref,) = run_graph(g, {name: clips.numpy()})
        np.testing.assert_allclose(
            np.asarray(got), ref, atol=1e-3, rtol=1e-3, err_msg=model_type
        )


# ---------------------------------------------------------------------------
# optional-output / optional-input placeholders


def test_omitted_optional_output_never_clobbers_absent_sentinel():
    """ONNX marks an unused optional OUTPUT with the empty-string
    placeholder — the same "" that marks an absent optional INPUT. A node
    writing its omitted output must not overwrite the values[""] = None
    sentinel, or every later omitted input receives that tensor (an LSTM
    with Y unused followed by Clip with no min bound was the repro: the
    Clip's min became the LSTM's full Y)."""
    from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

    torch.manual_seed(40)
    hid, inp, t_len = 4, 3, 2
    w = np.random.default_rng(12).standard_normal(
        (1, 4 * hid, inp)).astype(np.float32)
    r = np.random.default_rng(13).standard_normal(
        (1, 4 * hid, hid)).astype(np.float32)
    hi = np.float32(0.1)

    def graph(y_name):
        return OnnxGraph(
            nodes=[
                OnnxNode("LSTM", inputs=["x", "w", "r"],
                         outputs=[y_name, "hn", "cn"],
                         attrs={"hidden_size": hid}),
                # Clip with min OMITTED ("") and max from initializer
                OnnxNode("Clip", inputs=["hn", "", "hi"], outputs=["out"]),
            ],
            initializers={"w": w, "r": r, "hi": hi},
            inputs=["x"], outputs=["out"],
        )

    x = np.random.default_rng(14).standard_normal(
        (t_len, 1, inp)).astype(np.float32)
    trap, control = graph(""), graph("y_unused")
    (want,) = run_graph(control, {"x": x})

    (got_np,) = run_graph(trap, {"x": x})
    assert got_np.shape == want.shape, (
        f"omitted LSTM Y leaked into Clip's min: shape {got_np.shape}"
    )
    np.testing.assert_allclose(got_np, want, atol=1e-6)

    fn = compile_graph(trap)
    (got_jax,) = jax.jit(lambda a: fn({"x": a}))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_jax), want, atol=1e-5)


# ---------------------------------------------------------------------------
# broadened op set: the export families real users bring (MobileNet-class,
# ViT-class, U-Net/decoder-class) must serve through the generic path


def test_mobilenetv3_block(tmp_path):
    """MobileNetV3 building block: depthwise conv + HardSwish/HardSigmoid
    + squeeze-excite (GlobalAveragePool path) + residual."""
    torch.manual_seed(50)

    class SE(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.fc1 = nn.Conv2d(c, c // 4, 1)
            self.fc2 = nn.Conv2d(c // 4, c, 1)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = torch.relu(self.fc1(s))
            return x * torch.nn.functional.hardsigmoid(self.fc2(s))

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.expand = nn.Conv2d(8, 24, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(24)
            self.dw = nn.Conv2d(24, 24, 5, padding=2, groups=24, bias=False)
            self.bn2 = nn.BatchNorm2d(24)
            self.se = SE(24)
            self.project = nn.Conv2d(24, 8, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(8)
            self.act = nn.Hardswish()

        def forward(self, x):
            y = self.act(self.bn1(self.expand(x)))
            y = self.act(self.bn2(self.dw(y)))
            y = self.se(y)
            return x + self.bn3(self.project(y))

    _check_jax(M(), torch.rand(2, 8, 14, 17), tmp_path / "mnv3.onnx")


def test_vit_encoder_block(tmp_path):
    """ViT-class encoder block: LayerNormalization (native at opset 17),
    einsum attention, GELU (erf decomposition) MLP, residuals."""
    torch.manual_seed(51)
    d, heads = 32, 4

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = nn.LayerNorm(d)
            self.qkv = nn.Linear(d, 3 * d)
            self.proj = nn.Linear(d, d)
            self.ln2 = nn.LayerNorm(d)
            self.mlp = nn.Sequential(
                nn.Linear(d, 2 * d), nn.GELU(), nn.Linear(2 * d, d)
            )

        def forward(self, x):  # [N, T, D]
            n, t, _ = x.shape
            h = self.ln1(x)
            qkv = self.qkv(h).reshape(n, t, 3, heads, d // heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            att = torch.einsum("nqhd,nkhd->nhqk", q, k) / (d // heads) ** 0.5
            att = torch.softmax(att, dim=-1)
            out = torch.einsum("nhqk,nkhd->nqhd", att, v).reshape(n, t, d)
            x = x + self.proj(out)
            return x + self.mlp(self.ln2(x))

    _check_jax(M(), torch.rand(2, 9, d), tmp_path / "vit.onnx")


def test_unet_decoder_block(tmp_path):
    """Decoder-class exports: ConvTranspose upsampling, reflect Pad, skip
    concat, InstanceNorm, GroupNorm, PixelShuffle (DepthToSpace), Elu."""
    torch.manual_seed(52)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.up = nn.ConvTranspose2d(16, 8, 4, stride=2, padding=1)
            self.inorm = nn.InstanceNorm2d(8, affine=True)
            self.conv = nn.Conv2d(16, 16, 3, padding=0)
            self.gn = nn.GroupNorm(4, 16)
            self.shuffle = nn.PixelShuffle(2)

        def forward(self, x, skip):
            y = torch.nn.functional.elu(self.inorm(self.up(x)))
            y = torch.cat([y, skip], dim=1)
            y = torch.nn.functional.pad(y, (1, 1, 1, 1), mode="reflect")
            y = self.gn(self.conv(y))
            return self.shuffle(y)  # [N, 4, 2H, 2W]

    m = M().eval()
    x, skip = torch.rand(2, 16, 6, 7), torch.rand(2, 8, 12, 14)
    path = tmp_path / "unet.onnx"
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda b, c: b
    try:
        torch.onnx.export(m, (x, skip), str(path), opset_version=17,
                          dynamo=False, input_names=["x", "skip"])
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
    with torch.no_grad():
        want = m(x, skip)
    g = read_onnx_model(str(path))
    fn = compile_graph(g)
    jitted = jax.jit(lambda a, b: fn({"x": a, "skip": b}))
    (got,) = jitted(jnp.asarray(x.numpy()), jnp.asarray(skip.numpy()))
    (np_got,) = run_graph(g, {"x": x.numpy(), "skip": skip.numpy()})
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np_got,
                               atol=1e-5, rtol=1e-5)


def test_elementwise_and_compare_ops(tmp_path):
    torch.manual_seed(53)

    class M(nn.Module):
        def forward(self, x):
            a = torch.abs(x) + torch.floor(x) - torch.ceil(x)
            b = torch.round(x) * torch.sign(x)
            c = torch.log(torch.abs(x) + 1.0) + torch.reciprocal(x + 3.0)
            d = torch.sin(x) * torch.cos(x)
            e = torch.where((x > 0.5) & (x < 0.9), a, b)
            f = torch.where((x <= 0.2) | (x >= 0.8), c, d)
            g_ = torch.nn.functional.softplus(x) + torch.nn.functional.elu(
                x - 0.5
            )
            h = torch.remainder(x * 7.0, 3.0) + torch.fmod(x * 5.0 - 2.0, 2.0)
            return e + f + g_ + h

    _check_jax(M(), torch.rand(3, 4, 5), tmp_path / "elem.onnx")


def test_reduce_arg_topk_ops(tmp_path):
    torch.manual_seed(54)

    class M(nn.Module):
        def forward(self, x):
            mins = x.amin(dim=2, keepdim=True)
            prods = (1.0 + x * 0.1).prod(dim=1, keepdim=True)
            l2 = torch.norm(x, p=2, dim=2, keepdim=True)
            am = x.argmax(dim=2).to(torch.float32)
            cs = torch.cumsum(x, dim=2)
            vals, idx = torch.topk(x, k=3, dim=2)
            tri = torch.tril(x.mean(dim=0))
            gathered = torch.gather(
                x, 2, torch.argsort(x, dim=2)[:, :, :2]
            )
            return (mins + prods + l2, am.unsqueeze(2) + cs,
                    vals + idx.to(torch.float32), tri, gathered)

    _check_jax(M(), torch.rand(2, 6, 8), tmp_path / "reduce.onnx")


def test_activation_tail_ops(tmp_path):
    """LogSoftmax / GlobalMaxPool / Selu / Celu — the classifier-head and
    exotic-activation glue."""
    torch.manual_seed(55)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 6, 3, padding=1)

        def forward(self, x):
            y = torch.selu(self.conv(x))
            y = torch.celu(y, alpha=0.7)
            pooled = torch.nn.functional.adaptive_max_pool2d(y, 1)
            return torch.log_softmax(pooled.flatten(1), dim=-1)

    _check_jax(M(), torch.rand(2, 3, 9, 11), tmp_path / "tail.onnx")


def test_cumsum_exclusive_reverse_combos():
    """torch only exports exclusive=0/reverse=0 — pin the other three
    combos on hand-built graphs against a manual reference, in both
    executors."""
    from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

    x = np.arange(1, 13, dtype=np.float32).reshape(3, 4)

    def manual(exclusive, reverse, axis=1):
        out = np.zeros_like(x)
        n = x.shape[axis]
        for i in range(n):
            if reverse:
                sl = slice(i + 1, None) if exclusive else slice(i, None)
            else:
                sl = slice(0, i) if exclusive else slice(0, i + 1)
            out[:, i] = x[:, sl].sum(axis=axis)
        return out

    for exclusive in (0, 1):
        for reverse in (0, 1):
            g = OnnxGraph(
                nodes=[OnnxNode("CumSum", inputs=["x", "ax"],
                                outputs=["y"],
                                attrs={"exclusive": exclusive,
                                       "reverse": reverse})],
                initializers={"ax": np.array(1, np.int64)},
                inputs=["x"], outputs=["y"],
            )
            want = manual(exclusive, reverse)
            (got_np,) = run_graph(g, {"x": x})
            np.testing.assert_allclose(
                got_np, want, err_msg=f"oracle ex={exclusive} rev={reverse}"
            )
            fn = compile_graph(g)
            (got_jax,) = jax.jit(lambda a, fn=fn: fn({"x": a}))(
                jnp.asarray(x))
            np.testing.assert_allclose(
                np.asarray(got_jax), want,
                err_msg=f"jax ex={exclusive} rev={reverse}",
            )


def test_conv_transpose_asymmetric_pads():
    """ONNX allows asymmetric ConvTranspose pads (torch never emits them);
    pin both executors on a hand-built graph against the dilate-pad-conv
    definition computed with torch's functional conv."""
    from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

    rng = np.random.default_rng(60)
    x = rng.standard_normal((1, 2, 5, 6)).astype(np.float32)
    w = rng.standard_normal((2, 3, 3, 3)).astype(np.float32)  # [C, M, kH, kW]
    g = OnnxGraph(
        nodes=[OnnxNode("ConvTranspose", inputs=["x", "w"], outputs=["y"],
                        attrs={"strides": [2, 2], "pads": [1, 0, 2, 1]})],
        initializers={"w": w},
        inputs=["x"], outputs=["y"],
    )
    # reference: zero-stuff by stride, then full conv with flipped kernel,
    # then crop pads from each edge
    xt = torch.from_numpy(x)
    wt = torch.from_numpy(w)
    full = torch.nn.functional.conv_transpose2d(xt, wt, stride=2)
    want = full[:, :, 1 : full.shape[2] - 2, 0 : full.shape[3] - 1].numpy()

    (got_np,) = run_graph(g, {"x": x})
    np.testing.assert_allclose(got_np, want, atol=1e-5)
    fn = compile_graph(g)
    (got_jax,) = jax.jit(lambda a: fn({"x": a}))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_jax), want, atol=1e-4)


# ---------------------------------------------------------------------------
# round-4 review regressions: pool dilations/auto_pad, integer Div
# truncation, Shape start/end, N-D Resize guard


def test_maxpool_dilations(tmp_path):
    """torch MaxPool2d(dilation=...) exports MaxPool dilations — both
    executors must honor them (previously silently pooled undilated)."""
    torch.manual_seed(41)

    class M(nn.Module):
        def forward(self, x):
            y = nn.functional.max_pool2d(x, 3, stride=2, dilation=2)
            return nn.functional.max_pool2d(
                y, 3, stride=2, padding=1, dilation=2, ceil_mode=True
            )

    _check_jax(M(), torch.rand(2, 3, 37, 41), tmp_path / "mpd.onnx")


def _expect_unsupported_both(g, feeds):
    """Both executors must REJECT the graph (clean fallback), never run it
    with silently wrong semantics."""
    from realtime_analytics_tpu.models.onnx_exec import UnsupportedOnnxOp

    with pytest.raises(UnsupportedOnnxOp):
        run_graph(g, feeds)
    fn = compile_graph(g)
    with pytest.raises(UnsupportedOnnxOp):
        jax.jit(lambda a: fn({"x": a}))(jnp.asarray(feeds["x"]))


def test_pool_unsupported_attrs_rejected():
    """auto_pad on pools and AveragePool dilations are out of the supported
    set: both executors raise UnsupportedOnnxOp instead of pooling with
    wrong windows."""
    from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

    x = np.random.default_rng(42).standard_normal((1, 2, 8, 8)).astype(
        np.float32
    )
    for op, attrs in [
        ("MaxPool", {"kernel_shape": [3, 3], "auto_pad": "SAME_UPPER"}),
        ("AveragePool", {"kernel_shape": [3, 3], "auto_pad": "SAME_LOWER"}),
        ("AveragePool", {"kernel_shape": [2, 2], "dilations": [2, 2]}),
    ]:
        g = OnnxGraph(
            nodes=[OnnxNode(op, inputs=["x"], outputs=["y"], attrs=attrs)],
            inputs=["x"], outputs=["y"],
        )
        _expect_unsupported_both(g, {"x": x})


def test_resize_3d_rejected():
    """5-D (trilinear) Resize must raise the clean UnsupportedOnnxOp (the
    designed fallback contract), not a ValueError from tuple unpacking."""
    from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

    x = np.random.default_rng(43).standard_normal((1, 2, 3, 4, 4)).astype(
        np.float32
    )
    g = OnnxGraph(
        nodes=[OnnxNode(
            "Resize", inputs=["x", "", "scales"], outputs=["y"],
            attrs={"mode": "nearest"},
        )],
        initializers={
            "scales": np.array([1, 1, 2, 2, 2], np.float32),
        },
        inputs=["x"], outputs=["y"],
    )
    _expect_unsupported_both(g, {"x": x})


def test_integer_div_truncates_toward_zero():
    """ONNX Div on ints truncates toward zero (C semantics, what ONNX
    Runtime does); numpy/jnp // floors — both executors must adjust."""
    from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

    x = np.array([[-7, -7, 7], [7, -9, 9]], np.int64)
    d = np.array([2, -2, -4], np.int64)
    want = np.trunc(x / d).astype(np.int64)  # [[-3, 3, -1], [3, 4, -2]]
    g = OnnxGraph(
        nodes=[OnnxNode("Div", inputs=["x", "d"], outputs=["y"])],
        initializers={"d": d},
        inputs=["x"], outputs=["y"],
    )
    (got_np,) = run_graph(g, {"x": x})
    np.testing.assert_array_equal(got_np, want)
    assert got_np.dtype == np.int64
    fn = compile_graph(g)
    (got_jax,) = jax.jit(lambda a: fn({"x": a}))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got_jax), want)


def test_shape_start_end_attrs():
    """opset-15 Shape start/end slice the returned shape — the static fold
    must honor them or all downstream shape math silently corrupts."""
    from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

    x = np.zeros((2, 3, 4, 5), np.float32)
    g = OnnxGraph(
        nodes=[
            OnnxNode("Shape", inputs=["x"], outputs=["s1"],
                     attrs={"start": 1}),
            OnnxNode("Shape", inputs=["x"], outputs=["s2"],
                     attrs={"start": 1, "end": 3}),
            OnnxNode("Shape", inputs=["x"], outputs=["s3"],
                     attrs={"end": -1}),
        ],
        inputs=["x"], outputs=["s1", "s2", "s3"],
    )
    for got in (run_graph(g, {"x": x}),
                compile_graph(g)({"x": jnp.asarray(x)})):
        np.testing.assert_array_equal(np.asarray(got[0]), [3, 4, 5])
        np.testing.assert_array_equal(np.asarray(got[1]), [3, 4])
        np.testing.assert_array_equal(np.asarray(got[2]), [2, 3, 4])

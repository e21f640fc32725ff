"""ONNX graph-executor fidelity gates (r3 VERDICT #2: break the
fidelity-oracle circularity).

The round-3 gates compared ``models/yolo.py`` against ``torch_mirror.py`` —
two implementations by the same author, so a shared misunderstanding would
pass. Here the REFERENCE OUTPUT PATH is an ONNX graph evaluated by
``models/onnx_exec.py`` (numpy): the graph is torch's own export (torch's
tracer decides the ops and their semantics), and the evaluator is pinned
op-by-op against torch itself below. No code from torch_mirror.py or
models/yolo.py computes the reference outputs.

Layers of the gate:
1. op-level: tiny torch modules exported and diffed against torch — pins
   the executor's op semantics to torch's, op by op.
2. end-to-end: a torch-exported full YOLO graph (v8 + v5) on the same
   input as ``JaxYoloEngine``'s model — the JAX boxes/scores must match
   the graph evaluation.
3. published gate: arms the moment a real Ultralytics ``yolov8n.onnx``
   (full graph, not a weights container) lands in the tree — evaluates
   the published graph itself on the golden scene and diffs the served
   detections against it.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from realtime_analytics_tpu.models.onnx_exec import run_graph  # noqa: E402
from realtime_analytics_tpu.models.onnx_lite import read_onnx_model  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _export(model, args, path, fold=True, dynamic_axes=None):
    """torch.onnx.export without the ``onnx`` package: the final
    _add_onnxscript_fn hop only splices custom onnxscript functions into the
    proto (a no-op for stock ops) but imports ``onnx`` unconditionally —
    bypass it. The proto bytes are already complete at that point."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda b, c: b
    try:
        torch.onnx.export(
            model, args, path, opset_version=17, dynamo=False,
            do_constant_folding=fold,
            input_names=["x"],
            dynamic_axes=dynamic_axes,
        )
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def _check(model, x, path, atol=1e-5, fold=True):
    model = model.eval()
    _export(model, x, str(path), fold=fold)
    with torch.no_grad():
        want = model(x)
    outs = run_graph(str(path), {"x": x.numpy()})
    wants = want if isinstance(want, (tuple, list)) else (want,)
    assert len(outs) == len(wants)
    for got, w in zip(outs, wants):
        np.testing.assert_allclose(got, w.numpy(), atol=atol, rtol=1e-4)


# ---------------------------------------------------------------------------
# 1. op-level fidelity vs torch


def test_conv_variants_match_torch(tmp_path):
    torch.manual_seed(0)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.Conv2d(3, 8, 3, stride=2, padding=1)
            self.b = nn.Conv2d(8, 8, 3, padding=2, dilation=2, groups=8)
            self.c = nn.Conv2d(8, 6, 1, bias=False)
            self.d = nn.Conv2d(6, 6, 5, padding=2, groups=2)

        def forward(self, x):
            return self.d(self.c(self.b(self.a(x))))

    _check(M(), torch.rand(2, 3, 33, 47), tmp_path / "conv.onnx")


def test_pool_variants_match_torch(tmp_path):
    torch.manual_seed(1)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.p1 = nn.MaxPool2d(3, stride=2, padding=1)
            self.p2 = nn.MaxPool2d(2, stride=2, ceil_mode=True)
            self.p3 = nn.MaxPool2d(5, stride=1, padding=2)  # SPPF shape
            self.gap = nn.AdaptiveAvgPool2d(1)

        def forward(self, x):
            y = self.p3(self.p2(self.p1(x)))
            return self.gap(y)

    _check(M(), torch.rand(1, 4, 29, 31), tmp_path / "pool.onnx")


def test_avgpool_ceil_mode_matches_torch(tmp_path):
    # review r4: ceil-mode AveragePool must EXCLUDE the ceil-extension
    # padding from the divisor (torch counts only positions inside the
    # explicitly-padded extent) — a plain window mean over-counted the
    # extension zeros by up to 0.30 absolute
    torch.manual_seed(7)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.p1 = nn.AvgPool2d(3, stride=2, ceil_mode=True)
            self.p2 = nn.AvgPool2d(2, stride=2, padding=1,
                                   ceil_mode=True, count_include_pad=True)

        def forward(self, x):
            return self.p1(x), self.p2(x)

    for hw in ((8, 8), (10, 13)):
        _check(M(), torch.rand(1, 3, *hw), tmp_path / f"avg{hw[0]}.onnx")


def test_split_uneven_remainder_matches_torch(tmp_path):
    # review r4: Split with no sizes over a non-divisible axis must emit
    # ceil-sized chunks with a smaller last chunk (torch.chunk semantics),
    # not floor-sized chunks that silently drop the remainder
    torch.manual_seed(8)

    class M(nn.Module):
        def forward(self, x):
            a, b = torch.chunk(x, 2, dim=1)  # 5 channels -> [3, 2]
            return a.sum(dim=1, keepdim=True) + b.sum(dim=1, keepdim=True)

    _check(M(), torch.rand(1, 5, 6, 6), tmp_path / "split.onnx")


def test_resize_nearest_and_bilinear_match_torch(tmp_path):
    torch.manual_seed(2)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.up_n = nn.Upsample(scale_factor=2, mode="nearest")
            self.up_b = nn.Upsample(scale_factor=2, mode="bilinear",
                                    align_corners=False)

        def forward(self, x):
            return self.up_n(x), self.up_b(x)

    _check(M(), torch.rand(1, 3, 10, 14), tmp_path / "resize.onnx")


def test_norm_act_linear_match_torch(tmp_path):
    torch.manual_seed(3)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 6, 3, padding=1)
            self.bn = nn.BatchNorm2d(6)
            self.fc = nn.Linear(6, 5)

        def forward(self, x):
            y = torch.nn.functional.silu(self.bn(self.conv(x)))
            y = y.mean(dim=(2, 3))
            return torch.softmax(self.fc(y), dim=-1)

    m = M()
    with torch.no_grad():  # non-trivial BN running stats
        m.bn.running_mean.uniform_(-1, 1)
        m.bn.running_var.uniform_(0.5, 2.0)
    # fold=False keeps BatchNormalization as a graph node
    _check(m, torch.rand(2, 3, 12, 12), tmp_path / "bn.onnx", fold=False)


def test_tensor_shuffling_ops_match_torch(tmp_path):
    torch.manual_seed(4)

    class M(nn.Module):
        def forward(self, x):
            a, b = x.chunk(2, dim=1)  # Split
            y = torch.cat([b, a], dim=1)[:, :, 1:-1:2, ::2]  # Concat+Slice
            y = y.permute(0, 2, 3, 1).reshape(y.shape[0], -1, y.shape[1])
            z = y.unsqueeze(-1).expand(*y.shape, 3)
            return z.flatten(1), torch.clamp(y, 0.1, 0.7)

    _check(M(), torch.rand(2, 4, 9, 8), tmp_path / "shuffle.onnx")


def test_unsupported_op_raises_clearly(tmp_path):
    from realtime_analytics_tpu.models.onnx_exec import UnsupportedOnnxOp

    class M(nn.Module):  # torch.nonzero -> ONNX NonZero: dynamic output
        def forward(self, x):  # shape, deliberately outside the op set
            return torch.nonzero(x > 0.5)

    _export(M().eval(), torch.rand(1, 2, 5, 5), str(tmp_path / "nz.onnx"))
    with pytest.raises(UnsupportedOnnxOp, match="NonZero"):
        run_graph(str(tmp_path / "nz.onnx"),
                  {"x": np.zeros((1, 2, 5, 5), np.float32)})


def test_conv_transpose_variants_match_torch(tmp_path):
    """ONNX ConvTranspose (decoder/U-Net upsampling): strides,
    output_padding, groups, dilation, and the 3-D variant."""
    torch.manual_seed(21)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.ConvTranspose2d(6, 8, 4, stride=2, padding=1)
            self.b = nn.ConvTranspose2d(8, 8, 3, stride=2, padding=1,
                                        output_padding=1, groups=4)
            self.c = nn.ConvTranspose2d(8, 5, 3, dilation=2, padding=2,
                                        bias=False)

        def forward(self, x):
            return self.c(self.b(self.a(x)))

    _check(M(), torch.rand(2, 6, 7, 9), tmp_path / "convt.onnx")

    class M3(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.ConvTranspose3d(3, 4, (1, 4, 4), stride=(1, 2, 2),
                                        padding=(0, 1, 1))

        def forward(self, x):
            return self.a(x)

    _check(M3(), torch.rand(1, 3, 4, 6, 5), tmp_path / "convt3.onnx")


def test_conv3d_variants_match_torch(tmp_path):
    """3-D convs export as the same ONNX ``Conv`` op — the temporal
    families (3d_cnn / slow_fast) are built from these."""
    torch.manual_seed(3)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.Conv3d(2, 6, 3, stride=(1, 2, 2), padding=1)
            self.b = nn.Conv3d(6, 6, (1, 3, 3), padding=(0, 1, 1), groups=3)
            self.c = nn.Conv3d(6, 4, 3, padding=2, dilation=2, bias=False)

        def forward(self, x):
            return self.c(self.b(self.a(x)))

    _check(M(), torch.rand(2, 2, 5, 14, 17), tmp_path / "conv3d.onnx")


def test_pool3d_variants_match_torch(tmp_path):
    torch.manual_seed(4)

    class M(nn.Module):
        def forward(self, x):
            y = nn.functional.max_pool3d(x, (1, 2, 2))
            y = nn.functional.max_pool3d(y, 2, stride=2, padding=1)
            y = nn.functional.max_pool3d(y, 3, stride=2, ceil_mode=True)
            return nn.functional.avg_pool3d(y, 2, stride=1)

    _check(M(), torch.rand(1, 3, 9, 21, 23), tmp_path / "pool3d.onnx")


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch(bidirectional, tmp_path):
    """torch nn.LSTM exports as the ONNX ``LSTM`` node (iofc gate pack) —
    the recurrent core of the cnn_lstm family."""
    torch.manual_seed(5)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(10, 7, batch_first=True,
                                bidirectional=bidirectional)
            self.fc = nn.Linear(14 if bidirectional else 7, 3)

        def forward(self, x):
            hs, _ = self.lstm(x)
            return self.fc(hs.mean(dim=1))

    _check(M(), torch.rand(3, 6, 10), tmp_path / "lstm.onnx")


@pytest.mark.parametrize("bidirectional", [False, True])
def test_gru_matches_torch(bidirectional, tmp_path):
    """torch nn.GRU exports as ONNX ``GRU`` with linear_before_reset=1."""
    torch.manual_seed(6)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.gru = nn.GRU(8, 5, batch_first=True,
                              bidirectional=bidirectional)

        def forward(self, x):
            hs, h = self.gru(x)
            return hs, h

    _check(M(), torch.rand(2, 9, 8), tmp_path / "gru.onnx")


def test_jax_temporal_matches_torch_exported_graph(tmp_path):
    """Every temporal family (models/temporal.py + loader) vs torch's own
    export of the documented checkpoint architecture — closes the same
    oracle circularity for the temporal engines as the YOLO/ResNet gates:
    the mirror only *builds* the graph; onnx_exec evaluates it."""
    from test_temporal_checkpoints import CLIP, MIRRORS, _state_dict

    from realtime_analytics_tpu.models.temporal import build_temporal
    from realtime_analytics_tpu.models.weights import (
        temporal_params_from_state_dict,
    )

    for i, (model_type, M) in enumerate(sorted(MIRRORS.items())):
        torch.manual_seed(20 + i)
        tm = M().eval()
        clips = torch.rand(*CLIP)
        path = tmp_path / f"{model_type}.onnx"
        _export(tm, clips, str(path))
        g = read_onnx_model(str(path))
        assert len(g.nodes) > 5, f"{model_type}: export produced no graph"
        (ref,) = run_graph(g, {g.inputs[0]: clips.numpy()})

        jm = build_temporal(model_type, ref.shape[-1])
        params = temporal_params_from_state_dict(jm, _state_dict(tm))
        got = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(clips.numpy())))
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3,
                                   err_msg=model_type)


# ---------------------------------------------------------------------------
# 2. end-to-end: torch-exported YOLO graph vs the JAX engine


@pytest.mark.parametrize("model_type", ["yolov8", "yolov5"])
def test_jax_yolo_matches_torch_exported_graph(model_type, tmp_path):
    """models/yolo.py + loader vs torch's export of the architecture.
    The reference outputs come from onnx_exec evaluating the exported
    graph — torch_mirror only *builds* the graph (its torch ops define
    the semantics); none of its code runs in the comparison path."""
    from torch_mirror import TorchYoloMirror

    from realtime_analytics_tpu.models.weights import yolo_params_from_state_dict
    from realtime_analytics_tpu.models.yolo import build_yolo

    torch.manual_seed(7)
    jm = build_yolo(model_type, "n", nc=80)
    tm = TorchYoloMirror(jm).eval()
    path = tmp_path / f"{model_type}.onnx"
    _export(tm, torch.rand(1, 3, 160, 160), str(path))

    # the exported graph is batch-static (shape constants folded at trace
    # time) — evaluate at the export batch
    x = np.random.default_rng(11).random((1, 160, 160, 3)).astype(np.float32)
    # reference: the exported graph, evaluated with numpy
    g = read_onnx_model(str(path))
    assert len(g.nodes) > 50, "export produced no real graph"
    ref_boxes, ref_scores = run_graph(
        g, {g.inputs[0]: x.transpose(0, 3, 1, 2)}
    )

    # candidate: the JAX model with params ingested from the checkpoint
    params = yolo_params_from_state_dict(jm, tm.ultralytics_state_dict())
    out = jax.jit(jm.apply)(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out["boxes_xyxy"]), ref_boxes, atol=1e-1, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["scores"]), ref_scores, atol=2e-3, rtol=1e-3
    )


def test_jax_resnet_matches_torch_exported_graph(tmp_path):
    """models/resnet.py + loader vs torch's export of the torchvision
    resnet18 architecture — same non-circularity as the YOLO gates: the
    mirror only *builds* the graph (torch defines the semantics); the
    reference outputs come from onnx_exec evaluating the export."""
    from test_resnet_fidelity import TorchResNet18

    from realtime_analytics_tpu.models.resnet import build_resnet
    from realtime_analytics_tpu.models.weights import resnet_params_from_state_dict

    torch.manual_seed(9)
    tm = TorchResNet18(num_classes=23).eval()
    path = tmp_path / "resnet18.onnx"
    _export(tm, torch.rand(1, 3, 96, 96), str(path))

    x = np.random.default_rng(13).random((2, 96, 96, 3)).astype(np.float32)
    g = read_onnx_model(str(path))
    assert len(g.nodes) > 30, "export produced no real graph"
    # the export traces batch-1; evaluate per-sample
    ref = np.concatenate([
        run_graph(g, {g.inputs[0]: x[i : i + 1].transpose(0, 3, 1, 2)})[0]
        for i in range(x.shape[0])
    ])

    jm = build_resnet("resnet18", num_classes=23)
    params = resnet_params_from_state_dict(jm, tm.state_dict())
    got = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# 3. published-graph gate (arms when a real Ultralytics export lands)


def _published_graph():
    for cand in ("yolov8n.onnx", "models/yolov8n.onnx"):
        p = os.path.join(REPO, cand)
        if os.path.exists(p):
            g = read_onnx_model(p)
            if g.nodes:  # full graph, not a weights-only container
                return p, g
    return None, None


def test_published_onnx_graph_gate():
    """Runs automatically the moment a published yolov8n.onnx (full graph)
    lands in the tree: evaluates the PUBLISHED graph on the golden scene
    with onnx_exec and requires the engine's served detections to match
    its top candidates. Skips (armed) until then — network is blocked in
    the build environment."""
    path, g = _published_graph()
    if path is None:
        pytest.skip("no published yolov8n.onnx in tree — gate armed")
    cv2 = pytest.importorskip("cv2")
    scene = cv2.imread(os.path.join(REPO, "tests", "data", "golden_scene.png"))
    assert scene is not None
    from realtime_analytics_tpu.ops.preprocess import letterbox_spec

    spec = letterbox_spec(scene.shape[:2], (640, 640))
    img = cv2.resize(scene, (spec.new_w, spec.new_h))
    canvas = np.full((640, 640, 3), 114, np.uint8)
    canvas[spec.pad_top : spec.pad_top + spec.new_h,
           spec.pad_left : spec.pad_left + spec.new_w] = img
    x = canvas[..., ::-1].astype(np.float32).transpose(2, 0, 1)[None] / 255.0
    (pred,) = run_graph(g, {g.inputs[0]: x})
    # ultralytics end-to-end layout: [1, 4+nc, anchors], xywh letterboxed px
    assert pred.ndim == 3 and pred.shape[1] >= 5
    xywh = pred[0, :4].T
    cls = pred[0, 4:].T
    best = cls.max(axis=1)
    keep = best > 0.25
    assert keep.sum() > 0, "published graph found nothing on the golden scene"
    ref_xyxy = np.stack([
        xywh[keep, 0] - xywh[keep, 2] / 2, xywh[keep, 1] - xywh[keep, 3] / 2,
        xywh[keep, 0] + xywh[keep, 2] / 2, xywh[keep, 1] + xywh[keep, 3] / 2,
    ], axis=1)

    # the engine serving the same published weights must reproduce every
    # confident graph candidate (pre-NMS IoU match)
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine
    from realtime_analytics_tpu.types import FramePacket
    from realtime_analytics_tpu.config import StreamConfig

    eng = JaxYoloEngine(DetectorConfig(
        model_path=path, model_type="yolov8", confidence_threshold=0.25,
        input_size=[640, 640], batch_buckets=[1], max_batch_size=1,
        precision="fp32", warmup=False,
    ))
    pkt = FramePacket(StreamConfig(name="g", url="synthetic://"), scene, 0, 0.0)
    dets = eng.predict_packets([pkt])[0]
    assert dets, "engine served no detections from the published checkpoint"
    det_boxes = np.asarray([d.bbox_xyxy for d in dets], np.float32)
    # map graph candidates (letterboxed px) back to original-frame px
    ref_orig = np.stack([
        (ref_xyxy[:, 0] - spec.pad_left) / spec.scale,
        (ref_xyxy[:, 1] - spec.pad_top) / spec.scale,
        (ref_xyxy[:, 2] - spec.pad_left) / spec.scale,
        (ref_xyxy[:, 3] - spec.pad_top) / spec.scale,
    ], axis=1)
    for rb in ref_orig[np.argsort(-best[keep])][:5]:
        ious = _iou_one_to_many(rb, det_boxes)
        assert ious.max() > 0.8, (
            f"graph candidate {rb} not served (best IoU {ious.max():.2f})"
        )


def _iou_one_to_many(box, boxes):
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (a + b - inter + 1e-9)

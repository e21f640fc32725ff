"""Generic ONNX-graph serving (models/onnx_graph_model.py).

The reference's ONNX backends serve ARBITRARY user exports — the graph
defines the architecture (reference detector.py:484-609,
temporal_detector.py:179-319). These tests build torch models whose module
naming matches NO documented checkpoint layout, export them to ONNX, and
require each engine to fall back to compiling the graph itself and serve
it with the same results as the pinned numpy executor / torch:

* detection: engine detections vs a reference numpy path (onnx_exec +
  reference-style decode + greedy NMS);
* static-batch vs dynamic-batch exports (vmap vs direct serving);
* temporal: clip predictions vs torch's own forward;
* classification: top-k vs torch's own forward.
"""

import os
import sys
import time

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from realtime_analytics_tpu.config import DetectorConfig, StreamConfig  # noqa: E402
from realtime_analytics_tpu.engine.detector import (  # noqa: E402
    JaxResNetEngine,
    JaxYoloEngine,
)
from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine  # noqa: E402
from realtime_analytics_tpu.models.onnx_exec import run_graph  # noqa: E402
from realtime_analytics_tpu.models.onnx_lite import read_onnx_model  # noqa: E402
from realtime_analytics_tpu.types import FramePacket  # noqa: E402

from test_onnx_graph_exec import _export  # noqa: E402

HW = (64, 64)
NC = 6


class ForeignDetector(nn.Module):
    """A detector matching NO known layout: stride-8 conv head emitting
    the v8-style prediction matrix [N, 4+nc, A] (xywh in input pixels,
    post-sigmoid class scores)."""

    def __init__(self, nc=NC, bake_batch=False):
        super().__init__()
        self.backbone = nn.Sequential(
            nn.Conv2d(3, 16, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv2d(16, 32, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv2d(32, 32, 3, stride=2, padding=1), nn.ReLU(),
        )
        self.head = nn.Conv2d(32, 4 + nc, 1)
        self.bake_batch = bake_batch
        self.nc = nc

    def forward(self, x):
        p = self.head(self.backbone(x))  # [N, 4+nc, h, w]
        if self.bake_batch:
            # batch-1 baked into the reshape — how stock static Ultralytics
            # exports look (the adapter must fall back to vmap serving)
            p = p.reshape(1, 4 + self.nc, -1)
        else:
            p = p.flatten(2)  # [N, 4+nc, A]
        size = float(HW[0])
        xywh = torch.sigmoid(p[:, :4]) * size
        cls = torch.sigmoid(p[:, 4:])
        return torch.cat([xywh, cls], dim=1)


def _reference_detections(path, frames, conf_thr, iou_thr, max_det):
    """The oracle path: numpy graph evaluation + reference decode
    (detector.py:266-338 with the v8 fix) + greedy NMS (:361-375).
    Identity letterbox (frames already at input size): preprocess is
    BGR->RGB + /255 only."""
    g = read_onnx_model(path)
    out = []
    for f in frames:
        x = (f[..., ::-1].astype(np.float32) / 255.0).transpose(2, 0, 1)
        (pred,) = run_graph(g, {g.inputs[0]: x[None]})
        pred = pred[0].T  # [A, 4+nc]
        xywh, cls = pred[:, :4], pred[:, 4:]
        conf = cls.max(axis=1)
        ids = cls.argmax(axis=1)
        keep = conf >= conf_thr
        xywh, conf, ids = xywh[keep], conf[keep], ids[keep]
        boxes = np.stack([
            xywh[:, 0] - xywh[:, 2] / 2, xywh[:, 1] - xywh[:, 3] / 2,
            xywh[:, 0] + xywh[:, 2] / 2, xywh[:, 1] + xywh[:, 3] / 2,
        ], axis=1)
        # clip to frame (reference _scale_boxes clips)
        h, w = f.shape[:2]
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w - 1)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h - 1)
        order = np.argsort(-conf)
        kept = []
        while order.size and len(kept) < max_det:
            i = order[0]
            kept.append(i)
            rest = order[1:]
            x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
            y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
            x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
            y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[rest, 2] - boxes[rest, 0]) * \
                (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (a + b - inter + 1e-9)
            order = rest[iou <= iou_thr]
        out.append((boxes[kept], conf[kept], ids[kept]))
    return out


def _engine_for(path, **over):
    kw = dict(
        model_path=str(path), model_type="yolov8", backend="onnx",
        confidence_threshold=0.3, iou_threshold=0.45,
        input_size=list(HW), max_batch_size=4, warmup=False,
        precision="fp32", num_classes=NC,
    )
    kw.update(over)
    return JaxYoloEngine(DetectorConfig(**kw))


@pytest.fixture(scope="module")
def foreign_onnx(tmp_path_factory):
    d = tmp_path_factory.mktemp("foreign")
    static = d / "static.onnx"
    dynamic = d / "dynamic.onnx"
    # identical weights, two export styles
    torch.manual_seed(100)
    m = ForeignDetector(bake_batch=True).eval()
    _export(m, torch.rand(1, 3, *HW), str(static))
    torch.manual_seed(100)
    m = ForeignDetector(bake_batch=False).eval()
    _export(m, torch.rand(1, 3, *HW), str(dynamic),
            dynamic_axes={"x": {0: "n"}})
    return {"static": str(static), "dynamic": str(dynamic)}


@pytest.mark.parametrize("kind", ["static", "dynamic"])
def test_foreign_detector_serves_via_graph(foreign_onnx, kind):
    """An unknown-layout detection ONNX must serve through the generic
    graph path with reference-faithful decode + NMS."""
    eng = _engine_for(foreign_onnx[kind])
    assert getattr(eng.model, "graph_backed", False), (
        "engine did not fall back to the ONNX graph model"
    )
    # static-batch export must be detected and served via vmap
    assert eng.model.dynamic_batch == (kind == "dynamic")

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (3, *HW, 3), dtype=np.uint8)
    got = eng.predict_arrays(frames)
    ref = _reference_detections(
        foreign_onnx[kind], frames, eng.config.confidence_threshold,
        eng.config.iou_threshold, eng.config.max_detections,
    )
    for i, (rb, rc, rid) in enumerate(ref):
        n = int(got.num_valid[i])
        assert n == len(rb), f"frame {i}: {n} detections vs oracle {len(rb)}"
        order = np.argsort(-got.scores[i][:n])
        np.testing.assert_allclose(
            got.scores[i][:n][order], rc, atol=1e-3, rtol=1e-3
        )
        np.testing.assert_array_equal(got.class_ids[i][:n][order], rid)
        np.testing.assert_allclose(
            got.boxes_xyxy[i][:n][order], rb, atol=0.5
        )


def test_static_and_dynamic_exports_agree(foreign_onnx):
    """vmap serving of a batch-1-baked export == direct serving of the
    dynamic export, bit-for-bit on the same batch."""
    e_static = _engine_for(foreign_onnx["static"])
    e_dynamic = _engine_for(foreign_onnx["dynamic"])
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, (3, *HW, 3), dtype=np.uint8)
    a = e_static.predict_arrays(frames)
    b = e_dynamic.predict_arrays(frames)
    np.testing.assert_array_equal(a.num_valid, b.num_valid)
    np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)
    np.testing.assert_allclose(a.boxes_xyxy, b.boxes_xyxy, atol=1e-2)


class ForeignTemporal(nn.Module):
    """cnn_lstm-family model with foreign module names ([N,T,C,H,W] in,
    logits out — the reference's CNN-LSTM ONNX contract)."""

    def __init__(self, nc=5, hid=24):
        super().__init__()
        self.enc = nn.Conv2d(3, 12, 3, stride=4, padding=1)
        self.rnn = nn.LSTM(12, hid, batch_first=True)
        self.cls = nn.Linear(hid, nc)

    def forward(self, x):  # [N, T, C, H, W]
        n, t = x.shape[0], x.shape[1]
        y = torch.relu(self.enc(x.flatten(0, 1)))
        y = y.mean(dim=(2, 3)).reshape(n, t, -1)
        hs, _ = self.rnn(y)
        return self.cls(hs[:, -1])


def test_foreign_temporal_serves_via_graph(tmp_path):
    torch.manual_seed(101)
    t_len = 4
    m = ForeignTemporal().eval()
    path = tmp_path / "temporal.onnx"
    _export(m, torch.rand(1, t_len, 3, 32, 32), str(path),
            dynamic_axes={"x": {0: "n"}})

    cfg = DetectorConfig(
        model_path=str(path), model_type="cnn_lstm", backend="onnx",
        input_size=[32, 32], sequence_length=t_len, sequence_stride=1,
        num_action_classes=5, warmup=False, precision="fp32",
        max_batch_size=2,
        confidence_threshold=0.01,  # random-weight softmax over 5 ~ 0.2
    )
    eng = JaxTemporalEngine(cfg)
    assert getattr(eng.model, "graph_backed", False)

    rng = np.random.default_rng(7)
    stream = StreamConfig(name="s", url="mem://")
    seq = [
        FramePacket(stream, rng.integers(0, 256, (32, 32, 3), np.uint8),
                    i, time.time())
        for i in range(t_len)
    ]
    dets = eng.predict_clips([seq])[0]
    assert dets, "graph-backed temporal engine produced no detections"

    # oracle: torch forward on the SAME preprocessing (ImageNet-normalized
    # RGB, the engine's cnn_lstm contract)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    clip = np.stack([p.frame[..., ::-1].astype(np.float32) / 255.0
                     for p in seq])
    clip = (clip - mean) / std
    with torch.no_grad():
        logits = m(torch.from_numpy(
            clip.transpose(0, 3, 1, 2)[None].astype(np.float32)
        ))
        probs = torch.softmax(logits, dim=-1)[0].numpy()
    top = np.argsort(-probs)
    for d, cls_id in zip(dets, top[: len(dets)]):
        assert d.class_id == cls_id
        np.testing.assert_allclose(d.confidence, probs[cls_id], atol=1e-3)


class ForeignClassifier(nn.Module):
    def __init__(self, nc=9):
        super().__init__()
        self.feat = nn.Sequential(
            nn.Conv2d(3, 10, 5, stride=2, padding=2), nn.ReLU(),
            nn.Conv2d(10, 20, 3, stride=2, padding=1), nn.ReLU(),
        )
        self.out = nn.Linear(20, nc)

    def forward(self, x):
        return self.out(self.feat(x).mean(dim=(2, 3)))


def test_foreign_classifier_serves_via_graph(tmp_path):
    torch.manual_seed(102)
    m = ForeignClassifier().eval()
    path = tmp_path / "cls.onnx"
    _export(m, torch.rand(1, 3, 48, 48), str(path),
            dynamic_axes={"x": {0: "n"}})

    cfg = DetectorConfig(
        model_path=str(path), model_type="resnet", backend="onnx",
        input_size=[48, 48], num_classes=9, resnet_top_k=3,
        warmup=False, precision="fp32", max_batch_size=2,
        resnet_scores="softmax",  # positive scores so the confidence
        confidence_threshold=0.001,  # threshold can stay in (0, 1]
    )
    eng = JaxResNetEngine(cfg)
    assert getattr(eng.model, "graph_backed", False)

    rng = np.random.default_rng(8)
    frame = rng.integers(0, 256, (48, 48, 3), np.uint8)
    stream = StreamConfig(name="s", url="mem://")
    dets = eng.predict(FramePacket(stream, frame, 0, time.time()))
    assert len(dets) == 3

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (frame[..., ::-1].astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        logits = m(torch.from_numpy(
            x.transpose(2, 0, 1)[None].astype(np.float32)
        ))
        probs = torch.softmax(logits, dim=-1)[0].numpy()
    top = np.argsort(-probs)[:3]
    for d, cls_id in zip(dets, top):
        assert d.class_id == cls_id
        np.testing.assert_allclose(d.confidence, probs[cls_id], atol=1e-3)


def test_graph_backed_engine_exports_rvae(foreign_onnx, tmp_path):
    """AOT `.rvae` export works for graph-backed engines too (jax.export
    of the fused step — the graph is just another jittable closure):
    exported serving must be bit-identical to the live graph engine."""
    from realtime_analytics_tpu.engine.export import (
        ExportedYoloEngine,
        export_serving_artifact,
    )

    live = _engine_for(
        foreign_onnx["dynamic"], batch_buckets=[2], max_batch_size=2
    )
    path = str(tmp_path / "foreign.rvae")
    export_serving_artifact(live, path, src_hws=[HW])
    exported = ExportedYoloEngine(DetectorConfig(
        model_path=path, model_type="yolov8",
        confidence_threshold=0.3, iou_threshold=0.45,
        input_size=list(HW), max_batch_size=2, batch_buckets=[2],
        warmup=False, precision="fp32", num_classes=NC,
    ))
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (2, *HW, 3), dtype=np.uint8)
    a = live.predict_arrays(frames)
    b = exported.predict_arrays(frames)
    np.testing.assert_array_equal(a.num_valid, b.num_valid)
    np.testing.assert_allclose(a.scores, b.scores, atol=1e-6)
    np.testing.assert_allclose(a.boxes_xyxy, b.boxes_xyxy, atol=1e-4)


def test_documented_layout_still_prefers_native_model(tmp_path):
    """A DOCUMENTED-layout weights-.onnx must keep loading through the
    named ingestion path (native JAX model), not the graph fallback."""
    from test_temporal_checkpoints import TorchCNNLSTM, _state_dict

    from realtime_analytics_tpu.models.onnx_lite import write_onnx_initializers

    torch.manual_seed(103)
    tm = TorchCNNLSTM(nc=5).eval()
    path = tmp_path / "named.onnx"
    write_onnx_initializers(str(path), dict(_state_dict(tm)))
    cfg = DetectorConfig(
        model_path=str(path), model_type="cnn_lstm", backend="onnx",
        input_size=[32, 32], sequence_length=4, num_action_classes=5,
        warmup=False, precision="fp32",
    )
    eng = JaxTemporalEngine(cfg)
    assert not getattr(eng.model, "graph_backed", False)


def test_probe_traces_params_abstract(monkeypatch, tmp_path):
    """A graph whose FLOAT initializer feeds a static-shape position
    (float -> Cast(int64) -> Reshape target) used to be the probe trap:
    live serving feeds params as traced arguments, so the Reshape target
    went traced and the graph had to be REJECTED by the abstract probe.
    Round 4's load-time constant folding (``fold_constants``) resolves
    the whole chain to a static target BEFORE params are promoted, so the
    graph now simply serves — assert that, and that the folded program
    computes the right thing. (Shape positions fed by the graph INPUT
    still trace traced and still fail the probe — covered by the
    static-export vmap tests.)"""
    import realtime_analytics_tpu.models.onnx_graph_model as ogm
    from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

    g = OnnxGraph(
        nodes=[
            OnnxNode("Cast", inputs=["tgt"], outputs=["tgt_i"],
                     attrs={"to": 7}),  # float init -> int64
            OnnxNode("Reshape", inputs=["x", "tgt_i"], outputs=["y"]),
            OnnxNode("Mul", inputs=["y", "two"], outputs=["out"]),
        ],
        initializers={
            "tgt": np.array([1.0, 12.0], np.float32),
            "two": np.array(2.0, np.float32),
        },
        inputs=["x"], outputs=["out"],
    )
    monkeypatch.setattr(ogm, "read_onnx_model", lambda p: g)
    got = ogm.try_load_graph_model(
        str(tmp_path / "probe_trap.onnx"), "classifier", input_hw=(2, 2)
    )
    assert got is not None, (
        "constant folding should make this graph servable (static Reshape "
        "target), not leave it to the probe to reject"
    )
    # the folded static target must survive live jitted serving
    x = np.arange(12, dtype=np.float32).reshape(1, 2, 2, 3)
    out = np.asarray(got.apply(got.init_params(), jnp.asarray(x)))
    want = x.transpose(0, 3, 1, 2).reshape(1, 12) * 2.0
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_graph_backed_serves_fp32_under_default_precision(foreign_onnx):
    """A foreign graph's numerics are the user's contract: the engine must
    serve fp32 END TO END (params AND the device preprocess feeding the
    graph) even under the default bf16 precision — bf16 pixel rounding
    would diverge from the user's ONNX Runtime baseline."""
    import jax.numpy as jnp

    eng_bf16 = _engine_for(foreign_onnx["dynamic"], precision="bf16")
    assert eng_bf16.compute_dtype == jnp.float32
    eng_fp32 = _engine_for(foreign_onnx["dynamic"])  # precision="fp32"

    rng = np.random.default_rng(10)
    frames = rng.integers(0, 256, (2, *HW, 3), dtype=np.uint8)
    a = eng_bf16.predict_arrays(frames)
    b = eng_fp32.predict_arrays(frames)
    np.testing.assert_array_equal(a.num_valid, b.num_valid)
    np.testing.assert_array_equal(a.scores, b.scores)
    np.testing.assert_array_equal(a.boxes_xyxy, b.boxes_xyxy)


class ForeignMobileNetV3(nn.Module):
    """MobileNetV3-class classifier: depthwise conv, HardSwish/HardSigmoid,
    squeeze-excite — the round-4 op-set additions, end to end through the
    serving engine."""

    def __init__(self, nc=7):
        super().__init__()
        self.stem = nn.Conv2d(3, 16, 3, stride=2, padding=1)
        self.dw = nn.Conv2d(16, 16, 3, padding=1, groups=16)
        self.se1 = nn.Conv2d(16, 8, 1)
        self.se2 = nn.Conv2d(8, 16, 1)
        self.proj = nn.Conv2d(16, 24, 1)
        self.act = nn.Hardswish()
        self.out = nn.Linear(24, nc)

    def forward(self, x):
        y = self.act(self.stem(x))
        y = self.act(self.dw(y))
        s = y.mean((2, 3), keepdim=True)
        y = y * torch.nn.functional.hardsigmoid(
            self.se2(torch.relu(self.se1(s))))
        y = self.act(self.proj(y))
        return self.out(y.mean(dim=(2, 3)))


class ForeignViT(nn.Module):
    """ViT-class classifier: conv patch embed, LayerNorm (native ONNX op
    at opset 17), einsum attention, GELU MLP."""

    def __init__(self, nc=7, d=24, heads=3):
        super().__init__()
        self.patch = nn.Conv2d(3, d, 8, stride=8)
        self.ln1 = nn.LayerNorm(d)
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)
        self.ln2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(nn.Linear(d, 2 * d), nn.GELU(),
                                 nn.Linear(2 * d, d))
        self.head = nn.Linear(d, nc)
        self.d, self.heads = d, heads

    def forward(self, x):
        n = x.shape[0]
        y = self.patch(x).flatten(2).transpose(1, 2)  # [N, T, D]
        t = y.shape[1]
        h = self.ln1(y)
        qkv = self.qkv(h).reshape(n, t, 3, self.heads, self.d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = torch.einsum("nqhd,nkhd->nhqk", q, k) \
            / (self.d // self.heads) ** 0.5
        att = torch.softmax(att, dim=-1)
        out = torch.einsum("nhqk,nkhd->nqhd", att, v).reshape(n, t, self.d)
        y = y + self.proj(out)
        y = y + self.mlp(self.ln2(y))
        return self.head(y.mean(dim=1))


@pytest.mark.parametrize("family", ["mobilenetv3", "vit"])
def test_modern_classifier_families_serve_via_graph(family, tmp_path):
    """MobileNetV3- and ViT-class exports (the op families added in
    round 4) serve end to end through the classifier engine and match
    torch's own probabilities."""
    torch.manual_seed(110)
    m = (ForeignMobileNetV3() if family == "mobilenetv3"
         else ForeignViT()).eval()
    path = tmp_path / f"{family}.onnx"
    _export(m, torch.rand(1, 3, 48, 48), str(path),
            dynamic_axes={"x": {0: "n"}})

    cfg = DetectorConfig(
        model_path=str(path), model_type="resnet", backend="onnx",
        input_size=[48, 48], num_classes=7, resnet_top_k=3,
        warmup=False, precision="fp32", max_batch_size=2,
        resnet_scores="softmax", confidence_threshold=0.001,
    )
    eng = JaxResNetEngine(cfg)
    assert getattr(eng.model, "graph_backed", False)

    rng = np.random.default_rng(11)
    frame = rng.integers(0, 256, (48, 48, 3), np.uint8)
    stream = StreamConfig(name="s", url="mem://")
    dets = eng.predict(FramePacket(stream, frame, 0, time.time()))
    assert len(dets) == 3

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (frame[..., ::-1].astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        logits = m(torch.from_numpy(
            x.transpose(2, 0, 1)[None].astype(np.float32)))
        probs = torch.softmax(logits, dim=-1)[0].numpy()
    top = np.argsort(-probs)[:3]
    for d, cls_id in zip(dets, top):
        assert d.class_id == cls_id
        np.testing.assert_allclose(d.confidence, probs[cls_id], atol=1e-3)


class Foreign3DCNN(nn.Module):
    """NCTHW-layout temporal export (the 3d_cnn/slow_fast input contract,
    reference temporal_detector.py:554-593)."""

    def __init__(self, nc=5):
        super().__init__()
        self.c1 = nn.Conv3d(3, 8, (3, 3, 3), stride=(1, 2, 2), padding=1)
        self.c2 = nn.Conv3d(8, 12, (3, 3, 3), stride=(2, 2, 2), padding=1)
        self.cls = nn.Linear(12, nc)

    def forward(self, x):  # [N, C, T, H, W]
        y = torch.relu(self.c1(x))
        y = torch.relu(self.c2(y))
        return self.cls(y.mean(dim=(2, 3, 4)))


def test_foreign_3dcnn_serves_via_graph(tmp_path):
    """Channels-first-time (NCTHW) foreign graphs serve through the
    temporal engine with the 0.45/0.225 preprocessing contract."""
    torch.manual_seed(103)
    t_len = 4
    m = Foreign3DCNN().eval()
    path = tmp_path / "c3d.onnx"
    _export(m, torch.rand(1, 3, t_len, 32, 32), str(path),
            dynamic_axes={"x": {0: "n"}})

    cfg = DetectorConfig(
        model_path=str(path), model_type="3d_cnn", backend="onnx",
        input_size=[32, 32], sequence_length=t_len, sequence_stride=1,
        num_action_classes=5, warmup=False, precision="fp32",
        max_batch_size=2, confidence_threshold=0.01,
    )
    eng = JaxTemporalEngine(cfg)
    assert getattr(eng.model, "graph_backed", False)

    rng = np.random.default_rng(13)
    stream = StreamConfig(name="s", url="mem://")
    seq = [
        FramePacket(stream, rng.integers(0, 256, (32, 32, 3), np.uint8),
                    i, time.time())
        for i in range(t_len)
    ]
    dets = eng.predict_clips([seq])[0]
    assert dets, "graph-backed 3d_cnn engine produced no detections"

    # oracle: torch forward on the engine's 3d-family preprocessing
    clip = np.stack([p.frame[..., ::-1].astype(np.float32) / 255.0
                     for p in seq])           # [T, H, W, C]
    clip = (clip - 0.45) / 0.225
    x = clip.transpose(3, 0, 1, 2)[None]      # [1, C, T, H, W]
    with torch.no_grad():
        probs = torch.softmax(m(torch.from_numpy(
            x.astype(np.float32))), dim=-1)[0].numpy()
    top = np.argsort(-probs)
    for d, cls_id in zip(dets, top[: len(dets)]):
        assert d.class_id == cls_id
        np.testing.assert_allclose(d.confidence, probs[cls_id], atol=1e-3)


# ---------------------------------------------------------------------------
# round-4 review regressions


def test_pad_float_cval_initializer_stays_static(monkeypatch, tmp_path):
    """torch constant-folded exports of F.pad(value=c) carry the pad value
    as a float scalar INITIALIZER; serving_params must keep it static (the
    executor needs a concrete jnp.pad constant) or the probe rejects a
    perfectly servable graph and the engine silently serves random init."""
    import realtime_analytics_tpu.models.onnx_graph_model as ogm
    from realtime_analytics_tpu.models.onnx_graph_model import serving_params
    from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

    g = OnnxGraph(
        nodes=[
            OnnxNode("Pad", inputs=["x", "pads", "cval"], outputs=["y"]),
            OnnxNode("Mul", inputs=["y", "w"], outputs=["out"]),
        ],
        initializers={
            "pads": np.array([0, 0, 1, 1, 0, 0, 1, 1], np.int64),
            "cval": np.array(0.5, np.float32),
            "w": np.array(2.0, np.float32),
        },
        inputs=["x"], outputs=["out"],
    )
    sp = serving_params(g)
    assert "cval" not in sp, "Pad constant_value must stay compile-time"
    assert "w" in sp, "ordinary float weights still ride as params"

    monkeypatch.setattr(ogm, "read_onnx_model", lambda p: g)
    gm = ogm.try_load_graph_model(
        str(tmp_path / "pad.onnx"), "classifier", input_hw=(4, 4)
    )
    assert gm is not None, "Pad float constant_value rejected the graph"
    x = np.random.default_rng(5).random((2, 4, 4, 3)).astype(np.float32)
    got = np.asarray(jax.jit(gm.apply)(gm.init_params(), jnp.asarray(x)))
    # ImageNet-normalized NCHW is the classifier-adapter input contract;
    # apply() only transposes, so mirror with numpy
    xn = x.transpose(0, 3, 1, 2)
    want = np.pad(xn, ((0, 0), (0, 0), (1, 1), (1, 1)),
                  constant_values=0.5) * 2.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pad_float_constant_value_torch_export(tmp_path):
    """End to end on a real torch export containing F.pad(value=0.5)."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 4, 3)
            self.fc = nn.Linear(4, 5)

        def forward(self, x):
            y = nn.functional.pad(x, (1, 1, 1, 1), value=0.5)
            y = torch.relu(self.conv(y))
            return self.fc(y.mean(dim=(2, 3)))

    from realtime_analytics_tpu.models.onnx_graph_model import (
        try_load_graph_model,
    )

    torch.manual_seed(7)
    m = M().eval()
    path = tmp_path / "padded.onnx"
    _export(m, torch.rand(1, 3, *HW), str(path),
            dynamic_axes={"x": {0: "n"}})
    gm = try_load_graph_model(str(path), "classifier", input_hw=HW)
    assert gm is not None
    x = np.random.default_rng(6).random((2, *HW, 3)).astype(np.float32)
    got = np.asarray(jax.jit(gm.apply)(gm.init_params(), jnp.asarray(x)))
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_orientation_matches_anchor_count(monkeypatch, tmp_path):
    """A many-class head at a small input makes 4+nc EXCEED the anchor
    count; the [N, C, A] vs [N, A, C] orientation must match against the
    standard head's anchor count, not assume channels is the smaller dim."""
    import realtime_analytics_tpu.models.onnx_graph_model as ogm
    from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

    hw = (64, 64)
    nc = 100
    ch = 4 + nc                                        # 104 channels
    anchors = sum((64 // s) ** 2 for s in (8, 16, 32))  # 84 anchors
    assert ch > anchors, "test needs the pathological orientation"
    bias = np.zeros((ch, anchors), np.float32)
    bias[0], bias[1] = 10.0, 10.0   # xywh identical at every anchor
    bias[2], bias[3] = 4.0, 4.0
    bias[4:] = 0.1
    bias[4 + 7] = 0.9               # class 7 wins everywhere
    g = OnnxGraph(
        nodes=[
            OnnxNode("ReduceMean", inputs=["x"], outputs=["m"],
                     attrs={"axes": [2, 3], "keepdims": 0}),
            OnnxNode("Gemm", inputs=["m", "w", "b"], outputs=["flat"]),
            OnnxNode("Reshape", inputs=["flat", "tgt"], outputs=["out"]),
        ],
        initializers={
            "w": np.zeros((3, ch * anchors), np.float32),
            "b": bias.reshape(-1),
            "tgt": np.array([-1, ch, anchors], np.int64),
        },
        inputs=["x"], outputs=["out"],
    )
    monkeypatch.setattr(ogm, "read_onnx_model", lambda p: g)
    gm = ogm.try_load_graph_model(
        str(tmp_path / "many.onnx"), "yolo",
        model_type="yolov8", input_hw=hw,
    )
    assert gm is not None
    out = jax.jit(lambda p, a: gm.apply(p, a, reduce_scores=True))(
        gm.init_params(), jnp.zeros((2, *hw, 3), jnp.float32)
    )
    boxes = np.asarray(out["boxes_xyxy"])
    np.testing.assert_allclose(
        boxes,
        np.broadcast_to(np.array([8.0, 8.0, 12.0, 12.0], np.float32),
                        boxes.shape),
        atol=1e-5,
    )
    assert np.all(np.asarray(out["cls"]) == 7)
    np.testing.assert_allclose(np.asarray(out["conf"]), 0.9, atol=1e-6)


# --------------------------------------------------------------- end2end NMS


from realtime_analytics_tpu.models.onnx_exec import (  # noqa: E402
    UnsupportedOnnxOp,
    run_graph as _run_graph_oracle,
)
from realtime_analytics_tpu.models.onnx_graph_model import (  # noqa: E402
    OnnxGraphYolo,
)
from realtime_analytics_tpu.models.onnx_lite import (  # noqa: E402
    OnnxGraph,
    OnnxNode,
    write_onnx_model,
)


def _embedded_nms_graph(rng, nc=3, max_out=5):
    """Tiny end-to-end detection graph: conv stem -> box/score heads ->
    graph-embedded NonMaxSuppression whose selected_indices is the graph
    output (torchvision-style export shape). 64x64 input, stride-8 head,
    64 anchors."""
    w0 = rng.standard_normal((16, 3, 8, 8)).astype(np.float32) * 0.2
    b0 = rng.standard_normal(16).astype(np.float32) * 0.1
    wb = rng.standard_normal((4, 16, 1, 1)).astype(np.float32) * 0.5
    bb = rng.standard_normal(4).astype(np.float32) * 0.2
    ws = rng.standard_normal((nc, 16, 1, 1)).astype(np.float32) * 0.5
    bs = rng.standard_normal(nc).astype(np.float32) * 0.2
    nodes = [
        OnnxNode("Conv", inputs=["x", "w0", "b0"], outputs=["f0"],
                 attrs={"strides": [8, 8], "pads": [0, 0, 0, 0]}),
        OnnxNode("Relu", inputs=["f0"], outputs=["f"]),
        OnnxNode("Conv", inputs=["f", "wb", "bb"], outputs=["bh"]),
        OnnxNode("Reshape", inputs=["bh", "tb"], outputs=["bh3"]),
        OnnxNode("Transpose", inputs=["bh3"], outputs=["bht"],
                 attrs={"perm": [0, 2, 1]}),
        OnnxNode("Sigmoid", inputs=["bht"], outputs=["bsig"]),
        OnnxNode("Mul", inputs=["bsig", "scale"], outputs=["boxes"]),
        OnnxNode("Conv", inputs=["f", "ws", "bs"], outputs=["sh"]),
        OnnxNode("Reshape", inputs=["sh", "ts"], outputs=["sh3"]),
        OnnxNode("Sigmoid", inputs=["sh3"], outputs=["scores"]),
        OnnxNode("NonMaxSuppression",
                 inputs=["boxes", "scores", "mo", "it", "st"],
                 outputs=["sel"]),
    ]
    inits = {
        "w0": w0, "b0": b0, "wb": wb, "bb": bb, "ws": ws, "bs": bs,
        "tb": np.array([1, 4, 64], np.int64),
        "ts": np.array([1, nc, 64], np.int64),
        "scale": np.array(60.0, np.float32),
        "mo": np.array([max_out], np.int64),
        "it": np.array([0.5], np.float32),
        "st": np.array([0.05], np.float32),
    }
    return OnnxGraph(nodes=nodes, initializers=inits,
                     inputs=["x"], outputs=["sel"])


def test_embedded_nms_end2end_serves(tmp_path):
    """An export with graph-embedded NMS (selected_indices terminal)
    serves end to end: the engine skips its internal NMS and the final
    detections match the numpy oracle's dense NMS rows + gather."""
    rng = np.random.default_rng(77)
    g = _embedded_nms_graph(rng)
    path = str(tmp_path / "e2e.onnx")
    write_onnx_model(path, g)

    eng = _engine_for(path)
    assert getattr(eng.model, "graph_backed", False)
    assert getattr(eng.model, "end2end", False), (
        "embedded-NMS export was not detected as end-to-end"
    )

    frames = rng.integers(0, 256, (3, *HW, 3), dtype=np.uint8)
    got = eng.predict_arrays(frames)

    # oracle: same nodes, but surface the NMS node's inputs too
    g2 = OnnxGraph(nodes=g.nodes, initializers=g.initializers,
                   inputs=g.inputs, outputs=["sel", "boxes", "scores"])
    conf_thr = eng.config.confidence_threshold
    for i, f in enumerate(frames):
        x = (f[..., ::-1].astype(np.float32) / 255.0).transpose(2, 0, 1)
        sel, bxs, scs = _run_graph_oracle(g2, {"x": x[None]})
        b = np.asarray(bxs)[0][sel[:, 2]]
        lo = np.minimum(b[:, :2], b[:, 2:])
        hi = np.maximum(b[:, :2], b[:, 2:])
        b = np.concatenate([lo, hi], axis=1)
        s = np.asarray(scs)[0][sel[:, 1], sel[:, 2]]
        c = sel[:, 1]
        keep = s >= conf_thr
        b, s, c = b[keep], s[keep], c[keep]
        order = np.argsort(-s, kind="stable")
        b, s, c = b[order], s[order], c[order]

        n = int(got.num_valid[i])
        assert n == len(s), (
            f"frame {i}: engine kept {n} detections vs oracle {len(s)}"
        )
        np.testing.assert_allclose(got.scores[i][:n], s, atol=1e-3)
        np.testing.assert_array_equal(got.class_ids[i][:n], c)
        np.testing.assert_allclose(got.boxes_xyxy[i][:n], b, atol=0.5)


def test_post_nms_glue_rejected_even_with_terminal_sibling():
    """A graph whose NMS output feeds downstream glue must be rejected
    even when ANOTHER NMS node in the same graph is terminal — the glue
    would silently consume the TPU twin's padded [-1,-1,-1] rows as dense
    rows (advisor medium #2)."""
    nodes = [
        OnnxNode("Reshape", inputs=["x", "tb"], outputs=["boxes"]),
        OnnxNode("Reshape", inputs=["x", "ts"], outputs=["scores_r"]),
        OnnxNode("Sigmoid", inputs=["scores_r"], outputs=["scores"]),
        OnnxNode("NonMaxSuppression",
                 inputs=["boxes", "scores", "mo", "it"],
                 outputs=["sel1"]),
        OnnxNode("Cast", inputs=["sel1"], outputs=["glue"],
                 attrs={"to": 1}),
        OnnxNode("NonMaxSuppression",
                 inputs=["boxes", "scores", "mo", "it"],
                 outputs=["sel2"]),
    ]
    inits = {
        "tb": np.array([1, 48, 4], np.int64),
        "ts": np.array([1, 4, 48], np.int64),
        "mo": np.array([3], np.int64),
        "it": np.array([0.5], np.float32),
    }
    g = OnnxGraph(nodes=nodes, initializers=inits,
                  inputs=["x"], outputs=["sel2", "glue"])
    with pytest.raises(UnsupportedOnnxOp, match="feeds further graph"):
        OnnxGraphYolo(g, model_type="yolov8", input_hw=(8, 8))


def test_multiple_terminal_nms_rejected():
    """Two terminal NMS heads are ambiguous — serving only terminal[0]
    silently would drop the second head (advisor medium #2)."""
    nodes = [
        OnnxNode("Reshape", inputs=["x", "tb"], outputs=["boxes"]),
        OnnxNode("Reshape", inputs=["x", "ts"], outputs=["scores_r"]),
        OnnxNode("Sigmoid", inputs=["scores_r"], outputs=["scores"]),
        OnnxNode("NonMaxSuppression",
                 inputs=["boxes", "scores", "mo", "it"],
                 outputs=["sel1"]),
        OnnxNode("NonMaxSuppression",
                 inputs=["boxes", "scores", "mo", "it"],
                 outputs=["sel2"]),
    ]
    inits = {
        "tb": np.array([1, 48, 4], np.int64),
        "ts": np.array([1, 4, 48], np.int64),
        "mo": np.array([3], np.int64),
        "it": np.array([0.5], np.float32),
    }
    g = OnnxGraph(nodes=nodes, initializers=inits,
                  inputs=["x"], outputs=["sel1", "sel2"])
    with pytest.raises(UnsupportedOnnxOp, match="terminal NonMaxSuppression"):
        OnnxGraphYolo(g, model_type="yolov8", input_hw=(8, 8))

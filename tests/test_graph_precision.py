"""Opt-in bf16 mixed precision for generic ONNX-graph serving
(``detector.graph_precision``).

Foreign graphs serve fp32 by default (the user's numerics contract,
pinned by test_onnx_graph_serving.test_graph_backed_serves_fp32_under_
default_precision). ``graph_precision: bf16`` is the TPU analog of the
reference building an FP16 TensorRT engine from a user's fp32 ONNX
export (reference detector.py:382-466): MXU ops take bf16 operands with
fp32 accumulation, numerically sensitive ops stay fp32 islands, and
tensors between islands ride bf16. These tests pin:

* the policy actually engages (intermediate/output dtypes are bf16);
* outputs stay within bf16 tolerance of the fp32 path for conv, matmul,
  softmax/LayerNorm-island, and LSTM-island graphs;
* engine plumbing end to end (YOLO / ResNet / temporal / `.rvae`);
* config validation and fp32-default behavior.
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

from realtime_analytics_tpu.config import ConfigError, DetectorConfig, StreamConfig  # noqa: E402
from realtime_analytics_tpu.engine.detector import (  # noqa: E402
    JaxResNetEngine,
    JaxYoloEngine,
)
from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine  # noqa: E402
from realtime_analytics_tpu.models.onnx_jax import (  # noqa: E402
    compile_graph,
    graph_compute_dtype,
)
from realtime_analytics_tpu.models.onnx_lite import read_onnx_model  # noqa: E402
from realtime_analytics_tpu.types import FramePacket  # noqa: E402

from test_onnx_graph_exec import _export  # noqa: E402
from test_onnx_graph_serving import (  # noqa: E402
    HW,
    NC,
    ForeignClassifier,
    ForeignDetector,
    ForeignTemporal,
    _engine_for,
)


def _run_policy(path, x, dtype):
    g = read_onnx_model(str(path))
    fn = compile_graph(g)

    def call(a):
        with graph_compute_dtype(dtype):
            return fn({g.inputs[0]: a})

    return jax.jit(call)(jnp.asarray(x))


# ---------------------------------------------------------------------------
# executor-level: policy engages and stays within bf16 tolerance


def test_bf16_policy_dtype_and_tolerance_conv(tmp_path):
    """Conv/ReLU/Linear stack: under the bf16 policy the graph OUTPUT is
    bf16 (proof the MXU sees bf16 operands — every op downcasts at put)
    and values track fp32 within bf16 rounding."""
    torch.manual_seed(200)
    m = ForeignClassifier().eval()
    path = tmp_path / "cls.onnx"
    _export(m, torch.rand(1, 3, 48, 48), str(path),
            dynamic_axes={"x": {0: "n"}})
    x = np.random.default_rng(0).random((2, 3, 48, 48), np.float32)

    (f32,) = _run_policy(path, x, jnp.float32)
    (b16,) = _run_policy(path, x, jnp.bfloat16)
    assert f32.dtype == jnp.float32
    assert b16.dtype == jnp.bfloat16
    scale = float(np.abs(np.asarray(f32)).max())
    np.testing.assert_allclose(
        np.asarray(b16, np.float32), np.asarray(f32),
        atol=0.02 * max(scale, 1.0), rtol=0.05,
    )


class SoftmaxNormNet(nn.Module):
    """LayerNorm + matmul + Softmax — the fp32-island ops. Probabilities
    must survive the policy (softmax computes in an fp32 island)."""

    def __init__(self):
        super().__init__()
        self.ln = nn.LayerNorm(32)
        self.fc = nn.Linear(32, 16)

    def forward(self, x):
        return torch.softmax(self.fc(self.ln(x)), dim=-1)


def test_bf16_policy_fp32_islands(tmp_path):
    torch.manual_seed(201)
    m = SoftmaxNormNet().eval()
    path = tmp_path / "sm.onnx"
    _export(m, torch.rand(1, 8, 32), str(path),
            dynamic_axes={"x": {0: "n"}})
    x = (np.random.default_rng(1).random((2, 8, 32), np.float32) - 0.5) * 6

    (f32,) = _run_policy(path, x, jnp.float32)
    (b16,) = _run_policy(path, x, jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    # probabilities: absolute tolerance is what matters
    np.testing.assert_allclose(
        np.asarray(b16, np.float32), np.asarray(f32), atol=0.015
    )
    np.testing.assert_allclose(
        np.asarray(b16, np.float32).sum(-1), 1.0, atol=0.02
    )


def test_fp32_policy_is_identity(tmp_path):
    """graph_compute_dtype(fp32) must be the EXACT legacy path (no cast
    nodes, bit-identical) — fp32 callers see zero change."""
    torch.manual_seed(202)
    m = ForeignClassifier().eval()
    path = tmp_path / "cls.onnx"
    _export(m, torch.rand(1, 3, 48, 48), str(path),
            dynamic_axes={"x": {0: "n"}})
    x = np.random.default_rng(2).random((2, 3, 48, 48), np.float32)

    g = read_onnx_model(str(path))
    fn = compile_graph(g)
    (plain,) = jax.jit(lambda a: fn({g.inputs[0]: a}))(jnp.asarray(x))
    (scoped,) = _run_policy(path, x, jnp.float32)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(scoped))


# ---------------------------------------------------------------------------
# engine plumbing


@pytest.fixture(scope="module")
def foreign_det_onnx(tmp_path_factory):
    d = tmp_path_factory.mktemp("bf16det")
    torch.manual_seed(100)
    m = ForeignDetector(bake_batch=False).eval()
    path = d / "det.onnx"
    _export(m, torch.rand(1, 3, *HW), str(path),
            dynamic_axes={"x": {0: "n"}})
    return str(path)


def test_yolo_engine_graph_bf16(foreign_det_onnx):
    eng16 = _engine_for(foreign_det_onnx, graph_precision="bf16")
    eng32 = _engine_for(foreign_det_onnx)
    assert eng16.compute_dtype == jnp.bfloat16
    assert eng16.model.compute_dtype == jnp.bfloat16
    # params ride HBM at half width
    leaf = jax.tree_util.tree_leaves(eng16.params)[0]
    assert leaf.dtype == jnp.bfloat16

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (3, *HW, 3), dtype=np.uint8)
    # compare the raw decode (pre-threshold) — detection COUNTS can
    # legitimately differ when a score sits within bf16 rounding of the
    # confidence threshold, so the tolerance contract is on the decode
    a = jax.jit(lambda p, x: eng16.model.apply(p, x, reduce_scores=True))(
        eng16.params, jnp.asarray(frames[..., ::-1] / 255.0, jnp.float32)
    )
    b = jax.jit(lambda p, x: eng32.model.apply(p, x, reduce_scores=True))(
        eng32.params, jnp.asarray(frames[..., ::-1] / 255.0, jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(a["conf"]), np.asarray(b["conf"]), atol=0.02
    )
    # boxes are in input pixels (sigmoid * 64)
    np.testing.assert_allclose(
        np.asarray(a["boxes_xyxy"]), np.asarray(b["boxes_xyxy"]), atol=1.0
    )
    # thresholded smoke through the full fused step: both engines detect,
    # and the top detection agrees on class
    d16 = eng16.predict_arrays(frames)
    d32 = eng32.predict_arrays(frames)
    for i in range(len(frames)):
        n16, n32 = int(d16.num_valid[i]), int(d32.num_valid[i])
        assert n16 > 0 and n32 > 0
        t16 = int(np.argmax(d16.scores[i][:n16]))
        t32 = int(np.argmax(d32.scores[i][:n32]))
        assert d16.class_ids[i][t16] == d32.class_ids[i][t32]


def test_resnet_engine_graph_bf16(tmp_path):
    torch.manual_seed(102)
    m = ForeignClassifier().eval()
    path = tmp_path / "cls.onnx"
    _export(m, torch.rand(1, 3, 48, 48), str(path),
            dynamic_axes={"x": {0: "n"}})
    cfg = dict(
        model_path=str(path), model_type="resnet", backend="onnx",
        input_size=[48, 48], num_classes=9, resnet_top_k=3,
        warmup=False, max_batch_size=2, resnet_scores="softmax",
        confidence_threshold=0.001,
    )
    eng16 = JaxResNetEngine(DetectorConfig(graph_precision="bf16", **cfg))
    assert eng16.compute_dtype == jnp.bfloat16

    rng = np.random.default_rng(8)
    frame = rng.integers(0, 256, (48, 48, 3), np.uint8)
    stream = StreamConfig(name="s", url="mem://")
    dets = eng16.predict(FramePacket(stream, frame, 0, time.time()))
    assert len(dets) == 3

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (frame[..., ::-1].astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        probs = torch.softmax(
            m(torch.from_numpy(x.transpose(2, 0, 1)[None])), dim=-1
        )[0].numpy()
    top = np.argsort(-probs)[:3]
    for d, cls_id in zip(dets, top):
        assert d.class_id == cls_id
        np.testing.assert_allclose(d.confidence, probs[cls_id], atol=0.02)


def test_temporal_engine_graph_bf16(tmp_path):
    """LSTM recurrence is an fp32 island — bf16 clips must give logits
    close to the fp32 path."""
    torch.manual_seed(101)
    t_len = 4
    m = ForeignTemporal().eval()
    path = tmp_path / "temporal.onnx"
    _export(m, torch.rand(1, t_len, 3, 32, 32), str(path),
            dynamic_axes={"x": {0: "n"}})
    cfg = dict(
        model_path=str(path), model_type="cnn_lstm", backend="onnx",
        input_size=[32, 32], sequence_length=t_len, sequence_stride=1,
        num_action_classes=5, warmup=False, max_batch_size=2,
        confidence_threshold=0.01,
    )
    eng16 = JaxTemporalEngine(DetectorConfig(graph_precision="bf16", **cfg))
    eng32 = JaxTemporalEngine(DetectorConfig(**cfg))
    assert eng16.compute_dtype == jnp.bfloat16
    assert eng32.compute_dtype == jnp.float32

    clips = np.random.default_rng(12).random(
        (2, t_len, 32, 32, 3), np.float32
    )
    la = np.asarray(jax.jit(eng16.model.apply)(
        eng16.params, jnp.asarray(clips)
    ))
    lb = np.asarray(jax.jit(eng32.model.apply)(
        eng32.params, jnp.asarray(clips)
    ))
    scale = float(np.abs(lb).max())
    np.testing.assert_allclose(la, lb, atol=0.03 * max(scale, 1.0))


def test_graph_precision_validation_and_native_noop(foreign_det_onnx):
    with pytest.raises(ConfigError, match="graph_precision"):
        DetectorConfig(graph_precision="fp16").validate()
    # native-checkpoint engines ignore graph_precision: compute dtype
    # follows `precision` exactly as before
    eng = JaxYoloEngine(DetectorConfig(
        model_path="missing-weights.pt", precision="fp32",
        graph_precision="bf16", warmup=False, input_size=[64, 64],
        num_classes=4, max_batch_size=2,
    ))
    assert not getattr(eng.model, "graph_backed", False)
    assert eng.compute_dtype == jnp.float32


def test_graph_bf16_rvae_roundtrip(foreign_det_onnx, tmp_path):
    """`.rvae` export under graph_precision: bf16 records the policy in
    meta and the reloaded engine serves bit-identically to the live bf16
    engine."""
    from realtime_analytics_tpu.engine.detector import create_detector
    from realtime_analytics_tpu.engine.export import export_serving_artifact

    live = _engine_for(
        foreign_det_onnx, graph_precision="bf16", max_batch_size=2,
        batch_buckets=[2],
    )
    art = str(tmp_path / "det16.rvae")
    meta = export_serving_artifact(live, art, src_hws=[HW])
    assert meta["graph_backed"] is True
    assert meta["graph_precision"] == "bf16"

    served = create_detector(DetectorConfig(
        model_path=art, model_type="yolov8", input_size=list(HW),
        num_classes=NC, warmup=False, confidence_threshold=0.3,
        max_batch_size=2,
    ))
    assert served.compute_dtype == jnp.bfloat16

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, (2, *HW, 3), dtype=np.uint8)
    a = live.predict_arrays(frames)
    b = served.predict_arrays(frames)
    np.testing.assert_array_equal(a.num_valid, b.num_valid)
    np.testing.assert_array_equal(a.scores, b.scores)
    np.testing.assert_array_equal(a.boxes_xyxy, b.boxes_xyxy)

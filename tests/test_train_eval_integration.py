"""End-to-end train -> serve -> evaluate integration.

Ties three subsystems together: the in-framework training CLI
(scripts/train.py) on labeled synthetic video, the serving engine loading
the resulting .npz pytree, and the COCO-style evaluator
(eval/detection_metrics.py). The reference has no counterpart for any of
the three (inference-only, no tests, no evaluator) — this guards the
whole loop the TPU build added.
"""

import numpy as np
import pytest

from realtime_analytics_tpu.config import DetectorConfig, StreamConfig
from realtime_analytics_tpu.engine.detector import JaxYoloEngine
from realtime_analytics_tpu.eval.detection_metrics import (
    DetectionSample,
    evaluate_detections,
)
from realtime_analytics_tpu.ingest.synthetic import SyntheticSource
from realtime_analytics_tpu.types import FramePacket


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """One 400-step synthetic training run shared by the tests below."""
    from realtime_analytics_tpu.scripts.train import main

    out = tmp_path_factory.mktemp("train") / "trained.npz"
    rc = main([
        "--steps", "400", "--batch", "4", "--nc", "4",
        "--boxes-per-image", "2", "--input-size", "64", "64",
        "--log-every", "100", "--out", str(out), "--seed", "1",
    ])
    assert rc == 0
    return str(out)


def _engine(path: str) -> JaxYoloEngine:
    return JaxYoloEngine(DetectorConfig(
        model_path=path, model_type="yolov8", num_classes=4,
        input_size=[64, 64], warmup=False, precision="fp32",
        max_batch_size=1, batch_buckets=[1], pre_nms_topk=64,
        max_detections=8, confidence_threshold=0.05,
    ))


def _eval_map(eng: JaxYoloEngine, seed: int = 7, frames: int = 12) -> dict:
    src = SyntheticSource(width=64, height=64, boxes=2, seed=seed)
    samples = []
    for _ in range(frames):
        ok, frame, gt, cls = src.read_labeled()
        assert ok
        br = eng.predict_arrays(frame[None])
        nv = int(br.num_valid[0])
        samples.append(DetectionSample(
            det_boxes=br.boxes_xyxy[0, :nv],
            det_scores=br.scores[0, :nv],
            det_classes=br.class_ids[0, :nv],
            gt_boxes=np.asarray(gt),
            gt_classes=np.asarray(cls),
        ))
    return evaluate_detections(samples)


def test_training_lifts_map_over_random_init(trained_ckpt):
    trained = _eval_map(_engine(trained_ckpt))
    random_init = _eval_map(_engine("__random__.pt"))
    # 400 synthetic steps reach mAP50 ~0.1+; random init detects nothing
    assert trained["map50"] >= 0.05, trained
    assert random_init["map50"] <= 0.01, random_init
    assert trained["map50"] > random_init["map50"] + 0.04


def _serving_engine(path: str, tiling: bool) -> JaxYoloEngine:
    return JaxYoloEngine(DetectorConfig(
        model_path=path, model_type="yolov8", num_classes=4,
        input_size=[64, 64], warmup=False, precision="fp32",
        max_batch_size=32, batch_buckets=[32], pre_nms_topk=64,
        max_detections=16, confidence_threshold=0.05,
        tiling=tiling, tiling_overlap=0.2, tiling_full_frame=False,
        host_resize="off",
    ))


def _eval_small_objects(eng: JaxYoloEngine, frames: int = 12) -> dict:
    """256² scenes whose boxes are 5–13 px NATIVE — the size the model was
    trained on (sources render at 2× input and downscale, so training boxes
    land at 5–13 px in the 64² input). The whole-frame path letterboxes
    256→64 (4×), shrinking them to 1–3 px."""
    src = SyntheticSource(width=256, height=256, boxes=2, seed=7,
                          min_size=0.02, max_size=0.05)
    stream = StreamConfig(name="e", url="synthetic://", target_fps=25)
    samples = []
    for _ in range(frames):
        ok, frame, gt, cls = src.read_labeled()
        assert ok
        dets = eng.predict_packets([FramePacket(stream, frame, 0, 0.0)])[0]
        db = np.array([d.bbox_xyxy for d in dets], np.float32).reshape(-1, 4)
        samples.append(DetectionSample(
            det_boxes=db,
            det_scores=np.array([d.confidence for d in dets], np.float32),
            det_classes=np.array([d.class_id for d in dets], np.int32),
            gt_boxes=np.asarray(gt),
            gt_classes=np.asarray(cls),
        ))
    return evaluate_detections(samples)


def test_tiling_lifts_small_object_map(trained_ckpt):
    """Quantitative proof of detector.tiling: on scenes whose objects sit
    at the model's trained pixel scale NATIVELY, the whole-frame letterbox
    (4× downscale) destroys them while the tiled path detects at native
    resolution. Measured at calibration: whole mAP50 = 0.0, tiled ≈ 0.13
    (same-seed deterministic run)."""
    whole = _eval_small_objects(_serving_engine(trained_ckpt, tiling=False))
    tiled = _eval_small_objects(_serving_engine(trained_ckpt, tiling=True))
    assert whole["map50"] <= 0.02, whole
    assert tiled["map50"] >= 0.05, tiled
    assert tiled["map50"] > whole["map50"] + 0.04


def test_export_quantize_serve_eval_full_toolchain(trained_ckpt, tmp_path):
    """The complete toolchain on ONE model: the trained checkpoint is
    exported to standard ONNX (models/onnx_export.py), quantized
    weights-only (models/quantize.py), served back through the generic
    ONNX->JAX graph path, and evaluated — its mAP must match the native
    engine serving the same weights. Gates training output format,
    exporter decode math, quantizer round-trip, graph serving, and the
    evaluator in one pass."""
    import jax

    from realtime_analytics_tpu.models.onnx_export import yolo_to_onnx
    from realtime_analytics_tpu.models.onnx_lite import (
        read_onnx_model,
        write_onnx_model,
    )
    from realtime_analytics_tpu.models.quantize import quantize_graph

    native = _engine(trained_ckpt)
    onnx_path = str(tmp_path / "trained.onnx")
    yolo_to_onnx(native.model, jax.device_get(native.params), onnx_path,
                 (64, 64))
    qg, _rep = quantize_graph(
        read_onnx_model(onnx_path), [], fmt="qdq", weights_only=True
    )
    qpath = str(tmp_path / "trained-qdqw.onnx")
    write_onnx_model(
        qpath, qg,
        value_infos={qg.inputs[0]: (np.float32, ("n", 3, 64, 64))},
    )

    native_map = _eval_map(native)
    graph = JaxYoloEngine(DetectorConfig(
        model_path=qpath, model_type="yolov8", backend="onnx",
        num_classes=4, input_size=[64, 64], warmup=False,
        max_batch_size=1, batch_buckets=[1], pre_nms_topk=64,
        max_detections=8, confidence_threshold=0.05,
    ))
    assert getattr(graph.model, "graph_backed", False)
    graph_map = _eval_map(graph)
    assert native_map["map50"] >= 0.05, native_map
    # weights-only int8 costs at most a little localization quality
    assert graph_map["map50"] >= native_map["map50"] - 0.05, (
        native_map, graph_map,
    )

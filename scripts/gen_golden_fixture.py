#!/usr/bin/env python
"""Generate the committed golden-output fixture (round-3 VERDICT item 2).

Produces, deterministically and without network or torch:

  tests/data/golden_scene.png              — a committed NATURAL-statistics
      image (street-like scene: gradients, textured ground, buildings,
      vehicles, trees, blur + film grain — not uniform noise), 1080p so the
      production host-select 3x pick path is exercised.
  tests/data/golden_yolov8n_synthetic.json — pinned boxes/scores/classes of
      the full serving chain (manifest-layout weights -> weights-ONNX write
      -> onnx_lite read -> checkpoint loader -> letterbox -> forward ->
      DFL decode -> NMS -> un-letterbox) on that image, fp32 CPU.

The synthetic weights are seeded from the PUBLISHED Ultralytics yolov8n
key->shape manifest (scripts/gen_yolo_manifest.py), so layout drift fails
the loader and math drift fails the comparison. tests/test_golden_fixture.py
re-derives everything at test time and compares against the committed JSON.

Run from the repo root:  python scripts/gen_golden_fixture.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

# hard override: the TPU image PRESETS JAX_PLATFORMS=axon, and the golden
# must be computed on the same backend the test suite uses (forced CPU).
# Env vars alone are too late (the axon plugin registers at interpreter
# startup, and jax.devices() would then handshake the tunnel — minutes
# when another process holds the chip); the config knob actually gates it.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_DIR = os.path.join(REPO, "tests", "data")
SCENE_PNG = os.path.join(DATA_DIR, "golden_scene.png")
GOLDEN_JSON = os.path.join(DATA_DIR, "golden_yolov8n_synthetic.json")
GOLDEN_V5_JSON = os.path.join(DATA_DIR, "golden_yolov5n_synthetic.json")
GOLDEN_RESNET_JSON = os.path.join(DATA_DIR, "golden_resnet18_synthetic.json")
GOLDEN_TEMPORAL_JSON = os.path.join(DATA_DIR, "golden_cnnlstm_synthetic.json")
TOP_N = 25  # pinned detections per image

# published Ultralytics YOLOv5 P3/P4/P5 anchors (model constants)
V5_ANCHORS = np.array(
    [[[10, 13], [16, 30], [33, 23]],
     [[30, 61], [62, 45], [59, 119]],
     [[116, 90], [156, 198], [373, 326]]], np.float32,
)


def render_scene(h: int = 1080, w: int = 1920) -> np.ndarray:
    """Deterministic street-like scene, BGR uint8. Built from pure numpy
    (no cv2 drawing, so the pixels cannot vary across cv2 builds); a box
    blur + seeded film grain give it natural image statistics."""
    rng = np.random.default_rng(42)
    img = np.zeros((h, w, 3), np.float32)

    # sky: vertical gradient (warm haze to blue)
    horizon = int(h * 0.45)
    t = (np.arange(horizon, dtype=np.float32) / horizon)[:, None, None]
    sky_top = np.array([200, 150, 90], np.float32)  # BGR
    sky_bot = np.array([210, 200, 180], np.float32)
    img[:horizon] = sky_top * (1 - t) + sky_bot * t

    # sun disc
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    sun = np.exp(-(((yy - h * 0.12) ** 2 + (xx - w * 0.78) ** 2)
                   / (2 * (h * 0.04) ** 2)))
    img += sun[..., None] * np.array([80, 150, 200], np.float32)

    # ground: textured asphalt
    ground = np.float32([70, 72, 75]) + rng.normal(
        0, 6, (h - horizon, w, 1)
    ).astype(np.float32)
    img[horizon:] = ground

    # road markings: dashed center line
    for x0 in range(0, w, 160):
        img[int(h * 0.8):int(h * 0.82), x0:x0 + 80] = [180, 200, 210]

    def rect(y0, y1, x0, x1, color, jitter=0.0):
        y0, x0 = max(0, y0), max(0, x0)
        y1, x1 = min(h, y1), min(w, x1)
        if y1 <= y0 or x1 <= x0:
            return
        c = np.asarray(color, np.float32)
        block = np.broadcast_to(c, (y1 - y0, x1 - x0, 3)).copy()
        if jitter:
            block += rng.normal(0, jitter, block.shape).astype(np.float32)
        img[y0:y1, x0:x1] = block

    # buildings with windows
    for bi, (bx, bw_, bh_) in enumerate(
        [(60, 300, 500), (420, 260, 420), (1500, 340, 560)]
    ):
        top = horizon - bh_
        rect(top, horizon, bx, bx + bw_, [90 + 10 * bi, 85, 80], jitter=4)
        for wy in range(top + 30, horizon - 30, 70):
            for wx in range(bx + 20, bx + bw_ - 30, 60):
                lit = rng.random() > 0.5
                rect(wy, wy + 36, wx, wx + 30,
                     [60, 160, 220] if lit else [40, 35, 30])

    # vehicles: body + cabin + wheels-ish dark band
    for (vx, vy, vw_, vh_, col) in [
        (300, int(h * 0.62), 420, 180, [40, 40, 170]),   # red car
        (1050, int(h * 0.68), 520, 210, [150, 80, 30]),  # blue van
    ]:
        rect(vy, vy + vh_, vx, vx + vw_, col, jitter=3)
        rect(vy - vh_ // 3, vy, vx + vw_ // 5, vx + 4 * vw_ // 5,
             [int(c * 0.7) for c in col], jitter=3)
        rect(vy + vh_ - 18, vy + vh_, vx, vx + vw_, [25, 25, 25])

    # trees: trunk + blobby canopy
    for tx in (820, 1860 - 80):
        rect(horizon - 40, horizon + 60, tx - 12, tx + 12, [30, 60, 90])
        canopy = np.exp(-(((yy - (horizon - 120)) ** 2 + (xx - tx) ** 2)
                          / (2 * 80.0 ** 2)))
        img += canopy[..., None] * np.array([20, 90, 20], np.float32)

    # box blur (separable, pure numpy) for natural edge softness
    def box_blur_axis(a: np.ndarray, axis: int, k: int) -> np.ndarray:
        win = 2 * k + 1
        pad_width = [(0, 0)] * a.ndim
        pad_width[axis] = (k, k)
        p = np.pad(a, pad_width, mode="edge")
        c = np.cumsum(p, axis=axis, dtype=np.float64)
        zshape = list(c.shape)
        zshape[axis] = 1
        c = np.concatenate([np.zeros(zshape, c.dtype), c], axis=axis)
        lo = [slice(None)] * a.ndim
        hi = [slice(None)] * a.ndim
        lo[axis] = slice(win, None)
        hi[axis] = slice(0, c.shape[axis] - win)
        return ((c[tuple(lo)] - c[tuple(hi)]) / win).astype(np.float32)

    img = box_blur_axis(box_blur_axis(img, 0, 3), 1, 3)

    # film grain
    img += rng.normal(0, 2.0, img.shape).astype(np.float32)
    assert img.shape == (h, w, 3), img.shape  # exact 1080p: select-path gate
    return np.clip(img, 0, 255).astype(np.uint8)


def synthetic_weights() -> dict:
    """Seeded state dict in the published Ultralytics yolov8n layout.

    Unlike bench.py's throughput checkpoint (everything ~N(0, 0.05), under
    which deep activations die and the head output collapses to its bias —
    input-INDEPENDENT detections), this uses He-scaled conv weights and
    ~identity BN statistics so activations survive all 22 layers and the
    pinned outputs genuinely depend on the committed image (the test
    asserts that)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_yolo_manifest", os.path.join(REPO, "scripts", "gen_yolo_manifest.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    manifest = gen.yolov8_manifest("n")
    rng = np.random.default_rng(0)
    sd = {}
    for key, shape in manifest.items():
        if key.endswith("num_batches_tracked"):
            continue  # ONNX initializers never carry these
        if key == "model.22.dfl.conv.weight":
            # the published DFL projection is exactly arange(16)
            sd[key] = np.arange(16, dtype=np.float32).reshape(shape)
        elif key.endswith("running_var"):
            sd[key] = rng.uniform(0.8, 1.2, shape).astype(np.float32)
        elif key.endswith("running_mean"):
            sd[key] = rng.normal(0, 0.1, shape).astype(np.float32)
        elif key.endswith("bn.weight") or (".bn." in key and key.endswith("weight")):
            sd[key] = rng.uniform(0.9, 1.1, shape).astype(np.float32)
        elif key.endswith("bias"):
            sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
        elif len(shape) == 4:  # conv kernels [co, ci, kh, kw]: He init
            fan_in = int(np.prod(shape[1:]))
            sd[key] = rng.normal(
                0, np.sqrt(2.0 / fan_in), shape
            ).astype(np.float32)
        else:
            sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


def _he_state_dict(manifest: dict, seed: int = 0) -> dict:
    """He-scaled weights over any torch-named key->shape manifest (shared
    recipe — see synthetic_weights docstring for why not N(0, 0.05))."""
    rng = np.random.default_rng(seed)
    sd = {}
    for key, shape in manifest.items():
        if key.endswith("num_batches_tracked"):
            continue
        if key.endswith(".anchors"):
            sd[key] = V5_ANCHORS.reshape(shape).astype(np.float32)
        elif key == "model.22.dfl.conv.weight":
            sd[key] = np.arange(16, dtype=np.float32).reshape(shape)
        elif key.endswith("running_var"):
            sd[key] = rng.uniform(0.8, 1.2, shape).astype(np.float32)
        elif key.endswith("running_mean"):
            sd[key] = rng.normal(0, 0.1, shape).astype(np.float32)
        elif key.endswith("bn.weight"):
            sd[key] = rng.uniform(0.9, 1.1, shape).astype(np.float32)
        elif key.endswith("bias"):
            sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
        elif len(shape) == 4:  # conv kernels [co, ci, kh, kw]: He init
            fan_in = int(np.prod(shape[1:]))
            sd[key] = rng.normal(
                0, np.sqrt(2.0 / fan_in), shape
            ).astype(np.float32)
        else:
            sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


def synthetic_weights_v5() -> dict:
    """He-scaled state dict in the published Ultralytics yolov5n layout,
    anchors pinned to the published P3/P4/P5 values (the loader ingests
    anchors from the checkpoint — exercised by this fixture)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_yolo_manifest", os.path.join(REPO, "scripts", "gen_yolo_manifest.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    return _he_state_dict(gen.yolov5_manifest("n"))


def build_engine(weights_onnx: str):
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    cfg = DetectorConfig(
        model_path=weights_onnx,
        model_type="yolov8",
        device="cpu",
        confidence_threshold=0.25,
        iou_threshold=0.45,
        input_size=[640, 640],
        max_batch_size=1,
        batch_buckets=[1],
        max_detections=300,
        pre_nms_topk=512,
        precision="fp32",  # deterministic across platforms
        warmup=False,
    )
    return JaxYoloEngine(cfg)


def build_engine_v5(weights_onnx: str):
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    cfg = DetectorConfig(
        model_path=weights_onnx,
        model_type="yolov5",
        device="cpu",
        confidence_threshold=0.25,
        iou_threshold=0.45,
        input_size=[640, 640],
        max_batch_size=1,
        batch_buckets=[1],
        max_detections=300,
        pre_nms_topk=512,
        precision="fp32",
        warmup=False,
    )
    return JaxYoloEngine(cfg)


def build_resnet_engine(ckpt_npz: str):
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxResNetEngine

    cfg = DetectorConfig(
        model_path=ckpt_npz,
        model_type="resnet",
        device="cpu",
        confidence_threshold=1e-6,
        resnet_num_classes=1000,
        resnet_top_k=5,
        resnet_scores="softmax",
        input_size=[224, 224],
        max_batch_size=1,
        batch_buckets=[1],
        precision="fp32",
        warmup=False,
        host_resize="off",  # tests run on CPU; pin the device-resize path
    )
    return JaxResNetEngine(cfg)


def build_temporal_engine(ckpt_npz: str):
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine

    cfg = DetectorConfig(
        model_path=ckpt_npz,
        model_type="cnn_lstm",
        device="cpu",
        confidence_threshold=1e-6,
        sequence_length=4,
        sequence_stride=1,
        num_action_classes=12,
        input_size=[112, 112],
        max_batch_size=1,
        batch_buckets=[1],
        precision="fp32",
        warmup=False,
        host_resize="off",
    )
    return JaxTemporalEngine(cfg)


def resnet_payload(engine, frame: np.ndarray) -> dict:
    from realtime_analytics_tpu.config import StreamConfig
    from realtime_analytics_tpu.types import FramePacket

    stream = StreamConfig(name="golden", url="synthetic://", target_fps=25)
    dets = engine.predict_packets([FramePacket(stream, frame, 0, 0.0)])[0]
    return {
        "classes": [d.class_id for d in dets],
        "scores": [round(d.confidence, 5) for d in dets],
    }


def temporal_payload(engine, frame: np.ndarray) -> dict:
    """Clip = four shifted crops of the scene (deterministic motion)."""
    from realtime_analytics_tpu.config import StreamConfig
    from realtime_analytics_tpu.types import FramePacket

    stream = StreamConfig(name="golden", url="synthetic://", target_fps=25)
    seq = [
        FramePacket(
            stream,
            np.ascontiguousarray(frame[t * 8: t * 8 + 512, t * 8: t * 8 + 512]),
            t, float(t),
        )
        for t in range(4)
    ]
    dets = engine.predict_clips([seq])[0]
    return {
        "classes": [d.class_id for d in dets],
        "scores": [round(d.confidence, 5) for d in dets],
        "labels": [d.action_label for d in dets],
        "span": [dets[0].sequence_start_frame, dets[0].sequence_end_frame]
        if dets else None,
    }


def detections_payload(engine, frame: np.ndarray) -> dict:
    br = engine.predict_arrays(frame[None])
    n = int(br.num_valid[0])
    order = np.argsort(-br.scores[0][:n], kind="stable")[:TOP_N]
    return {
        "num_valid": n,
        "top_n": len(order),
        "boxes_xyxy": [[round(float(v), 2) for v in br.boxes_xyxy[0][i]]
                       for i in order],
        "scores": [round(float(br.scores[0][i]), 5) for i in order],
        "classes": [int(br.class_ids[0][i]) for i in order],
    }


def main() -> int:
    import cv2

    from realtime_analytics_tpu.models.onnx_lite import write_onnx_initializers

    os.makedirs(DATA_DIR, exist_ok=True)
    scene = render_scene()
    cv2.imwrite(SCENE_PNG, scene)  # PNG: lossless round-trip
    print(f"wrote {SCENE_PNG} ({os.path.getsize(SCENE_PNG)//1024} KiB)")

    weights_onnx = "/tmp/golden_yolov8n_weights.onnx"
    write_onnx_initializers(weights_onnx, synthetic_weights())
    engine = build_engine(weights_onnx)
    scene = cv2.imread(SCENE_PNG, cv2.IMREAD_COLOR)
    payload = detections_payload(engine, scene)
    # the pinned outputs must be IMAGE-DEPENDENT (a bias-collapsed net
    # produces the same detections for any input — useless as a gate)
    other = detections_payload(engine, scene[::-1].copy())
    assert payload["scores"] != other["scores"], (
        "detections are input-independent — synthetic weights collapsed"
    )
    payload["weights"] = "manifest-synthetic seed=0 (scripts/gen_golden_fixture.py)"
    payload["engine"] = "fp32 cpu, conf=0.25 iou=0.45 input=640"
    with open(GOLDEN_JSON, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {GOLDEN_JSON}: num_valid={payload['num_valid']}, "
          f"top score={payload['scores'][0] if payload['scores'] else None}")

    # --- YOLOv5 (anchor-decode path; anchors ingested from checkpoint) ---
    v5_onnx = "/tmp/golden_yolov5n_weights.onnx"
    write_onnx_initializers(v5_onnx, synthetic_weights_v5())
    eng5 = build_engine_v5(v5_onnx)
    p5 = detections_payload(eng5, scene)
    assert p5["scores"] != detections_payload(eng5, scene[::-1].copy())["scores"]
    p5["weights"] = "yolov5n manifest-synthetic seed=0, published anchors"
    with open(GOLDEN_V5_JSON, "w") as f:
        json.dump(p5, f, indent=1)
    print(f"wrote {GOLDEN_V5_JSON}: num_valid={p5['num_valid']}")

    # --- ResNet classification (native pytree checkpoint path) ---
    # seed 7 ON PURPOSE: the engine's load-failure fallback is random init
    # from PRNGKey(0) — a silently-failed load would produce different
    # params and the pinned outputs would catch it
    import jax

    # NB: the engine infers the ResNet variant from the checkpoint FILENAME
    # (detector.py: "18"/"34"/"50" substring) — skeleton and checkpoint
    # paths must agree or the shape gate rejects the load.
    skel = build_resnet_engine("/tmp/resnet18-definitely-missing.npz")
    rparams = jax.tree_util.tree_map(
        np.asarray, skel.model.init_params(jax.random.PRNGKey(7))
    )
    np.savez("/tmp/golden_resnet18.npz",
             __pytree__=np.array(rparams, dtype=object))
    reng = build_resnet_engine("/tmp/golden_resnet18.npz")
    rp = resnet_payload(reng, scene)
    # silently-failed load would fall back to PRNGKey(0) init == skel's
    assert rp["scores"] != resnet_payload(skel, scene)["scores"]
    assert rp["scores"] != resnet_payload(reng, scene[::-1].copy())["scores"]
    with open(GOLDEN_RESNET_JSON, "w") as f:
        json.dump(rp, f, indent=1)
    print(f"wrote {GOLDEN_RESNET_JSON}: top1={rp['classes'][0]}")

    # --- temporal CNN-LSTM (clip pipeline + pytree checkpoint path) ---
    tskel = build_temporal_engine("/tmp/cnnlstm-definitely-missing.npz")
    tparams = jax.tree_util.tree_map(
        np.asarray, tskel.model.init_params(jax.random.PRNGKey(9))
    )
    np.savez("/tmp/golden_cnnlstm.npz",
             __pytree__=np.array(tparams, dtype=object))
    teng = build_temporal_engine("/tmp/golden_cnnlstm.npz")
    tp = temporal_payload(teng, scene)
    assert tp["scores"] != temporal_payload(tskel, scene)["scores"]
    assert tp["scores"] != temporal_payload(teng, scene[::-1].copy())["scores"]
    with open(GOLDEN_TEMPORAL_JSON, "w") as f:
        json.dump(tp, f, indent=1)
    print(f"wrote {GOLDEN_TEMPORAL_JSON}: top1={tp['classes'][0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

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
TOP_N = 25  # pinned detections per image


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
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Generate the committed multi-frame golden TRAJECTORY fixture (round-4
VERDICT item 6).

Single-frame goldens (scripts/gen_golden_fixture.py) pin the serving chain
on one image; they cannot catch cross-component ORDERING or LIFECYCLE
regressions — a batcher that reorders one stream's frames, a tracker whose
id assignment / age / hits drift, a frame-id mix-up between streams. This
fixture runs every frame of the committed ``data/samples/demo.mp4`` through
the REAL ``InferenceBatcher`` -> ``JaxYoloEngine`` -> ``IouTracker`` chain
as two phase-shifted streams sharing one batcher (the production topology,
pipeline.py:252-520) and pins, per stream per frame, the full track state:
track ids, class ids, boxes, confidences, age and hits.

Determinism: synthetic manifest-layout yolov8n weights (seed 0 — layout
drift fails the loader), fp32 on forced CPU, fixed submit order
(cam-a then cam-b each tick), per-stream frame order guaranteed by the
batcher's ordering contract. Track ids come from the tracker's shared
counter, so association drift anywhere in the chain shows up as an id
mismatch.

Reference anchor: the reference tracker's lifecycle contract
(reference tracker.py:50-126 — birth on unmatched detection, age reset on
match, removal after max_age misses) and its per-stream sequential update
(pipeline.py:374-377).

Run from the repo root:  python scripts/gen_golden_trajectory.py
"""

from __future__ import annotations

import asyncio
import json
import os
import sys

import numpy as np

# forced CPU before jax import — see gen_golden_fixture.py for why the env
# var alone is too late on this image (axon plugin registers at startup)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEMO = os.path.join(REPO, "data", "samples", "demo.mp4")
GOLDEN = os.path.join(REPO, "tests", "data", "golden_trajectory.json")
STREAM_B_OFFSET = 7  # cam-b plays the same file phase-shifted by 7 frames


def load_frames():
    """All frames of the committed demo fixture, BGR uint8."""
    import cv2

    cap = cv2.VideoCapture(DEMO)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    if len(frames) < 25:
        raise RuntimeError(f"demo.mp4 decoded only {len(frames)} frames")
    return frames


def build_trajectory_engine(weights_onnx: str):
    """Small-input (320) variant of the golden engine: same synthetic
    yolov8n weights/loader chain, quarter the CPU cost per frame."""
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    cfg = DetectorConfig(
        model_path=weights_onnx,
        model_type="yolov8",
        device="cpu",
        confidence_threshold=0.25,
        iou_threshold=0.45,
        input_size=[320, 320],
        max_batch_size=2,
        batch_buckets=[2],
        max_detections=100,
        pre_nms_topk=256,
        precision="fp32",
        warmup=False,
    )
    return JaxYoloEngine(cfg)


def run_trajectory(engine, frames) -> dict:
    """Drive the real batcher+engine+tracker chain over two phase-shifted
    streams; return the pinned per-step track state."""
    from realtime_analytics_tpu.config import StreamConfig, TrackerConfig
    from realtime_analytics_tpu.engine.batcher import InferenceBatcher
    from realtime_analytics_tpu.tracker import IouTracker
    from realtime_analytics_tpu.types import FramePacket

    n = len(frames)
    streams = {
        "cam-a": StreamConfig(name="cam-a", url="file://demo-a"),
        "cam-b": StreamConfig(name="cam-b", url="file://demo-b"),
    }
    tracker = IouTracker(TrackerConfig())
    records = {name: [] for name in streams}

    async def drive():
        batcher = InferenceBatcher(
            engine, max_batch=2, batch_window_ms=30.0
        )
        await batcher.start()
        try:
            for i in range(n):
                futs = {}
                for name, off in (("cam-a", 0), ("cam-b", STREAM_B_OFFSET)):
                    pkt = FramePacket(
                        stream=streams[name],
                        frame=frames[(i + off) % n],
                        frame_id=i,
                        timestamp=i / 25.0,
                    )
                    futs[name] = batcher.submit_nowait(pkt)
                for name in ("cam-a", "cam-b"):  # fixed order: shared
                    dets = await futs[name]      # track-id counter
                    tracks = tracker.update(name, dets or [])
                    records[name].append(sorted(
                        (
                            {
                                "id": int(t.track_id),
                                "cls": int(t.class_id),
                                "conf": round(float(t.confidence), 4),
                                "box": [round(float(v), 2)
                                        for v in t.bbox_xyxy],
                                "age": int(t.age),
                                "hits": int(t.hits),
                            }
                            for t in tracks
                        ),
                        key=lambda r: r["id"],
                    ))
        finally:
            await batcher.stop()

    asyncio.run(drive())
    ids = {name: {r["id"] for step in rec for r in step}
           for name, rec in records.items()}
    return {
        "n_steps": n,
        "stream_b_offset": STREAM_B_OFFSET,
        "weights": "manifest-synthetic seed=0 (scripts/gen_golden_fixture.py)",
        "engine": "yolov8 input=320 conf=0.25 iou=0.45 fp32 cpu bucket=2",
        "total_track_ids": {k: len(v) for k, v in ids.items()},
        "steps": records,
    }


def main() -> int:
    import importlib.util

    from realtime_analytics_tpu.models.onnx_lite import (
        write_onnx_initializers,
    )

    spec = importlib.util.spec_from_file_location(
        "gen_golden_fixture",
        os.path.join(REPO, "scripts", "gen_golden_fixture.py"),
    )
    fixture = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fixture)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        weights_onnx = os.path.join(td, "w.onnx")
        write_onnx_initializers(weights_onnx, fixture.synthetic_weights())
        engine = build_trajectory_engine(weights_onnx)
        payload = run_trajectory(engine, load_frames())

    with open(GOLDEN, "w") as f:
        json.dump(payload, f, separators=(",", ":"))
    sizes = payload["total_track_ids"]
    steps = payload["steps"]
    print(f"wrote {GOLDEN}: {payload['n_steps']} steps, "
          f"track ids {sizes}, "
          f"mean tracks/step cam-a "
          f"{np.mean([len(s) for s in steps['cam-a']]):.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Headline benchmark: 32-stream aggregate detection throughput on one chip.

Measures the full fused per-batch pipeline step exactly as production runs
it: 32 x 1080p uint8 BGR frames -> H2D -> device letterbox/normalize ->
YOLOv8n forward (bf16) -> decode -> batched NMS -> un-letterbox -> D2H of
padded results. Reports aggregate detected FPS (north star: >=800 aggregate
= 32 streams x 25 FPS, p50 batch latency < 40 ms; see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_AGG_FPS = 800.0  # north-star: 32 streams x 25 FPS on one chip
N_STREAMS = 32
SRC_HW = (1080, 1920)
WARMUP_ITERS = 5
BENCH_ITERS = 30


def main() -> None:
    import jax

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    cfg = DetectorConfig(
        model_path="yolov8n.pt",  # random init if absent: same FLOPs/shape
        model_type="yolov8",
        confidence_threshold=0.25,
        iou_threshold=0.45,
        input_size=[640, 640],
        max_batch_size=N_STREAMS,
        batch_buckets=[N_STREAMS],
        max_detections=300,
        pre_nms_topk=1024,
        precision="bf16",
        warmup=False,
    )
    engine = JaxYoloEngine(cfg)
    platform = jax.local_devices()[0].platform

    rng = np.random.default_rng(0)
    # realistic content: random blocks, not uniform noise (NMS load is shaped
    # by score distribution; random-init weights make this approximate anyway)
    frames = rng.integers(0, 256, (N_STREAMS, *SRC_HW, 3), dtype=np.uint8)

    step = engine._get_step(N_STREAMS, SRC_HW)
    x = None
    for _ in range(WARMUP_ITERS):
        x = step(engine.params, frames)
    jax.block_until_ready(x)

    latencies = []
    t_total0 = time.perf_counter()
    for _ in range(BENCH_ITERS):
        t0 = time.perf_counter()
        out = step(engine.params, frames)
        jax.block_until_ready(out)
        latencies.append((time.perf_counter() - t0) * 1e3)
    total_s = time.perf_counter() - t_total0

    agg_fps = N_STREAMS * BENCH_ITERS / total_s
    p50_ms = float(np.percentile(latencies, 50))
    p99_ms = float(np.percentile(latencies, 99))

    print(
        json.dumps(
            {
                "metric": "aggregate_detected_fps_32x1080p_yolov8n",
                "value": round(agg_fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(agg_fps / BASELINE_AGG_FPS, 3),
                "p50_batch_ms": round(p50_ms, 2),
                "p99_batch_ms": round(p99_ms, 2),
                "per_stream_fps": round(agg_fps / N_STREAMS, 2),
                "platform": platform,
            }
        )
    )


if __name__ == "__main__":
    main()

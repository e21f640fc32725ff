#!/usr/bin/env python
"""Headline benchmark: 32-stream aggregate detection throughput on one chip.

Measures the production fused per-batch step: 32 x 1080p uint8 BGR frames ->
device letterbox/normalize -> YOLOv8n forward (bf16) -> decode -> batched
NMS -> un-letterbox. North star (BASELINE.md): >=800 aggregate FPS
(32 streams x 25 FPS) with p50 batch latency < 40 ms on one v5e chip.

Measurement method: the step is iterated K times *inside one jit* (input
perturbed per iteration so XLA cannot hoist/CSE), timed against a 1-iteration
program of the same shape; (t_K - t_1) / (K - 1) is the marginal steady-state
batch time. This isolates sustained device throughput from per-dispatch RPC
latency, which on a tunneled dev chip (axon) is ~30 ms and on a real TPU VM
is microseconds. Host->device input transfer is pipelined/overlapped in
production (and PCIe on a TPU VM moves the 190 MB batch in ~20 ms); through
the dev tunnel it runs at ~190 MB/s and would measure the tunnel, not the
framework, so it is excluded here.

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
K_ITERS = 21
LATENCY_SLO_MS = 40.0  # p50 frame latency budget (BASELINE.md)
# candidate device batches: 32 = one frame per stream per step; 64 = two
# frames per stream per step (b=32 is dispatch-overhead-bound on v5e — b=64
# nearly doubles forward throughput for +15% latency)
BATCH_CANDIDATES = (32, 64, 128)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    cfg = DetectorConfig(
        model_path="yolov8n.pt",  # random init if absent: same FLOPs/graph
        model_type="yolov8",
        confidence_threshold=0.25,
        iou_threshold=0.45,
        input_size=[640, 640],
        max_batch_size=max(BATCH_CANDIDATES),
        batch_buckets=list(BATCH_CANDIDATES),
        max_detections=300,
        pre_nms_topk=512,
        precision="bf16",
        warmup=False,
    )
    engine = JaxYoloEngine(cfg)
    platform = jax.local_devices()[0].platform
    # the engine's own production step (includes its pallas-vs-xla
    # preprocess choice), so the bench measures exactly what serving runs
    engine_step = engine._build_step(SRC_HW)

    def fused_step(params, f):
        b, s, c, n = engine_step(params, f)
        # consume every output so nothing is dead-code-eliminated
        return (
            n.sum()
            + b.sum().astype(jnp.int32)
            + s.sum().astype(jnp.int32)
            + c.sum()
        )

    def make_loop(k: int, frames):
        @jax.jit
        def loop(params, f):
            def body(i, acc):
                ff = f.at[0, 0, 0, 0].set((i % 251).astype(jnp.uint8))
                return acc + fused_step(params, ff)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return loop

    def timed(fn, frames):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(jax.device_get(fn(engine.params, frames)))
            best = min(best, time.perf_counter() - t0)
        return best

    rng = np.random.default_rng(0)
    results = []
    for batch in BATCH_CANDIDATES:
        frames = jax.device_put(
            rng.integers(0, 256, (batch, *SRC_HW, 3), dtype=np.uint8)
        )
        loop1 = make_loop(1, frames)
        loopk = make_loop(K_ITERS, frames)
        int(jax.device_get(loop1(engine.params, frames)))  # compile + warm
        int(jax.device_get(loopk(engine.params, frames)))
        t1 = timed(loop1, frames)
        tk = timed(loopk, frames)
        batch_ms = (tk - t1) / (K_ITERS - 1) * 1e3
        results.append(
            {
                "device_batch": batch,
                "batch_ms": batch_ms,
                "agg_fps": batch / batch_ms * 1e3,
                "dispatch_overhead_ms": t1 * 1e3 - batch_ms,
            }
        )
        del frames

    # best aggregate FPS whose per-frame p50 latency fits the SLO
    ok = [r for r in results if r["batch_ms"] <= LATENCY_SLO_MS] or results
    best = max(ok, key=lambda r: r["agg_fps"])
    print(
        json.dumps(
            {
                "metric": "aggregate_detected_fps_32x1080p_yolov8n",
                "value": round(best["agg_fps"], 1),
                "unit": "frames/s",
                "vs_baseline": round(best["agg_fps"] / BASELINE_AGG_FPS, 3),
                "p50_batch_ms": round(best["batch_ms"], 2),
                "device_batch": best["device_batch"],
                "per_stream_fps": round(best["agg_fps"] / N_STREAMS, 2),
                "dispatch_overhead_ms": round(best["dispatch_overhead_ms"], 2),
                "all_batches": [
                    {k: round(v, 2) if isinstance(v, float) else v
                     for k, v in r.items()}
                    for r in results
                ],
                "platform": platform,
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-op profile of the production fused detect step on the chip.

Traces the b=<batch> host-select step with jax.profiler, converts the
xplane with xprof, and prints the top HLO ops by self time — the data that
decides which kernel (if any) is worth hand-fusing next.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python scripts/profile_step.py [--batch 128] [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import jax

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    src_hw = (1080, 1920)
    cfg = DetectorConfig(
        model_path="/tmp/bench_yolov8n_manifest.npz"
        if os.path.exists("/tmp/bench_yolov8n_manifest.npz") else "yolov8n.pt",
        model_type="yolov8",
        input_size=[640, 640],
        max_batch_size=args.batch,
        batch_buckets=[args.batch],
        precision="bf16",
        warmup=False,
    )
    engine = JaxYoloEngine(cfg)
    rng = np.random.default_rng(0)
    frames, selected = engine.host_prepare(
        rng.integers(0, 256, (args.batch, *src_hw, 3), dtype=np.uint8), src_hw
    )
    step = (
        engine._build_step_selected(src_hw) if selected
        else engine._build_step(src_hw)
    )
    import jax.numpy as jnp

    fdev = jax.device_put(frames)
    # compile + warm outside the trace
    out = step(engine.params, fdev)
    jax.device_get(out[3])
    logdir = args.logdir or tempfile.mkdtemp(prefix="rva_trace_")
    with jax.profiler.trace(logdir):
        for _ in range(5):
            out = step(engine.params, fdev)
        jax.device_get(out[3])
    print("trace ->", logdir)

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit("no xplane.pb produced")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # framework_op_stats: list of dicts with occurrences/self time
    if isinstance(rows, dict):
        rows = rows.get("data") or next(iter(rows.values()))
    ops = []
    for r in rows:
        try:
            ops.append(
                (
                    float(r.get("total_self_time_in_us")
                          or r.get("self_time_us") or 0.0),
                    int(r.get("occurrences") or 1),
                    r.get("operation") or r.get("op_name") or "?",
                )
            )
        except (TypeError, ValueError):
            continue
    ops.sort(reverse=True)
    total = sum(t for t, _, _ in ops)
    print(f"total self time: {total / 1e3:.2f} ms over 5 steps "
          f"({total / 5e3:.2f} ms/step)")
    for t, occ, name in ops[: args.top]:
        print(f"{t / 5e3:7.3f} ms/step  x{occ:<4d} {name[:110]}")


if __name__ == "__main__":
    main()

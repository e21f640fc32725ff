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
    # xprof conversion MUST run in a child process: it needs
    # PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python, which breaks the axon
    # TPU plugin if set in THIS process (and the pure-C++ protobuf in this
    # process silently yields empty tables).
    import subprocess
    import sys

    env = dict(os.environ)
    env["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    env["JAX_PLATFORMS"] = "cpu"
    code = subprocess.call(
        [sys.executable, __file__, "--convert", logdir,
         "--top", str(args.top)],
        env=env,
    )
    raise SystemExit(code)


def convert(logdir: str, top: int) -> None:
    """Child-process half: xplane -> hlo_stats table -> top ops."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)
    cols = [c["label"] if isinstance(c, dict) else c for c in d["cols"]]
    i_cat, i_name, i_text, i_occ, i_self = (
        cols.index("HLO op category"), cols.index("HLO op name"),
        cols.index("HLO op text"), cols.index("#Occurrences"),
        cols.index("Total self time (us)"),
    )

    def cell(r, i):
        v = r["c"][i]
        return v.get("v") if isinstance(v, dict) else v

    ops = []
    for r in d["rows"]:
        try:
            ops.append((float(cell(r, i_self)), str(cell(r, i_cat)),
                        str(cell(r, i_name)), int(cell(r, i_occ)),
                        str(cell(r, i_text))))
        except (TypeError, ValueError):
            continue
    ops.sort(reverse=True)
    total = sum(t for t, *_ in ops)
    print(f"total self time: {total / 1e3:.2f} ms over 5 steps "
          f"({total / 5e3:.2f} ms/step; tracing adds overhead vs the "
          f"differential bench timing)")
    for t, cat, name, occ, text in ops[:top]:
        print(f"{t / 5e3:7.3f} ms/step  {cat:<20} x{occ:<4d} {name}")
        print(f"         {text[:140]}")
    agg = {}
    for t, cat, *_ in ops:
        agg[cat] = agg.get(cat, 0.0) + t
    print("\nby category (ms/step):")
    for c, t in sorted(agg.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {t / 5e3:7.3f}  {c}")


if __name__ == "__main__":
    import sys

    if "--convert" in sys.argv:
        i = sys.argv.index("--convert")
        t = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 25
        convert(sys.argv[i + 1], t)
    else:
        main()

"""Measure the generic ONNX-graph serving path against the native engine.

The graph path trades the native engine's bf16 + stem-folded host-select
step for fidelity: fp32 end to end, full-frame upload, the user's own
graph compiled node-by-node (models/onnx_jax.py). This script puts an
honest on-chip number on that trade: the SAME YOLOv8n architecture served
(a) natively and (b) as a torch-exported ONNX graph through the fallback,
differential-timed at the serving buckets (same method as bench.py §1).

Run on the dev box (tunnel TPU) with the box otherwise quiet:

    python scripts/bench_graph_path.py --buckets 16,128

Results belong in docs/performance.md, not in bench.py's default output
(each bucket costs a tunnel compile; the driver's round-end budget stays
protected).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

INPUT = 640
SRC_HW = (1080, 1920)


def _export_v8_onnx(path: str) -> None:
    """torch-export the v8n mirror at the serving input size (dynamic
    batch) — the same graph family a user would bring from Ultralytics."""
    import torch

    from test_onnx_graph_exec import _export
    from torch_mirror import TorchYoloMirror

    from realtime_analytics_tpu.models.yolo import build_yolo

    torch.manual_seed(0)
    tm = TorchYoloMirror(build_yolo("yolov8", "n", nc=80)).eval()
    _export(tm, torch.rand(1, 3, INPUT, INPUT), path,
            dynamic_axes={"x": {0: "n"}})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="16,128")
    ap.add_argument("--onnx", default="/tmp/v8n_graph_bench.onnx")
    args = ap.parse_args()
    buckets = [int(b) for b in args.buckets.split(",")]

    if not os.path.exists(args.onnx):
        _export_v8_onnx(args.onnx)
        print(f"exported {args.onnx}", flush=True)

    import jax

    from bench import _diff_time_step  # repo-root bench.py
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    def engine_for(model_path: str) -> JaxYoloEngine:
        return JaxYoloEngine(DetectorConfig(
            model_path=model_path, model_type="yolov8",
            backend="onnx" if model_path.endswith(".onnx") else "jax",
            input_size=[INPUT, INPUT], batch_buckets=buckets,
            max_batch_size=max(buckets), warmup=False,
        ))

    rng = np.random.default_rng(0)
    rows = {}
    for label, path in (("native", "missing-yolov8n.pt"),
                        ("graph", args.onnx)):
        eng = engine_for(path)
        graph_backed = bool(getattr(eng.model, "graph_backed", False))
        assert graph_backed == (label == "graph"), label
        for b in buckets:
            frames = rng.integers(0, 256, (b, *SRC_HW, 3), dtype=np.uint8)
            dev_in, selected = eng.host_prepare(frames, SRC_HW)
            step = (eng._get_step_selected(b, SRC_HW) if selected
                    else eng._get_step(b, SRC_HW))
            x = jax.device_put(dev_in, eng.device)
            t0 = time.time()
            ms, seq_ms = _diff_time_step(step, eng.params, x)
            rows[f"{label}_b{b}"] = {
                "step_ms": round(ms, 3),
                "ms_per_frame": round(ms / b, 4),
                "fps": round(b / ms * 1e3, 1),
                "compute_dtype": str(eng.compute_dtype.__name__
                                     if hasattr(eng.compute_dtype,
                                                "__name__")
                                     else eng.compute_dtype),
                "host_select": bool(selected),
                "compile_plus_measure_s": round(time.time() - t0, 1),
            }
            print(json.dumps({f"{label}_b{b}": rows[f"{label}_b{b}"]}),
                  flush=True)
    for b in buckets:
        n, g = rows[f"native_b{b}"], rows[f"graph_b{b}"]
        rows[f"ratio_b{b}"] = round(g["step_ms"] / n["step_ms"], 2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()

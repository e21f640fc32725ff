"""XLA flag sweep for the production b=128 serving step.

Times the fused selected step (host-picked 1080p input) under candidate
XLA_FLAGS values, each in a fresh subprocess (XLA reads the flags once at
backend init). Differential timing (t_K - t_1)/(K-1), same method as
bench.py section 1.

Usage:  python scripts/bench_step_flags.py [--batch 128] [--k 21]
Prints one line per flag set; invalid flags are reported and skipped.

Note: through the axon dev tunnel the client-side XLA does NOT register
TPU backend flags (compilation happens server-side), so every
``--xla_tpu_*`` candidate fails with "Unknown flag" there (measured
2026-08-17; baseline 15.73 ms). Run this sweep on a real TPU VM.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CANDIDATES = [
    ("baseline", ""),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("no_lhs", "--xla_tpu_enable_latency_hiding_scheduler=false"),
    ("no_multi_level", "--xla_tpu_use_bundle_aware_cost_model_for_fusions=false"),
]

CHILD = r"""
import json, os, sys, time
import numpy as np
import jax, jax.numpy as jnp
from realtime_analytics_tpu.config import DetectorConfig
from realtime_analytics_tpu.engine.detector import JaxYoloEngine

batch = int(sys.argv[1]); K = int(sys.argv[2])
cfg = DetectorConfig(model_path="/tmp/bench_yolov8n_manifest.npz",
                     model_type="yolov8", confidence_threshold=0.25,
                     input_size=[640, 640], max_batch_size=batch,
                     batch_buckets=[batch], warmup=False)
eng = JaxYoloEngine(cfg)
src = (1080, 1920)
host, sel = eng.host_prepare(
    np.random.default_rng(0).integers(0, 256, (batch, *src, 3), np.uint8), src)
assert sel
step = eng._build_step_selected(src, batch)
frames = jax.device_put(host)

def make_loop(k):
    def fused(p, f):
        b, s, c, n = step(p, f)
        return (n.sum() + b.sum().astype(jnp.int32)
                + s.sum().astype(jnp.int32) + c.sum())
    @jax.jit
    def loop(p, f):
        def body(i, acc):
            ff = f.at[0, 0, 0, 0].set((i % 251).astype(jnp.uint8))
            return acc + fused(p, ff)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    return loop

l1, lk = make_loop(1), make_loop(K)
int(jax.device_get(l1(eng.params, frames)))
int(jax.device_get(lk(eng.params, frames)))

def timed(fn):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(jax.device_get(fn(eng.params, frames)))
        best = min(best, time.perf_counter() - t0)
    return best

t1, tk = timed(l1), timed(lk)
ms = (tk - t1) / (K - 1) * 1e3
print(json.dumps({"batch_ms": ms, "agg_fps": batch / ms * 1e3,
                  "platform": jax.local_devices()[0].platform}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--only", help="comma-separated candidate names")
    args = ap.parse_args()

    # bench.py's manifest-synthetic checkpoint (generate if absent)
    if not os.path.exists("/tmp/bench_yolov8n_manifest.npz"):
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench

        bench._ensure_weights()

    names = set(args.only.split(",")) if args.only else None
    for name, flags in CANDIDATES:
        if names and name not in names:
            continue
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        proc = subprocess.run(
            [sys.executable, "-c", CHILD, str(args.batch), str(args.k)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0:
            tail = (proc.stderr or "").strip().splitlines()[-1:]
            print(f"{name:16s} FAILED: {' '.join(tail)[:160]}")
            continue
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        print(
            f"{name:16s} {out['batch_ms']:7.2f} ms/batch "
            f"{out['agg_fps']:8.1f} fps  [{flags or 'default'}]"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

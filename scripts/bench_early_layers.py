#!/usr/bin/env python
"""Measure the early-layer (stem -> first C2f) segment cost at b=128.

The round-2 bottleneck analysis (docs/performance.md) identified the early
layers as the remaining HBM lever: stem + first C2f emit ~40% of activation
bytes. This script differential-times just that segment (pad + cast + nodes
0..2 of YOLOv8n) with the same K-vs-1 fori_loop method bench.py uses, so we
know the XLA baseline before building a fused Pallas block, and can measure
the Pallas block against it.

Usage: python scripts/bench_early_layers.py [--batch 128] [--impl xla|pallas]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from realtime_analytics_tpu.models.yolo import build_yolo
from realtime_analytics_tpu.ops.preprocess import letterbox_spec

K_ITERS = 21
SRC_HW = (1080, 1920)
INPUT_HW = (640, 640)


def timed(fn, *args):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        # device_get, not block_until_ready: the latter is a no-op through
        # the axon dev tunnel (bench.py uses the same forcing)
        float(jax.device_get(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def diff_time(make_loop, params, frames):
    loop1 = make_loop(1)
    loopk = make_loop(K_ITERS)
    float(jax.device_get(loop1(params, frames)))  # compile
    float(jax.device_get(loopk(params, frames)))
    t1 = timed(loop1, params, frames)
    tk = timed(loopk, params, frames)
    print({"t1_ms": round(t1 * 1e3, 2), "tk_ms": round(tk * 1e3, 2)})
    return (tk - t1) / (K_ITERS - 1) * 1e3


def early_segment(model, params, x, n_nodes: int):
    """Run nodes [0, n_nodes) of the model on x (already padded+cast)."""
    layers = params["layers"]
    prev = x
    outs = {}
    for i, node in enumerate(model.nodes[:n_nodes]):
        p = layers.get(str(i), {})
        from realtime_analytics_tpu.models.layers import conv_act
        from realtime_analytics_tpu.models.yolo import _c2f, _sppf

        if node.kind == "conv":
            y = conv_act(p, prev, stride=node.s, padding=node.p)
        elif node.kind == "c2f":
            y = _c2f(p, prev, node.n, node.shortcut)
        elif node.kind == "sppf":
            y = _sppf(p, prev, node.k)
        else:
            raise ValueError(node.kind)
        outs[i] = y
        prev = y
    return prev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=3,
                    help="number of leading nodes in the segment (3 = stem+P2+c2f)")
    ap.add_argument("--impl", default="xla", choices=("xla", "pallas"))
    args = ap.parse_args()

    model = build_yolo("yolov8", "n", 80)
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    spec = letterbox_spec(SRC_HW, INPUT_HW)
    b = args.batch
    rng = np.random.default_rng(0)
    # host-selected input: [N, 360, 640, 3] uint8 (1080p -> exact 3x pick)
    sel = rng.integers(0, 256, (b, spec.new_h, spec.new_w, 3), dtype=np.uint8)
    frames = jax.device_put(sel)
    params = jax.device_put(params)

    pad_bottom = spec.dst_h - spec.new_h - spec.pad_top
    pad_right = spec.dst_w - spec.new_w - spec.pad_left

    def prep(f):
        return jnp.pad(
            f, ((0, 0), (spec.pad_top, pad_bottom),
                (spec.pad_left, pad_right), (0, 0)),
            constant_values=114,
        ).astype(jnp.bfloat16)

    if args.impl == "xla":
        def segment(p, f):
            return early_segment(model, p, prep(f), args.nodes)
    else:
        from realtime_analytics_tpu.ops.pallas_early import early_block

        def segment(p, f):
            return early_block(p, f, spec)

    def make_loop(k: int):
        @jax.jit
        def loop(p, f):
            def body(i, acc):
                ff = f.at[0, 0, 0, 0].set((i % 251).astype(jnp.uint8))
                y = segment(p, ff)
                return acc + y.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return loop

    ms = diff_time(make_loop, params, frames)
    # cost analysis of one segment call
    lowered = jax.jit(segment).lower(params, frames)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print({
        "impl": args.impl,
        "batch": b,
        "nodes": args.nodes,
        "segment_ms": round(ms, 3),
        "flops_g": round(ca.get("flops", 0) / 1e9, 1),
        "bytes_gb": round(ca.get("bytes accessed", 0) / 1e9, 2),
        "platform": jax.local_devices()[0].platform,
    })


if __name__ == "__main__":
    main()

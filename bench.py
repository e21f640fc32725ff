#!/usr/bin/env python
"""Headline benchmark: 32-stream aggregate detection throughput + true
end-to-end frame latency on one chip.

Section 1 — device throughput (the headline number). Measures the
production fused per-batch step: 32 x 1080p uint8 BGR frames -> device
letterbox/normalize -> YOLOv8n forward (bf16) -> decode -> batched NMS ->
un-letterbox. North star (BASELINE.md): >=800 aggregate FPS (32 streams x
25 FPS) with p50 frame latency < 40 ms on one v5e chip.

Measurement method A: the step is iterated K times *inside one jit* (input
perturbed per iteration so XLA cannot hoist/CSE), timed against a
1-iteration program of the same shape; (t_21 - t_1) / 20 is the marginal
steady-state batch time. This isolates sustained device throughput from
per-dispatch RPC latency, which on a tunneled dev chip (axon) is ~30 ms and
on a real TPU VM is microseconds. Method B (cross-check, round-2 VERDICT
weak #3): an independent K=41 program gives (t_41 - t_21) / 20 — two
disjoint differentials that share no endpoint arithmetic; the JSON reports
both and their agreement. t_1 itself IS the sequential-dispatch time
(1 batch + 1 dispatch), reported as seq_ms_per_batch. MFU is reported from
XLA's own cost analysis of the compiled step against the v5e bf16 peak.

Section 1b — measured HOST per-frame cost (pick + stack + track): the
host-side work the pipeline adds around the device call, timed on this box.

Section 2 — true frame latency (the SLO is *frame* latency, not device
batch time). Runs the REAL pipeline — synthetic 1080p streams (pre-rendered
frame pool: rendering is decoder work, not framework work) -> host filters
-> InferenceBatcher -> tracker -> memory sink — and reports p50/p90/p99
per-frame latency from the stream-health records.
  Measured: every host-side component (filters, batcher, pick, stack,
  tracker, sink) on this box, and the device service time per bucket on the
  real chip (section 1).
  Modeled: ONLY the PCIe H2D link (bucket bytes / 10 GB/s), applied as a
  blocking call exactly where the real device call sits. Running the device
  calls through the dev tunnel instead would measure the tunnel (~190 MB/s
  H2D + ~30 ms RPC per dispatch); section 2b captures that anyway as a
  device-in-the-loop cross-check.

Section 2b — REAL-engine window: the same pipeline with the actual JAX
engine in the loop (no emulation) for a short window at a small stream
count. On a tunneled dev chip the per-dispatch RPC (~30 ms, measured in
section 1 as seq overhead) lands in every frame's latency — the JSON
carries the decomposition so the number is auditable rather than silently
optimistic. On a real TPU VM this section IS the SLO measurement.

Weights: a real checkpoint is used when present (yolov8n.pt /
models/yolov8n.pt); otherwise a manifest-exact synthetic checkpoint is
generated from the published Ultralytics key->shape manifest and loaded
through the full checkpoint path (same code a real .pt takes), so the
loader is exercised end to end — values are synthetic, layout is real.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_AGG_FPS = 800.0  # north-star: 32 streams x 25 FPS on one chip
N_STREAMS = 32
SRC_HW = (1080, 1920)
K_ITERS = 21
K_CHECK = 41  # method-B loop length (cross-check differential)
LATENCY_SLO_MS = 40.0  # p50 frame latency budget (BASELINE.md)
# candidate device batches: 4 = the small-stream-count serving bucket;
# 16 = the latency-optimal 32-stream bucket (two pipelined b=16 batches
# beat one b=32 on p50); 32 = one frame per stream per step; 64/128 =
# throughput buckets (batch-minor layouts fill the 128-wide lane dim)
BATCH_CANDIDATES = tuple(
    int(x) for x in os.environ.get("RVA_BENCH_BATCHES", "4,16,32,64,128").split(",")
)
CROSSCHECK_BATCHES = tuple(
    b for b in (16, 128) if b in BATCH_CANDIDATES
) or BATCH_CANDIDATES[-1:]  # method-B runs here (1 extra compile each)
PIPELINE_SECONDS = float(os.environ.get("RVA_BENCH_PIPELINE_SECONDS", "45"))
REAL_WINDOW_SECONDS = float(os.environ.get("RVA_BENCH_REAL_SECONDS", "15"))
# pipeline_e2e stream count: the north star is 32 streams x 25 FPS, so the
# measured window runs the full 32 by default (RVA_BENCH_STREAMS overrides)
PIPELINE_STREAMS = int(os.environ.get("RVA_BENCH_STREAMS", str(N_STREAMS)))
BENCH_TEMPORAL = os.environ.get("RVA_BENCH_TEMPORAL", "1") == "1"
BENCH_RESNET = os.environ.get("RVA_BENCH_RESNET", "1") == "1"
BENCH_GRAPH = os.environ.get("RVA_BENCH_GRAPH", "1") == "1"
PCIE_GBPS = 10.0  # conservative TPU-VM host->device bandwidth for projection
V5E_BF16_PEAK_TFLOPS = 197.0  # published v5e peak, for the MFU figure


def _ensure_weights() -> tuple:
    """(model_path, kind): a real checkpoint if present, else a
    manifest-exact synthetic one (published layout, synthetic values)."""
    for cand in ("yolov8n.pt", "models/yolov8n.pt", "yolov8n.onnx"):
        if os.path.exists(cand):
            return cand, "real"
    path = "/tmp/bench_yolov8n_manifest.npz"
    if not os.path.exists(path):
        import importlib.util

        here = os.path.dirname(os.path.abspath(__file__))
        spec = importlib.util.spec_from_file_location(
            "gen_yolo_manifest", os.path.join(here, "scripts", "gen_yolo_manifest.py")
        )
        gen = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(gen)
        manifest = gen.yolov8_manifest("n")
        rng = np.random.default_rng(0)
        sd = {}
        for key, shape in manifest.items():
            if key.endswith("num_batches_tracked"):
                sd[key] = np.asarray(0, dtype=np.int64)
            elif key.endswith("running_var"):
                sd[key] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
            else:
                sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
        np.savez(path, **sd)
    return path, "manifest-synthetic"


def _flops_of(loop1, params, frames) -> float:
    """FLOPs of one compiled step from XLA's own cost analysis (the K=1
    loop program = exactly one step + loop scaffolding). 0.0 if the
    backend doesn't expose cost analysis."""
    try:
        compiled = loop1.lower(params, frames).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:  # noqa: BLE001 — older jax / unsupported backend
        return 0.0


def bench_device_throughput(engine, params) -> tuple:
    """Differential-times the engine's PRODUCTION serving step. With
    host_select active (1080p->640 is an exact 3x pixel pick) the device
    receives the host-picked [N, 360, 640, 3] uint8 — the full frame never
    crosses the link. Returns (per-batch results, h2d bytes per frame)."""
    import jax
    import jax.numpy as jnp

    probe, selected = engine.host_prepare(
        np.zeros((1, *SRC_HW, 3), np.uint8), SRC_HW
    )
    h2d_bytes = int(probe[0].nbytes)

    def build_step(batch: int):
        # per-batch build: the s2d_backbone policy is PER COMPILE BUCKET
        # (on for b<128 on v5e), so each batch must get its own executable
        # exactly like the engine's _get_step* would produce
        return (
            engine._build_step_selected(SRC_HW, batch) if selected
            else engine._build_step(SRC_HW, batch)
        )

    def make_loop(k: int, engine_step):
        def fused_step(p, f):
            b, s, c, n = engine_step(p, f)
            # consume every output so nothing is dead-code-eliminated
            return (
                n.sum()
                + b.sum().astype(jnp.int32)
                + s.sum().astype(jnp.int32)
                + c.sum()
            )

        @jax.jit
        def loop(p, f):
            def body(i, acc):
                ff = f.at[0, 0, 0, 0].set((i % 251).astype(jnp.uint8))
                return acc + fused_step(p, ff)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return loop

    def timed(fn, frames):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(jax.device_get(fn(params, frames)))
            best = min(best, time.perf_counter() - t0)
        return best

    rng = np.random.default_rng(0)
    results = []
    for batch in BATCH_CANDIDATES:
        host_frames, _ = engine.host_prepare(
            rng.integers(0, 256, (batch, *SRC_HW, 3), dtype=np.uint8), SRC_HW
        )
        frames = jax.device_put(host_frames)
        step = build_step(batch)
        loop1 = make_loop(1, step)
        loopk = make_loop(K_ITERS, step)
        int(jax.device_get(loop1(params, frames)))  # compile + warm
        int(jax.device_get(loopk(params, frames)))
        t1 = timed(loop1, frames)
        tk = timed(loopk, frames)
        batch_ms = (tk - t1) / (K_ITERS - 1) * 1e3
        row = {
            "device_batch": batch,
            "batch_ms": batch_ms,
            "agg_fps": batch / batch_ms * 1e3,
            "dispatch_overhead_ms": t1 * 1e3 - batch_ms,
            # one dispatch end to end = sequential-dispatch service time
            # (on a TPU VM ~= batch_ms; through the dev tunnel + ~30 ms RPC)
            "seq_ms_per_batch": t1 * 1e3,
        }
        if batch in CROSSCHECK_BATCHES:
            # method B: a disjoint differential from an independent program
            loopc = make_loop(K_CHECK, step)
            int(jax.device_get(loopc(params, frames)))
            tc = timed(loopc, frames)
            alt_ms = (tc - tk) / (K_CHECK - K_ITERS) * 1e3
            row["batch_ms_alt"] = alt_ms
            row["methods_agree_pct"] = round(
                abs(alt_ms - batch_ms) / batch_ms * 100.0, 1
            )
            # flops only where we already pay for an extra program — the
            # AOT lower().compile() does not reuse the jit call cache
            row["flops"] = _flops_of(loop1, params, frames)
        else:
            row["flops"] = 0.0
        results.append(row)
        del frames
    return results, h2d_bytes


def _flops_of_batch(engine, batch: int) -> float:
    """Cost-analysis FLOPs of one production step at ``batch`` (used when
    the selected bucket was not a crosscheck bucket, so no loop program's
    analysis exists to reuse)."""
    import jax

    try:
        host, selected = engine.host_prepare(
            np.zeros((batch, *SRC_HW, 3), np.uint8), SRC_HW
        )
        step = (
            engine._build_step_selected(SRC_HW, batch) if selected
            else engine._build_step(SRC_HW, batch)
        )
        compiled = step.lower(engine.params, jax.device_put(host)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:  # noqa: BLE001
        return 0.0


def bench_host_cost() -> dict:
    """Measured per-frame HOST work around the device call: the pixel pick
    (native C kernel), the batch stack, and one tracker association — the
    components whose cost lands inside the frame-latency number."""
    from realtime_analytics_tpu.config import TrackerConfig
    from realtime_analytics_tpu.native import pick_u8
    from realtime_analytics_tpu.tracker import IouTracker
    from realtime_analytics_tpu.types import Detection

    frame = np.random.default_rng(0).integers(
        0, 256, (*SRC_HW, 3), dtype=np.uint8
    )

    def best_ms(fn, reps=30):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    pick_ms = best_ms(lambda: pick_u8(frame, 3, 1, 3, 1))
    picked = [pick_u8(frame, 3, 1, 3, 1) for _ in range(16)]
    stack_ms = best_ms(lambda: np.stack(picked)) / 16  # per frame

    tracker = IouTracker(TrackerConfig())
    dets = [
        Detection("cam", 0, k, 0.9, (50.0 + 40 * k, 60.0, 150.0 + 40 * k, 200.0))
        for k in range(4)
    ]
    tracker.update("cam", dets)  # establish tracks so update does matching

    def track_once():
        tracker.update("cam", dets)

    track_ms = best_ms(track_once)
    return {
        "pick_ms": round(pick_ms, 3),
        "stack_ms_per_frame": round(stack_ms, 3),
        "track_update_ms": round(track_ms, 3),
        "total_ms": round(pick_ms + stack_ms + track_ms, 3),
    }


class EmulatedDeviceEngine:
    """The real engine's host-side contract with a measured-latency device.

    ``predict_packets`` does the same host work the JAX engine does (stack
    frames into a contiguous batch, pad to the compile bucket), then blocks
    for the device service time — the *measured* fused-step ms of that
    bucket (section 1, real chip) + modeled PCIe H2D of the padded bucket —
    exactly where the real device call blocks. Returns synthetic moving
    boxes so the tracker does real association work.
    """

    def __init__(self, config, step_ms_by_bucket: dict, pcie_ms_per_frame: float):
        self.buckets = sorted(step_ms_by_bucket)
        self.step_ms = dict(step_ms_by_bucket)
        self.pcie_frame = pcie_ms_per_frame
        self.config = config  # the worker reads confidence_threshold etc.

    def predict_packets(self, packets):
        # host_select pixel pick straight into the batch buffer, exactly
        # like the real engine (_predict_group: one copy total — a
        # pick-then-stack would copy the picked data twice)
        from realtime_analytics_tpu.native import pick_u8, picked_shape

        h, w = packets[0].frame.shape[:2]
        oh, ow = picked_shape(h, w, 3, 1, 3, 1)
        frames = np.empty((len(packets), oh, ow, 3), np.uint8)
        for j, p in enumerate(packets):
            pick_u8(p.frame, 3, 1, 3, 1, out=frames[j])
        del frames
        n = len(packets)
        # cost-aware, like the production engine: cheapest fitting bucket
        cands = [b for b in self.buckets if n <= b] or [self.buckets[-1]]
        bucket = min(cands, key=lambda b: (self.step_ms[b], b))
        # the real engine pads BEFORE device_put, so H2D moves the bucket
        time.sleep((self.step_ms[bucket] + self.pcie_frame * bucket) / 1e3)
        from realtime_analytics_tpu.types import Detection

        out = []
        for p in packets:
            t = p.frame_id * 3
            out.append([
                Detection(p.stream.name, p.frame_id, k,
                          0.9, (50.0 + t + 40 * k, 60.0 + t, 150.0 + t + 40 * k,
                                200.0 + t))
                for k in range(2)
            ])
        return out


def _pipeline_config(n_streams: int, buckets, max_batch: int,
                     model_path: str = "__emulated__.pt"):
    from realtime_analytics_tpu.config import (
        DetectorConfig,
        KafkaSinkConfig,
        PipelineConfig,
        PrometheusConfig,
        SnapshotConfig,
        StreamConfig,
        TrackerConfig,
    )

    det_cfg = DetectorConfig(
        model_path=model_path, confidence_threshold=0.25,
        max_batch_size=max_batch, warmup=False,
        batch_buckets=sorted(buckets),
    )
    # pre-rendered pool per stream: rendering is decoder work, not framework
    # work. At 32 streams a 24-frame 1080p pool is ~20 s of serialized render
    # on a 1-core host — shrink it so startup stays a small slice of the
    # window (the bench reports startup_s and excludes it from steady fps)
    pool = 24 if n_streams <= 8 else 10
    streams = [
        StreamConfig(
            name=f"cam-{i:02d}",
            url=(
                f"synthetic://?width={SRC_HW[1]}&height={SRC_HW[0]}"
                f"&boxes=4&seed={i}&pool={pool}"
            ),
            target_fps=25,
            warmup_seconds=0.0,
            batch_size=2,  # allows depth-2 pipelining per stream
            adaptive_fps=False,
        )
        for i in range(n_streams)
    ]
    return PipelineConfig(
        streams=streams,
        detector=det_cfg,
        tracker=TrackerConfig(),
        kafka=KafkaSinkConfig(enabled=True, transport="memory"),
        prometheus=PrometheusConfig(enabled=False),
        snapshots=SnapshotConfig(enabled=False),
        batch_window_ms=4,
        stats_interval_seconds=3600,
    )


def _post_startup_fps(samples, startup_s: float, frames: int,
                      wall: float) -> float:
    """Frames completed after `startup_s` over the post-startup window,
    from the 1 Hz (t, frames) sample trail; falls back to the whole-run
    rate when the trail can't bracket the startup point."""
    for t, f in samples:
        if t >= startup_s:
            if wall - t > 1e-9:
                return round((frames - f) / (wall - t), 1)
            break
    return round(frames / wall, 1) if wall > 0 else 0.0


def _run_pipeline_window(cfg, detector_factory, seconds: float) -> dict:
    """Run the real pipeline for `seconds` with `detector_factory` supplying
    the engine; return frame-latency stats from the stream-health records."""
    import asyncio

    from realtime_analytics_tpu import pipeline as pipeline_mod

    pipeline = pipeline_mod.AnalyticsPipeline(cfg)
    real_create = pipeline_mod.create_detector
    pipeline_mod.create_detector = detector_factory
    # 1 Hz (t, frames-completed) samples so post-startup rates divide
    # post-startup FRAMES by the post-startup window (whole-run frames
    # over the partial window would overstate the rate)
    samples = []

    async def _run_and_sample():
        run = asyncio.ensure_future(pipeline.run_for(seconds))
        t0s = time.perf_counter()
        while not run.done():
            await asyncio.wait([run], timeout=1.0)
            samples.append((
                time.perf_counter() - t0s,
                sum(w.health.total_frames for w in pipeline.workers),
            ))
        await run

    try:
        t0 = time.perf_counter()
        t0_wall = time.time()
        cpu0 = time.process_time()
        asyncio.run(_run_and_sample())
        cpu = time.process_time() - cpu0
        wall = time.perf_counter() - t0
    finally:
        pipeline_mod.create_detector = real_create

    lat_ms = []
    frames = 0
    first_ts = []
    steady_fps = 0.0
    for w in pipeline.workers:
        lat_ms.extend(t * 1e3 for t in w.health.recent_processing_times)
        frames += w.health.total_frames
        if w.health.first_success_ts:
            first_ts.append(w.health.first_success_ts - t0_wall)
        steady_fps += w.health.effective_fps
    st = pipeline.batchers["__default__"].stats
    lat_ms.sort()
    # startup = until the SLOWEST stream produced its first frame (pool
    # pre-render + open); steady fps sums each stream's recent-window rate
    startup_s = max(first_ts) if len(first_ts) == len(cfg.streams) else 0.0
    cores = os.cpu_count() or 1

    def pct(p):
        return lat_ms[min(len(lat_ms) - 1, int(p / 100 * len(lat_ms)))] if lat_ms else 0.0

    return {
        "host_cores": cores,
        "n_streams": len(cfg.streams),
        "offered_fps": sum(s.target_fps for s in cfg.streams),
        "frames_processed": frames,
        "wall_s": round(wall, 1),
        "startup_s": round(startup_s, 1),
        "pipeline_agg_fps": round(frames / wall, 1),
        # post-startup fps: frames completed AFTER the slowest stream went
        # live, over that window only (startup is pool pre-render = decoder
        # work, not framework work; frames from the ramp are excluded from
        # the numerator too — sampled at 1 Hz during the run)
        "serving_agg_fps": _post_startup_fps(
            samples, startup_s, frames, wall
        ),
        # sum of per-stream rates over each stream's recent success window
        "steady_agg_fps": round(steady_fps, 1),
        "p50_frame_ms": round(pct(50), 1),
        "p90_frame_ms": round(pct(90), 1),
        "p99_frame_ms": round(pct(99), 1),
        # empty window (e.g. a saturated bench host) must NOT read as a
        # vacuous pass
        "meets_40ms_slo": bool(lat_ms) and pct(50) <= LATENCY_SLO_MS,
        # process CPU seconds / (wall * cores): ~1.0 on a 1-core box means
        # the BENCH HOST is the bottleneck and latency numbers measure host
        # queueing, not the framework (a TPU-VM host has ~100 cores)
        "host_cpu_utilization": round(cpu / (wall * cores), 3),
        "avg_device_batch": round(st.avg_batch_size, 2),
        "avg_batch_service_ms": round(st.avg_infer_ms, 1),
        "avg_queue_wait_ms": round(st.sum_wait_ms / max(st.frames, 1), 1),
        "shed_frames": st.shed,
        "batches": st.batches,
    }


def bench_pipeline_latency(step_ms_by_bucket: dict, pcie_ms_per_frame: float,
                           n_streams: int = PIPELINE_STREAMS) -> dict:
    """Run the real pipeline; return frame-latency stats. Device service
    time is hardware-measured; ONLY the PCIe link is modeled (module
    docstring). Frame rendering is pre-pooled — decoder work, not framework
    work — so the timed path carries only real framework cost.

    Runs the FULL north-star load (32 streams x 25 FPS) by default. On a
    saturated *bench host* the numbers measure the host's own queueing
    collapse, not the framework — the JSON carries host_cpu_utilization,
    cores and offered-vs-carried fps so that case reads as what it is
    (a v5e TPU-VM host has ~100 cores; this box may have 1).
    """
    cfg = _pipeline_config(
        n_streams, sorted(step_ms_by_bucket), max(step_ms_by_bucket)
    )
    # pre-render every stream's synthetic pool OUTSIDE the timed window
    # (decoder stand-in work, not framework work — on the 1-core bench box
    # 32 serialized 1080p pool renders used to put ~35 s of "startup"
    # inside the measured window; real deploys pay this in the camera's
    # ffmpeg decoder). The process-level pool cache makes the pipeline's
    # own opens instant.
    from realtime_analytics_tpu.ingest.synthetic import prerender_pool

    t0 = time.perf_counter()
    pooled = sum(prerender_pool(s.url) for s in cfg.streams)
    prerender_s = time.perf_counter() - t0
    out = _run_pipeline_window(
        cfg,
        lambda c: EmulatedDeviceEngine(c, step_ms_by_bucket, pcie_ms_per_frame),
        PIPELINE_SECONDS,
    )
    out["pool_prerender_s"] = round(prerender_s, 1)
    out["pool_frames"] = pooled
    out["device_model"] = (
        "measured: host path on this box + step(bucket) on the real chip "
        f"(buckets {dict((k, round(v, 1)) for k, v in sorted(step_ms_by_bucket.items()))} ms); "
        f"modeled: PCIe H2D only ({pcie_ms_per_frame:.2f} ms/frame at "
        f"{PCIE_GBPS:.0f} GB/s), depth-2 pipelined"
    )
    return out


def bench_real_engine_window(engine, buckets, seconds: float,
                             tunnel_dispatch_ms: float) -> dict:
    """Device-in-the-loop: the same pipeline with the REAL JAX engine (no
    emulation) at a small stream count. Nothing is modeled here — but on a
    tunneled dev chip every dispatch carries the ~30 ms RPC measured in
    section 1, which lands in every frame's latency. The decomposition is
    attached so the number reads as what it is."""
    cores = os.cpu_count() or 1
    n_streams = max(1, min(4, cores * 2))
    cfg = _pipeline_config(n_streams, buckets, max(buckets),
                           model_path=engine.config.model_path)
    # pre-compile the serving buckets this window can hit (n_streams x
    # depth-2 in-flight), so the window measures serving, not XLA compiles
    warm = [b for b in sorted(buckets) if b <= max(4, n_streams * 2)]
    engine.warmup(SRC_HW, buckets=warm or [sorted(buckets)[0]])
    out = _run_pipeline_window(cfg, lambda c: engine, seconds)
    out["note"] = (
        "real engine in the loop; per-dispatch overhead on this link "
        f"(measured, section 1) ~{tunnel_dispatch_ms:.0f} ms is inside every "
        "frame latency — on a TPU VM it is microseconds"
    )
    out["dispatch_overhead_ms"] = round(tunnel_dispatch_ms, 1)
    return out


def _diff_time_step(step, params, x, k_iters: int = 9) -> tuple:
    """Section-1 differential method for an arbitrary (params, batch) step:
    two fori_loop programs, (t_k - t_1)/(k - 1) is the marginal in-device
    step time, t_1 the sequential dispatch time. Input is perturbed per
    iteration so XLA cannot hoist the body."""
    import jax
    import jax.numpy as jnp

    def consume(out):
        tot = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(out):
            tot = tot + leaf.sum().astype(jnp.float32)
        return tot

    def make_loop(k: int):
        @jax.jit
        def loop(p, f):
            def body(i, acc):
                idx = (0,) * f.ndim
                ff = f.at[idx].set((i % 251).astype(f.dtype))
                return acc + consume(step(p, ff))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return loop

    loop1, loopk = make_loop(1), make_loop(k_iters)
    float(jax.device_get(loop1(params, x)))  # compile + warm
    float(jax.device_get(loopk(params, x)))

    def timed(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.device_get(fn(params, x)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = timed(loop1), timed(loopk)
    return (tk - t1) / (k_iters - 1) * 1e3, t1 * 1e3


def bench_temporal(yolo_frame_ms: float) -> dict:
    """Clip step time per temporal family at the serving bucket — the
    comparison row for the reference's relative-cost table
    (docs/TEMPORAL_DETECTION.md:201-207, mirrored in BASELINE.md): cost
    relative to one single-frame YOLO inference."""
    import jax

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine

    # reference relative-cost rows (vs single-frame YOLO = 1x)
    ref_rel = {"cnn_lstm": "8-16x", "3d_cnn": "10-20x",
               "conv_gru": "6-12x", "slow_fast": "15-30x"}
    clip_batch = 4
    rows = []
    rng = np.random.default_rng(0)
    for family, side in (("cnn_lstm", 224), ("conv_gru", 224),
                         ("3d_cnn", 112), ("slow_fast", 112)):
        cfg = DetectorConfig(
            model_path=f"missing-{family}.npz", model_type=family,
            input_size=[side, side], precision="bf16", warmup=False,
            batch_buckets=[clip_batch], max_batch_size=clip_batch,
        )
        engine = JaxTemporalEngine(cfg)
        t_len = cfg.sequence_length
        x = jax.device_put(rng.integers(
            0, 256, (clip_batch, t_len, side, side, 3), dtype=np.uint8
        ), engine.device)
        step = engine._get_step(clip_batch, (side, side))
        ms, seq_ms = _diff_time_step(step, engine.params, x)
        clip_ms = ms / clip_batch
        row = {
            "model": family,
            "input": side,
            "t": t_len,
            "clip_batch": clip_batch,
            "batch_ms": round(ms, 2),
            "ms_per_clip": round(clip_ms, 2),
            "clips_per_s": round(clip_batch / ms * 1e3, 1),
            # each served clip advances sequence_step NEW frames (overlap)
            "frames_advanced_per_clip": engine.sequence_step,
            "stream_frames_per_s": round(
                clip_batch / ms * 1e3 * engine.sequence_step, 1
            ),
            "seq_ms_per_batch": round(seq_ms, 2),
            "ref_relative_cost": ref_rel[family],
        }
        if yolo_frame_ms > 0:
            row["relative_cost_vs_yolo_frame"] = round(
                clip_ms / yolo_frame_ms, 1
            )
        rows.append(row)
        del engine, x
    return {
        "note": "bf16 clip step (device preprocess + forward) at the "
                "serving bucket; relative cost vs one single-frame YOLO "
                "inference (reference table is relative too)",
        "yolo_frame_ms": round(yolo_frame_ms, 3),
        "models": rows,
    }


def bench_resnet() -> dict:
    """ResNet-18 classification throughput at the device input (224) —
    the secondary-classifier engine the reference runs via its torch/ONNX
    backends (detector.py:933-1008)."""
    import jax

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxResNetEngine

    batch = 32
    cfg = DetectorConfig(
        model_path="missing-resnet18.npz", model_type="resnet",
        input_size=[224, 224], precision="bf16", warmup=False,
        batch_buckets=[batch], max_batch_size=batch,
    )
    engine = JaxResNetEngine(cfg)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(
        0, 256, (batch, 224, 224, 3), dtype=np.uint8
    ), engine.device)
    step = engine._get_step(batch, (224, 224))
    ms, seq_ms = _diff_time_step(step, engine.params, x)
    return {
        "model": "resnet18",
        "input": 224,
        "batch": batch,
        "batch_ms": round(ms, 2),
        "frames_per_s": round(batch / ms * 1e3, 1),
        "seq_ms_per_batch": round(seq_ms, 2),
    }


def bench_graph_onnx(side: int = 256, batch: int = 32) -> dict:
    """Generic ONNX-graph serving (the reference ONNX-backend analog,
    detector.py:484-609): a foreign-architecture torch export served
    through the fused graph step, fp32 (the default numerics contract)
    vs the opt-in ``graph_precision: bf16`` mixed policy — the TPU analog
    of building an FP16 TensorRT engine from a user's fp32 ONNX."""
    import tempfile

    import jax
    import torch
    import torch.nn as nn

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    nc = 8

    class ForeignDet(nn.Module):
        """Unknown-layout stride-16 detector emitting the v8-style
        [N, 4+nc, A] matrix; enough channels that the MXU dominates."""

        def __init__(self):
            super().__init__()
            self.body = nn.Sequential(
                nn.Conv2d(3, 32, 3, stride=2, padding=1), nn.SiLU(),
                nn.Conv2d(32, 64, 3, stride=2, padding=1), nn.SiLU(),
                nn.Conv2d(64, 128, 3, stride=2, padding=1), nn.SiLU(),
                nn.Conv2d(128, 128, 3, stride=2, padding=1), nn.SiLU(),
                nn.Conv2d(128, 128, 3, padding=1), nn.SiLU(),
            )
            self.head = nn.Conv2d(128, 4 + nc, 1)

        def forward(self, x):
            p = self.head(self.body(x)).flatten(2)
            xywh = torch.sigmoid(p[:, :4]) * float(side)
            return torch.cat([xywh, torch.sigmoid(p[:, 4:])], dim=1)

    torch.manual_seed(0)
    m = ForeignDet().eval()
    path = os.path.join(tempfile.mkdtemp(prefix="rva_bench_"), "fdet.onnx")
    # export without the `onnx` package (not in the image): the final
    # _add_onnxscript_fn hop only splices custom onnxscript functions in
    # (a no-op for stock ops) but imports `onnx` unconditionally
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda b, c: b
    try:
        torch.onnx.export(
            m, (torch.rand(1, 3, side, side),), path, input_names=["x"],
            dynamic_axes={"x": {0: "n"}}, opset_version=17, dynamo=False,
        )
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (batch, side, side, 3), dtype=np.uint8)
    rows = {}
    for gp in ("fp32", "bf16"):
        engine = JaxYoloEngine(DetectorConfig(
            model_path=path, model_type="yolov8", backend="onnx",
            input_size=[side, side], num_classes=nc, warmup=False,
            graph_precision=gp, confidence_threshold=0.25,
            batch_buckets=[batch], max_batch_size=batch,
        ))
        if not getattr(engine.model, "graph_backed", False):
            return {"error": "graph fallback did not engage"}
        xd = jax.device_put(x, engine.device)
        step = engine._get_step(batch, (side, side))
        ms, seq_ms = _diff_time_step(step, engine.params, xd)
        rows[gp] = {
            "batch_ms": round(ms, 2),
            "frames_per_s": round(batch / ms * 1e3, 1),
            "seq_ms_per_batch": round(seq_ms, 2),
        }
        del engine, xd
    if "fp32" in rows and "bf16" in rows:
        rows["bf16_speedup"] = round(
            rows["fp32"]["batch_ms"] / rows["bf16"]["batch_ms"], 2
        )

    # int8 QOperator: quantize the same export with the in-repo PTQ
    # toolchain (the RKNN-toolkit-calibration analog) and serve the
    # artifact — integer convs ride the MXU s8xs8->s32 path
    from realtime_analytics_tpu.models.onnx_lite import (
        read_onnx_model, write_onnx_model)
    from realtime_analytics_tpu.models.quantize import quantize_graph

    g = read_onnx_model(path)
    feeds = []
    for i in range(4):
        f = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
        xi = (f[..., ::-1].astype(np.float32) / 255.0).transpose(2, 0, 1)
        feeds.append({g.inputs[0]: xi[None]})
    quant_cases = []
    ranges = None
    for fmt, gp, label in (
        ("qoperator", "fp32", "int8_qoperator"),
        ("qdq", "bf16", "qdq_int8_weights_bf16"),
    ):
        qg, rep = quantize_graph(g, feeds, fmt=fmt, reuse_ranges=ranges)
        ranges = rep.ranges  # calibrate once, reuse across formats
        qpath = os.path.join(os.path.dirname(path), f"fdet-{fmt}.onnx")
        write_onnx_model(
            qpath, qg,
            value_infos={qg.inputs[0]: (np.float32, ("n", 3, side, side))})
        quant_cases.append((qpath, gp, label))
    for qpath, gp, label in quant_cases:
        engine = JaxYoloEngine(DetectorConfig(
            model_path=qpath, model_type="yolov8", backend="onnx",
            input_size=[side, side], num_classes=nc, warmup=False,
            confidence_threshold=0.25, graph_precision=gp,
            batch_buckets=[batch], max_batch_size=batch,
        ))
        if not getattr(engine.model, "graph_backed", False):
            rows[label] = {"error": "graph fallback did not engage"}
            continue
        xd = jax.device_put(x, engine.device)
        step = engine._get_step(batch, (side, side))
        ms, seq_ms = _diff_time_step(step, engine.params, xd)
        rows[label] = {
            "batch_ms": round(ms, 2),
            "frames_per_s": round(batch / ms * 1e3, 1),
            "seq_ms_per_batch": round(seq_ms, 2),
            "speedup_vs_fp32": round(rows["fp32"]["batch_ms"] / ms, 2),
        }
        del engine, xd
    rows["model"] = f"foreign 6-conv detector @ {side}, b={batch}"
    return rows


def main() -> None:
    import jax

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    model_path, weights_kind = _ensure_weights()
    cfg = DetectorConfig(
        model_path=model_path,
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

    results, h2d_bytes = bench_device_throughput(engine, engine.params)

    # best aggregate FPS whose device batch time fits the SLO
    ok = [r for r in results if r["batch_ms"] <= LATENCY_SLO_MS] or results
    best = max(ok, key=lambda r: r["agg_fps"])

    # MFU of the selected step against the v5e bf16 peak (flops from XLA's
    # cost analysis of the compiled program; 0 -> unavailable)
    mfu = 0.0
    flops_per_batch = best.get("flops", 0.0)
    if flops_per_batch == 0.0 and platform == "tpu":
        # best bucket wasn't a crosscheck bucket (custom RVA_BENCH_BATCHES)
        # — pay one extra AOT compile rather than reporting mfu=0 as if
        # cost analysis were unavailable
        flops_per_batch = _flops_of_batch(engine, best["device_batch"])
    if flops_per_batch > 0 and platform == "tpu":
        achieved = flops_per_batch / (best["batch_ms"] / 1e3)
        mfu = achieved / (V5E_BF16_PEAK_TFLOPS * 1e12)

    host_cost = bench_host_cost()

    # --- section 2: true end-to-end frame latency through the pipeline ---
    pipe = {}
    pcie_ms_per_frame = h2d_bytes / (PCIE_GBPS * 1e9) * 1e3
    step_by_bucket = {
        r["device_batch"]: r["batch_ms"]
        for r in results if r["device_batch"] <= 32
    }
    pipe_scaled = {}
    if PIPELINE_SECONDS > 0:
        try:
            pipe = bench_pipeline_latency(step_by_bucket, pcie_ms_per_frame)
        except Exception as exc:  # noqa: BLE001
            pipe = {"error": str(exc)[:200]}
        pipe["host_per_frame_ms"] = host_cost
        # secondary: a host-scaled window (r01-r03 continuity) when the
        # bench host is too small to carry 32 streams without measuring
        # its own saturation
        cores = os.cpu_count() or 1
        scaled = max(2, min(PIPELINE_STREAMS, cores * 4))
        if scaled != PIPELINE_STREAMS:
            try:
                pipe_scaled = bench_pipeline_latency(
                    step_by_bucket, pcie_ms_per_frame, n_streams=scaled
                )
            except Exception as exc:  # noqa: BLE001
                pipe_scaled = {"error": str(exc)[:200]}
        # analytic p50 floor at FULL 32-stream load on an unconstrained
        # host: frames wait at most one batch window, then ~half a batch
        # service for a pipelined slot, then their own batch's wall time
        b16 = step_by_bucket.get(16)
        if b16 is not None:
            wall16 = b16 + 16 * pcie_ms_per_frame
            pipe["slo_decomposition_32streams"] = {
                "model": "p50_floor = batch_window + 0.5*batch_wall(b16) +"
                         " batch_wall(b16) + host_per_frame; host cost"
                         " measured in host_per_frame_ms",
                "batch_window_ms": 4.0,
                "batch_wall_b16_ms": round(wall16, 1),
                "p50_floor_ms": round(
                    4.0 + 1.5 * wall16 + host_cost["total_ms"], 1
                ),
                "slo_ms": LATENCY_SLO_MS,
                "floor_meets_slo": bool(
                    4.0 + 1.5 * wall16 + host_cost["total_ms"]
                    <= LATENCY_SLO_MS
                ),
            }

    # --- section 2b: REAL engine in the loop (no emulation) ---
    real_window = {}
    if REAL_WINDOW_SECONDS > 0 and platform == "tpu":
        try:
            real_window = bench_real_engine_window(
                engine, sorted(step_by_bucket), REAL_WINDOW_SECONDS,
                best["dispatch_overhead_ms"],
            )
        except Exception as exc:  # noqa: BLE001
            real_window = {"error": str(exc)[:200]}

    # --- section 3: temporal + ResNet engine throughput (r3 VERDICT #5;
    # the reference publishes a relative-cost table for these) ---
    temporal = {}
    resnet = {}
    if platform == "tpu":
        # YOLO per-frame cost at the latency bucket, for the relative row
        b16 = step_by_bucket.get(16)
        yolo_frame_ms = (b16 / 16) if b16 else (
            best["batch_ms"] / best["device_batch"]
        )
        if BENCH_TEMPORAL:
            try:
                temporal = bench_temporal(yolo_frame_ms)
            except Exception as exc:  # noqa: BLE001
                temporal = {"error": str(exc)[:200]}
        if BENCH_RESNET:
            try:
                resnet = bench_resnet()
            except Exception as exc:  # noqa: BLE001
                resnet = {"error": str(exc)[:200]}

    # --- section 4: generic ONNX-graph serving, fp32 vs bf16 policy ---
    graph_onnx = {}
    if platform == "tpu" and BENCH_GRAPH:
        try:
            graph_onnx = bench_graph_onnx()
        except Exception as exc:  # noqa: BLE001
            graph_onnx = {"error": str(exc)[:200]}

    full = {
        "metric": "aggregate_detected_fps_32x1080p_yolov8n",
        "value": round(best["agg_fps"], 1),
        "unit": "frames/s",
        "vs_baseline": round(best["agg_fps"] / BASELINE_AGG_FPS, 3),
        "p50_batch_ms": round(best["batch_ms"], 2),
        "device_batch": best["device_batch"],
        "per_stream_fps": round(best["agg_fps"] / N_STREAMS, 2),
        "dispatch_overhead_ms": round(best["dispatch_overhead_ms"], 2),
        "mfu": round(mfu, 4),
        "model_gflops_per_batch": round(flops_per_batch / 1e9, 2),
        "weights": weights_kind,
        "all_batches": [
            {k: round(v, 2) if isinstance(v, float) else v
             for k, v in r.items() if k != "flops"}
            for r in results
        ],
        "pipeline_e2e": pipe,
        "pipeline_e2e_host_scaled": pipe_scaled,
        "real_engine_window": real_window,
        "temporal": temporal,
        "resnet": resnet,
        "graph_onnx": graph_onnx,
        "platform": platform,
    }
    # Full detail goes to the capture file (the single source every doc
    # table cites); stdout carries ONE SHORT parseable line — the driver
    # keeps only the output tail, so a multi-KB line would be truncated
    # into unparseable JSON (BENCH_r04 "parsed": null).
    capture = os.environ.get(
        "RVA_BENCH_CAPTURE", os.path.join("docs", "bench_r05_capture.json")
    )
    try:
        with open(capture, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError as exc:
        print(f"capture write failed ({exc}); full JSON follows")
        print(json.dumps(full))
    summary = {
        k: full[k]
        for k in ("metric", "value", "unit", "vs_baseline", "p50_batch_ms",
                  "device_batch", "mfu", "weights", "platform")
    }
    if pipe:
        summary["e2e_steady_fps"] = pipe.get("steady_agg_fps")
        summary["e2e_p50_ms"] = pipe.get("p50_frame_ms")
        summary["e2e_startup_s"] = pipe.get("startup_s")
        summary["e2e_slo"] = pipe.get("meets_40ms_slo")
    summary["capture"] = capture
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

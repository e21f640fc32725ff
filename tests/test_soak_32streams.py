"""32-stream soak test (opt-in: RVA_SOAK=1).

Runs the full pipeline with 32 synthetic streams through the batcher and
tracker for a bounded wall-clock window and asserts sustained multi-stream
progress. Skipped by default: it is minutes-long and intended for manual /
nightly runs (on the TPU dev tunnel, set RVA_SOAK_SECONDS high enough to
cover the first compile).
"""

import asyncio
import os
import time

import pytest

from realtime_analytics_tpu.config import (
    DetectorConfig,
    KafkaSinkConfig,
    PipelineConfig,
    PrometheusConfig,
    SnapshotConfig,
    StreamConfig,
    TrackerConfig,
)
from realtime_analytics_tpu.pipeline import AnalyticsPipeline

pytestmark = pytest.mark.skipif(
    os.environ.get("RVA_SOAK") != "1",
    reason="soak test: set RVA_SOAK=1 (and optionally RVA_SOAK_SECONDS)",
)


def test_32_stream_soak():
    seconds = float(os.environ.get("RVA_SOAK_SECONDS", "120"))
    streams = [
        StreamConfig(
            name=f"cam-{i:02d}",
            url=f"synthetic://?width=640&height=480&boxes=3&seed={i}",
            warmup_seconds=0.0,
            target_fps=10,
            batch_size=2,
        )
        for i in range(32)
    ]
    cfg = PipelineConfig(
        streams=streams,
        detector=DetectorConfig(
            model_path="__random__.pt",
            confidence_threshold=0.01,
            warmup=False,
            input_size=[640, 640],
            max_batch_size=64,
            # two buckets so cost-aware selection keeps link bytes
            # proportional to the actual packed batch (a single [64]
            # bucket pads every ~13-frame batch to 64 — 4.9x the H2D
            # bytes, which dominates on the tunneled dev chip)
            batch_buckets=[16, 64],
            precision="bf16",
        ),
        tracker=TrackerConfig(min_hits=1, max_iou_distance=0.2),
        kafka=KafkaSinkConfig(enabled=True, transport="memory"),
        prometheus=PrometheusConfig(enabled=False),
        snapshots=SnapshotConfig(enabled=False),
        batch_window_ms=6,
    )
    pipeline = AnalyticsPipeline(cfg)

    # Sample cumulative batcher counters every 10 s so the artifact can
    # separate the first-compile window (~minutes through the dev tunnel)
    # from the sustained steady state the soak actually proves.
    samples = []

    async def _run_and_sample():
        run = asyncio.ensure_future(pipeline.run_for(seconds))
        t0 = time.monotonic()
        while not run.done():
            await asyncio.wait([run], timeout=10)
            st = pipeline.batchers["__default__"].stats
            samples.append(
                (time.monotonic() - t0, st.frames, st.batches,
                 st.sum_infer_ms, st.shed)
            )
        await run

    asyncio.run(_run_and_sample())

    stats = pipeline.batchers["__default__"].stats
    assert stats.frames > 0, "no frames processed — compile window too short?"
    streams_seen = {p["stream"] for p in pipeline.kafka.memory_buffer}
    assert len(streams_seen) == 32, f"only {len(streams_seen)} streams progressed"
    assert stats.avg_batch_size > 4, (
        f"cross-stream batching ineffective: avg {stats.avg_batch_size}"
    )
    print(
        f"\nsoak: {stats.frames} frames, avg_batch={stats.avg_batch_size:.1f}, "
        f"max_batch={stats.max_batch_size}, avg_infer={stats.avg_infer_ms:.1f} ms"
    )
    # steady state: deltas over the second half of the sample trail
    if len(samples) >= 4:
        a, b = samples[len(samples) // 2], samples[-1]
        dt, df, dbatch = b[0] - a[0], b[1] - a[1], b[2] - a[2]
        dinfer, dshed = b[3] - a[3], b[4] - a[4]
        if dbatch > 0 and dt > 0:
            print(
                f"steady (last {dt:.0f}s of {b[0]:.0f}s): "
                f"{df} frames ({df / dt:.1f} fps agg), "
                f"{dbatch} batches, avg_batch={df / dbatch:.1f}, "
                f"avg_infer={dinfer / dbatch:.1f} ms, shed={dshed}"
            )

"""32-stream soak test (opt-in: RVA_SOAK=1).

Runs the full pipeline with 32 synthetic streams through the batcher and
tracker for a bounded wall-clock window and asserts sustained multi-stream
progress. Skipped by default: it is minutes-long and intended for manual /
nightly runs (on the TPU dev tunnel, set RVA_SOAK_SECONDS high enough to
cover the first compile).
"""

import asyncio
import os

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
            batch_buckets=[64],
            precision="bf16",
        ),
        tracker=TrackerConfig(min_hits=1, max_iou_distance=0.2),
        kafka=KafkaSinkConfig(enabled=True, transport="memory"),
        prometheus=PrometheusConfig(enabled=False),
        snapshots=SnapshotConfig(enabled=False),
        batch_window_ms=6,
    )
    pipeline = AnalyticsPipeline(cfg)
    asyncio.run(pipeline.run_for(seconds))

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

"""File-source ingestion through the real cv2/FFmpeg decode path — the
reference's primary smoke-test mode (file URL in pipeline-sim.yaml)."""

import asyncio

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from realtime_analytics_tpu.config import StreamConfig
from realtime_analytics_tpu.ingest.synthetic import SyntheticSource
from realtime_analytics_tpu.ingest.video_stream import VideoStream


@pytest.fixture(scope="module")
def demo_video(tmp_path_factory):
    """Render a small deterministic mp4 from the synthetic source."""
    path = tmp_path_factory.mktemp("samples") / "demo.mp4"
    src = SyntheticSource(width=320, height=240, boxes=2, seed=5)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 15.0, (320, 240)
    )
    assert writer.isOpened(), "cv2 VideoWriter unavailable"
    for _ in range(30):
        ok, frame = src.read()
        writer.write(frame)
    writer.release()
    return path


def test_video_file_plays_through_stream(demo_video):
    async def run():
        cfg = StreamConfig(
            name="file", url=str(demo_video), warmup_seconds=0, max_retries=0
        )
        frames = []
        async with VideoStream(cfg) as vs:
            async for pkt in vs.frames():
                frames.append(pkt)
        return frames

    frames = asyncio.run(run())
    assert len(frames) == 30
    assert frames[0].frame.shape == (240, 320, 3)
    assert frames[0].frame.dtype == np.uint8
    assert [p.frame_id for p in frames] == list(range(30))
    # content survived encoding: bright boxes on dark background
    assert frames[0].frame.max() > 100
    assert frames[0].frame.min() < 60


def test_file_pipeline_end_to_end(demo_video):
    from realtime_analytics_tpu.config import (
        DetectorConfig,
        KafkaSinkConfig,
        PipelineConfig,
        PrometheusConfig,
        SnapshotConfig,
    )
    from realtime_analytics_tpu.pipeline import AnalyticsPipeline

    cfg = PipelineConfig(
        streams=[
            StreamConfig(
                name="file-cam", url=str(demo_video), warmup_seconds=0,
                max_retries=0, target_fps=60,
            )
        ],
        detector=DetectorConfig(
            model_path="__random__.pt", confidence_threshold=0.01,
            warmup=False, input_size=[128, 128], max_batch_size=2,
            batch_buckets=[2], precision="fp32", pre_nms_topk=128,
        ),
        kafka=KafkaSinkConfig(enabled=True, transport="memory"),
        prometheus=PrometheusConfig(enabled=False),
        snapshots=SnapshotConfig(enabled=False),
    )
    pipeline = AnalyticsPipeline(cfg)
    asyncio.run(pipeline.run_for(120.0))
    assert pipeline.kafka.messages_sent > 0
    assert pipeline.kafka.memory_buffer[0]["stream"] == "file-cam"

"""End-to-end: the real pipeline serving from a .rvae artifact.

The drives in docs verified this interactively; this test pins it in CI —
config routes ``model_path: *.rvae`` through create_detector to
ExportedYoloEngine, the pipeline warms it from the artifact's programs,
and frames flow batcher -> exported program -> tracker -> memory sink.
"""

import asyncio

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
from realtime_analytics_tpu.engine.detector import JaxYoloEngine
from realtime_analytics_tpu.engine.export import export_serving_artifact
from realtime_analytics_tpu.pipeline import AnalyticsPipeline

INPUT = 64
SRC = (192, 192)  # 3x pick geometry


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = DetectorConfig(
        model_path="missing_yolov8n.pt", model_type="yolov8",
        input_size=[INPUT, INPUT], batch_buckets=[1, 2], max_batch_size=2,
        confidence_threshold=0.01, warmup=False,
    )
    path = str(tmp_path_factory.mktemp("rvae") / "pipe.rvae")
    export_serving_artifact(JaxYoloEngine(cfg), path, src_hws=[SRC])
    return path


def test_pipeline_serves_from_artifact(artifact):
    cfg = PipelineConfig(
        streams=[
            StreamConfig(
                name=f"cam-{i}",
                url=(
                    f"synthetic://?width={SRC[1]}&height={SRC[0]}"
                    f"&boxes=2&seed={i}&frames=10"
                ),
                target_fps=30,
                warmup_seconds=0.0,
            )
            for i in range(2)
        ],
        detector=DetectorConfig(
            model_path=artifact, model_type="yolov8",
            input_size=[INPUT, INPUT], confidence_threshold=0.01,
            warmup=True,
        ),
        tracker=TrackerConfig(),
        kafka=KafkaSinkConfig(enabled=True, transport="memory"),
        prometheus=PrometheusConfig(enabled=False),
        snapshots=SnapshotConfig(enabled=False),
        stats_interval_seconds=3600,
    )
    pipeline = AnalyticsPipeline(cfg)
    asyncio.run(pipeline.run_for(30.0))  # finite sources: ends well before

    frames = sum(w.health.total_frames for w in pipeline.workers)
    assert frames == 20  # 2 streams x 10 frames, none dropped
    from realtime_analytics_tpu.engine.export import ExportedYoloEngine

    det = pipeline.detectors["__default__"]
    assert isinstance(det, ExportedYoloEngine)
    st = pipeline.batchers["__default__"].stats
    assert st.frames == 20 and st.batches > 0
    # every processed frame published a payload through the memory sink
    assert pipeline.kafka.messages_sent == 20


def test_pipeline_serves_temporal_artifact(tmp_path):
    # the batcher routes temporal engines through the clip-coalescing path
    # (buffer_packet/predict_clips) — distinct from the frame path above
    from realtime_analytics_tpu.engine.export import ExportedTemporalEngine
    from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine

    det = DetectorConfig(
        model_path="cnnlstm-missing.npz", model_type="cnn_lstm",
        input_size=[32, 32], sequence_length=4, sequence_stride=1,
        temporal_overlap=0.0, num_action_classes=8,
        confidence_threshold=1e-6,
        batch_buckets=[1], max_batch_size=1, warmup=False,
    )
    path = str(tmp_path / "t.rvae")
    export_serving_artifact(JaxTemporalEngine(det), path, src_hws=[(32, 32)])

    cfg = PipelineConfig(
        streams=[
            StreamConfig(
                name="cam-0",
                url="synthetic://?width=32&height=32&boxes=1&frames=9",
                target_fps=30,
                warmup_seconds=0.0,
            )
        ],
        detector=DetectorConfig(
            model_path=path, model_type="cnn_lstm", input_size=[32, 32],
            sequence_length=4, sequence_stride=1, temporal_overlap=0.0,
            num_action_classes=8, confidence_threshold=1e-6, warmup=True,
            warmup_source_hw=[32, 32],
        ),
        tracker=TrackerConfig(),
        kafka=KafkaSinkConfig(enabled=True, transport="memory"),
        prometheus=PrometheusConfig(enabled=False),
        snapshots=SnapshotConfig(enabled=False),
        stats_interval_seconds=3600,
        # route through the batcher's clip-coalescing path (window 0 buffers
        # inline via predict_packets and does not tick the clip counters)
        temporal_clip_window_ms=5,
    )
    pipeline = AnalyticsPipeline(cfg)
    asyncio.run(pipeline.run_for(30.0))

    assert isinstance(pipeline.detectors["__default__"], ExportedTemporalEngine)
    st = pipeline.batchers["__default__"].stats
    assert st.frames == 9
    # 9 frames, seq_len 4, overlap step 4 -> clips complete at frames 4 and 8
    assert st.clips == 2

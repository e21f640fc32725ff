"""End-to-end pipeline test: synthetic streams -> batched JAX engine ->
tracker -> memory sink. The analog of the reference's pipeline-sim.yaml
smoke test (self-contained, no external services)."""

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
from realtime_analytics_tpu.pipeline import AnalyticsPipeline


def make_config(n_streams=2, frames=12, **det_kw):
    det = DetectorConfig(
        model_path="__random__.pt",
        confidence_threshold=0.005,
        warmup=False,
        input_size=[128, 128],
        max_batch_size=4,
        batch_buckets=[4],  # single bucket -> exactly one compile in CI
        pre_nms_topk=256,
        precision="fp32",
        **det_kw,
    )
    streams = [
        StreamConfig(
            name=f"cam-{i}",
            url=f"synthetic://?width=160&height=120&frames={frames}&seed={i}",
            warmup_seconds=0.0,
            target_fps=60,
            max_retries=0,
            batch_size=4,
        )
        for i in range(n_streams)
    ]
    return PipelineConfig(
        streams=streams,
        detector=det,
        tracker=TrackerConfig(min_hits=1, max_iou_distance=0.1),
        kafka=KafkaSinkConfig(enabled=True, transport="memory"),
        prometheus=PrometheusConfig(enabled=False),
        snapshots=SnapshotConfig(enabled=False),
        stats_interval_seconds=30,
        batch_window_ms=10,
    )


def test_pipeline_end_to_end():
    cfg = make_config(n_streams=3, frames=10)
    pipeline = AnalyticsPipeline(cfg)
    asyncio.run(pipeline.run_for(180.0))

    sink = pipeline.kafka
    assert sink.messages_sent > 0
    payloads = sink.memory_buffer
    streams_seen = {p["stream"] for p in payloads}
    assert streams_seen == {"cam-0", "cam-1", "cam-2"}
    # payload wire format (reference kafka_sink.py:127-132)
    p = payloads[0]
    assert set(p.keys()) >= {"stream", "frame_id", "tracks", "is_temporal"}
    for t in p["tracks"]:
        assert set(t.keys()) >= {"track_id", "class_id", "confidence", "bbox_xyxy"}
    # cross-stream batching actually happened
    batcher = pipeline.batchers["__default__"]
    assert batcher.stats.frames >= 15
    assert batcher.stats.max_batch_size >= 2


def test_pipeline_roi_and_downsample_run():
    cfg = make_config(n_streams=1, frames=6)
    cfg.streams[0].roi_polygons = [[(0, 0), (159, 0), (159, 119), (0, 119)]]
    cfg.streams[0].downsample_ratio = 0.5
    cfg.streams[0].motion_filter = True
    cfg.streams[0].motion_threshold = 0.0  # always passes
    pipeline = AnalyticsPipeline(cfg)
    asyncio.run(pipeline.run_for(180.0))
    assert pipeline.kafka.messages_sent > 0
    # detections were rescaled back to original frame coords
    for p in pipeline.kafka.memory_buffer:
        for t in p["tracks"]:
            x1, y1, x2, y2 = t["bbox_xyxy"]
            assert x2 <= 160.01 and y2 <= 120.01


def test_pipeline_temporal_detector_id_routing():
    cfg = make_config(n_streams=1, frames=14)
    cfg.detectors = {
        "temporal": DetectorConfig(
            model_path="t.npz", model_type="cnn_lstm", backend="onnx",
            sequence_length=3, sequence_stride=1, temporal_overlap=0.0,
            num_action_classes=5, confidence_threshold=1e-6,
            input_size=[48, 48], precision="fp32",
            action_classes=["a", "b", "c", "d", "e"],
        )
    }
    cfg.streams[0].detector_id = "temporal"
    cfg.validate()
    pipeline = AnalyticsPipeline(cfg)
    asyncio.run(pipeline.run_for(180.0))
    temporal_payloads = [
        p for p in pipeline.kafka.memory_buffer if p["is_temporal"]
    ]
    assert temporal_payloads, "no temporal clip results reached the sink"
    t = temporal_payloads[0]["tracks"][0]
    assert "action_label" in t and "temporal_score" in t
    assert "sequence_start_frame" in t and "sequence_end_frame" in t

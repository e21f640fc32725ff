"""Out-of-the-box demo fixture (r3 VERDICT missing #2): the reference ships
``data/samples/demo.mp4`` (its universal fixture for pipeline-local.yaml /
pipeline-sim.yaml); this repo commits one too, so a fresh clone's
``realtime-analytics --config config/pipeline-local.yaml`` finds its input
like the reference does. These tests pin the committed file's integrity,
the configs' references to it, and an end-to-end serve from the file path
(the RTSP/ffmpeg-simulator hop needs an ffmpeg binary, absent in CI — the
file decode path is the same cv2 ingest the simulator output takes).
"""

import asyncio
import os

import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "data", "samples", "demo.mp4")


def test_demo_fixture_committed_and_decodable():
    assert os.path.exists(DEMO), (
        "data/samples/demo.mp4 must ship in the tree (reference parity); "
        "regenerate with scripts.make_demo_video"
    )
    assert os.path.getsize(DEMO) < 2_000_000  # stays a small git asset
    cap = cv2.VideoCapture(DEMO)
    assert cap.isOpened()
    n = 0
    shape = None
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        shape = frame.shape
        n += 1
    cap.release()
    assert n >= 25, f"demo.mp4 decoded only {n} frames"
    assert shape is not None and shape[2] == 3


@pytest.mark.parametrize(
    "cfg_name", ["pipeline-local.yaml", "sample-pipeline.yaml"]
)
def test_configs_point_at_existing_demo_input(cfg_name):
    from realtime_analytics_tpu.config import load_config

    cfg = load_config(os.path.join(REPO, "config", cfg_name))
    inputs = {
        s.ffmpeg_simulator.input
        for s in cfg.streams
        if s.ffmpeg_simulator is not None
    }
    for rel in inputs:
        assert os.path.exists(os.path.join(REPO, rel)), (
            f"{cfg_name} references missing fixture {rel}"
        )


def test_pipeline_serves_frames_from_committed_demo(tmp_path):
    """End-to-end: the real pipeline (file ingest -> batcher -> tracker ->
    sink) serves frames straight from the committed fixture."""
    from realtime_analytics_tpu import pipeline as pipeline_mod
    from realtime_analytics_tpu.config import (
        DetectorConfig,
        KafkaSinkConfig,
        PipelineConfig,
        PrometheusConfig,
        SnapshotConfig,
        StreamConfig,
        TrackerConfig,
    )
    from realtime_analytics_tpu.types import Detection

    class TinyEngine:
        """Stand-in device step: full YOLO engines are exercised by
        test_pipeline_e2e; this test is about the fixture path."""

        config = DetectorConfig(model_path="x.pt", warmup=False)

        def predict_packets(self, packets):
            return [
                [Detection(p.stream.name, p.frame_id, 0, 0.9,
                           (10.0, 10.0, 60.0, 60.0))]
                for p in packets
            ]

    cfg = PipelineConfig(
        streams=[
            StreamConfig(
                name="demo", url=DEMO, target_fps=60,
                warmup_seconds=0.0, max_retries=1,
            )
        ],
        detector=TinyEngine.config,
        tracker=TrackerConfig(),
        kafka=KafkaSinkConfig(enabled=True, transport="memory"),
        prometheus=PrometheusConfig(enabled=False),
        snapshots=SnapshotConfig(enabled=False),
        stats_interval_seconds=3600,
    )
    pipeline = pipeline_mod.AnalyticsPipeline(cfg)
    real_create = pipeline_mod.create_detector
    pipeline_mod.create_detector = lambda c: TinyEngine()
    try:
        asyncio.run(pipeline.run_for(20.0))
    finally:
        pipeline_mod.create_detector = real_create
    frames = sum(w.health.total_frames for w in pipeline.workers)
    assert frames >= 25, f"pipeline served only {frames} fixture frames"
    sink = pipeline.kafka
    assert sink.memory_buffer, "no events reached the sink"
    assert sink.memory_buffer[0]["stream"] == "demo"

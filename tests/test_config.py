"""Config system tests: reference-schema compatibility + validation."""

import textwrap

import pytest

from realtime_analytics_tpu.config import (
    ConfigError,
    DetectorConfig,
    PipelineConfig,
    StreamConfig,
    load_config,
)

REFERENCE_STYLE_YAML = textwrap.dedent(
    """
    max_concurrent_streams: 4
    stats_interval_seconds: 10

    streams:
      - name: sim-1
        url: /data/samples/demo.mp4
        enabled: true
        target_fps: 12
        batch_size: 2
        warmup_seconds: 0.5
        reconnect_backoff: 2.0
        roi_polygons:
          - [[0, 0], [100, 0], [100, 100], [0, 100]]
        motion_filter: true
        motion_threshold: 0.05
        downsample_ratio: 0.5
        adaptive_fps: true
        min_target_fps: 5
        idle_frame_tolerance: 30
        ffmpeg_simulator:
          enabled: false

    detector:
      model_path: models/yolov8n.pt
      device: cpu
      backend: ultralytics
      model_type: yolov8
      confidence_threshold: 0.35
      iou_threshold: 0.5
      half: false
      warmup: false

    detectors:
      temporal:
        model_path: models/cnn_lstm.onnx
        backend: onnxruntime
        model_type: cnn_lstm
        sequence_length: 8
        temporal_overlap: 0.25

    tracker:
      type: byte_track
      max_age: 30
      max_iou_distance: 0.5
      min_hits: 1

    kafka:
      enabled: false
      bootstrap_servers: localhost:9092
      topic: analytics.events
      include_frames: true
      frame_quality: 80

    prometheus:
      enabled: false
      port: 9000
    """
)


def test_reference_yaml_loads(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(REFERENCE_STYLE_YAML)
    cfg = load_config(p)
    assert cfg.max_concurrent_streams == 4
    assert len(cfg.streams) == 1
    s = cfg.streams[0]
    assert s.name == "sim-1"
    assert s.target_fps == 12
    assert s.motion_filter and s.motion_threshold == 0.05
    assert s.downsample_ratio == 0.5
    assert s.adaptive_fps and s.min_target_fps == 5
    assert s.ffmpeg_simulator is not None and not s.ffmpeg_simulator.enabled
    assert cfg.detector.confidence_threshold == 0.35
    assert cfg.detector.backend == "ultralytics"  # accepted, maps to JAX engine
    assert "temporal" in cfg.detectors
    assert cfg.detectors["temporal"].model_type == "cnn_lstm"
    assert cfg.detectors["temporal"].sequence_length == 8
    assert cfg.tracker.max_iou_distance == 0.5
    assert cfg.kafka.topic == "analytics.events"
    assert cfg.kafka.frame_quality == 80
    assert not cfg.prometheus.enabled


def test_unknown_keys_warn_not_crash(tmp_path, caplog):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        textwrap.dedent(
            """
            max_frame_rate_per_stream: 30
            streams:
              - name: a
                url: file:///x.mp4
                not_a_real_key: 1
            """
        )
    )
    with caplog.at_level("WARNING"):
        cfg = load_config(p)
    assert cfg.streams[0].name == "a"
    text = caplog.text
    assert "max_frame_rate_per_stream" in text
    assert "not_a_real_key" in text


@pytest.mark.parametrize(
    "mutation, message",
    [
        (dict(name=""), "name"),
        (dict(url=""), "url"),
        (dict(batch_size=0), "batch_size"),
        (dict(target_fps=-1), "target_fps"),
        (dict(downsample_ratio=0.01), "downsample_ratio"),
        (dict(adaptive_fps=True, min_target_fps=0), "min_target_fps"),
        (dict(roi_polygons=[[(0, 0), (1, 1)]]), "ROI"),
    ],
)
def test_stream_validation(mutation, message):
    base = dict(name="s", url="rtsp://h/p")
    base.update(mutation)
    with pytest.raises(ConfigError, match=message):
        StreamConfig(**base).validate()


@pytest.mark.parametrize(
    "mutation",
    [
        dict(backend="not_real"),
        dict(model_type="not_real"),
        dict(confidence_threshold=0.0),
        dict(iou_threshold=1.5),
        dict(input_size=[640]),
        dict(model_type="cnn_lstm", sequence_length=0),
        dict(model_type="cnn_lstm", temporal_overlap=1.0),
        dict(model_type="cnn_lstm", temporal_pooling="bogus"),
        dict(model_type="resnet", resnet_top_k=0),
        dict(precision="fp64"),
        dict(max_detections=0),
    ],
)
def test_detector_validation(mutation):
    with pytest.raises(ConfigError):
        DetectorConfig(**mutation).validate()


def test_detector_resolved_defaults():
    assert DetectorConfig().resolved_input_size == (640, 640)
    assert DetectorConfig(model_type="resnet").resolved_input_size == (224, 224)
    assert DetectorConfig(model_type="3d_cnn").resolved_input_size == (112, 112)
    assert DetectorConfig(max_batch_size=32).resolved_buckets == [1, 2, 4, 8, 16, 32]
    assert DetectorConfig(max_batch_size=12).resolved_buckets == [1, 2, 4, 8, 12]


def test_pipeline_cross_checks():
    cfg = PipelineConfig(streams=[StreamConfig(name="a", url="u", detector_id="nope")])
    with pytest.raises(ConfigError, match="detector_id"):
        cfg.validate()

    cfg = PipelineConfig(
        streams=[StreamConfig(name="a", url="u"), StreamConfig(name="a", url="v")]
    )
    with pytest.raises(ConfigError, match="unique"):
        cfg.validate()

    cfg = PipelineConfig(
        streams=[StreamConfig(name=f"s{i}", url="u") for i in range(3)],
        max_concurrent_streams=2,
    )
    with pytest.raises(ConfigError, match="max_concurrent_streams"):
        cfg.validate()


def test_ffmpeg_simulator_requires_rtsp():
    s = StreamConfig(
        name="cam",
        url="rtmp://host/live",
        ffmpeg_simulator={"enabled": True, "input": "demo.mp4"},
    )
    with pytest.raises(ConfigError, match="RTSP"):
        s.validate()


def test_shipped_config_corpus_loads():
    """Every YAML under config/ must load and validate (the reference ships
    a bit-rotted demo-config.yaml — reference config.py:78 splat crash;
    this gate keeps ours honest)."""
    from pathlib import Path

    from realtime_analytics_tpu.config import load_config

    corpus = sorted(
        (Path(__file__).parent.parent / "config").glob("*.yaml")
    )
    assert len(corpus) >= 7, f"expected a full config corpus, got {corpus}"
    for path in corpus:
        cfg = load_config(str(path))
        assert cfg.streams, f"{path.name}: no streams"


def test_detector_rejects_nonpositive_input_size():
    with pytest.raises(ConfigError, match="positive"):
        DetectorConfig(input_size=[0, 0]).validate()
    with pytest.raises(ConfigError, match="positive"):
        DetectorConfig(input_size=[-64, 640]).validate()


def test_detector_rejects_buckets_below_max_batch():
    with pytest.raises(ConfigError, match="max_batch_size"):
        DetectorConfig(batch_buckets=[4, 8], max_batch_size=32).validate()


def test_detector_rejects_degenerate_scalars():
    with pytest.raises(ConfigError, match="num_classes"):
        DetectorConfig(num_classes=0).validate()
    with pytest.raises(ConfigError, match="pre_nms_topk"):
        DetectorConfig(pre_nms_topk=0).validate()
    with pytest.raises(ConfigError, match="warmup_source_hw"):
        DetectorConfig(warmup_source_hw=[1080]).validate()


def test_stream_rejects_scalar_ffmpeg_simulator():
    with pytest.raises(ConfigError, match="must be a mapping"):
        StreamConfig(name="s", url="rtsp://x", ffmpeg_simulator="yes")

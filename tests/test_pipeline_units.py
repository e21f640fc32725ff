"""Unit tests for scheduler, health scoring, and adaptive-FPS state."""

import time

from realtime_analytics_tpu.pipeline import StreamHealth, StreamScheduler


def test_health_score_decays_with_errors():
    h = StreamHealth("s")
    h.update_success(0.01)
    healthy = h.health_score
    assert healthy > 0.9
    for _ in range(4):
        h.update_error()
    assert h.health_score < healthy / 4  # 1/(1+4) error penalty


def test_health_score_decays_with_staleness(monkeypatch):
    h = StreamHealth("s")
    h.update_success(0.01)
    real_time = time.time
    monkeypatch.setattr(time, "time", lambda: real_time() + 30)
    assert 0.3 < h.health_score < 0.7  # ~half the 60 s recency window


def test_health_rolling_processing_window():
    h = StreamHealth("s")
    for i in range(150):
        h.update_success(0.01 if i < 100 else 0.05)
    assert len(h.recent_processing_times) == 100
    assert 0.01 < h.avg_processing_time <= 0.05
    assert h.total_frames == 150


def test_scheduler_priority_ranking():
    sched = StreamScheduler()
    good = StreamHealth("good", priority=0)
    good.update_success(0.005)
    bad = StreamHealth("bad", priority=0)
    bad.update_error()
    bad.update_error()
    vip = StreamHealth("vip", priority=1)
    vip.update_success(0.005)
    for h in (good, bad, vip):
        sched.register(h)
    assert sched.priority_score("vip") > sched.priority_score("good")
    assert sched.priority_score("good") > sched.priority_score("bad")
    lines = sched.status_lines()
    assert "vip" in lines[1]  # top-ranked


def test_scheduler_load_factor_and_recommendations():
    sched = StreamScheduler()
    h = StreamHealth("s")
    h.update_success(0.005)
    sched.register(h)
    # light load -> "increase"
    for _ in range(30):
        sched.record_processing_time(0.005)
    assert sched.get_system_load_factor() < 0.5
    assert sched.recommend_adaptive_adjustment("s") == "increase"
    # heavy load -> "decrease"
    for _ in range(60):
        sched.record_processing_time(0.08)
    assert sched.get_system_load_factor() > 1.5
    assert sched.recommend_adaptive_adjustment("s") == "decrease"
    # unknown stream -> None
    assert sched.recommend_adaptive_adjustment("nope") is None


def test_scheduler_errors_trigger_decrease():
    sched = StreamScheduler()
    h = StreamHealth("s")
    for _ in range(5):
        h.update_error()
    sched.register(h)
    sched.record_processing_time(0.01)
    assert sched.recommend_adaptive_adjustment("s") == "decrease"


def test_every_engine_supports_warmup():
    """`detector.warmup: true` must pre-compile EVERY engine family — the
    reference warms all its backends (detector.py:131-140, 938-943,
    temporal_detector.py:231-249); round 1 only warmed YOLO."""
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import (
        JaxResNetEngine,
        JaxYoloEngine,
    )
    from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine

    yolo = JaxYoloEngine(DetectorConfig(
        model_path="__random__.pt", warmup=False, input_size=[64, 64],
        max_batch_size=1, batch_buckets=[1], precision="fp32",
        pre_nms_topk=64, max_detections=8,
    ))
    yolo.warmup((96, 96))
    assert any(k[0] == 1 for k in yolo._steps)

    resnet = JaxResNetEngine(DetectorConfig(
        model_path="resnet18.pt", model_type="resnet", backend="onnx",
        resnet_num_classes=10, input_size=[64, 64], precision="fp32",
        max_batch_size=1, batch_buckets=[1],
    ))
    resnet.warmup((96, 96))
    assert (1, 96, 96) in resnet._steps

    temporal = JaxTemporalEngine(DetectorConfig(
        model_path="t.npz", model_type="cnn_lstm", backend="onnx",
        sequence_length=2, num_action_classes=5, input_size=[32, 32],
        precision="fp32", max_batch_size=1, batch_buckets=[1],
    ))
    temporal.warmup((48, 48))
    assert (1, 48, 48) in temporal._steps

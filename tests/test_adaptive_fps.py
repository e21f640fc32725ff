"""Adaptive frame-skipping state machine (worker-level)."""

from realtime_analytics_tpu.config import (
    DetectorConfig,
    KafkaSinkConfig,
    PipelineConfig,
    PrometheusConfig,
    SnapshotConfig,
    StreamConfig,
)
from realtime_analytics_tpu.pipeline import (
    StreamHealth,
    StreamScheduler,
    StreamWorker,
)
from realtime_analytics_tpu.sinks.kafka_sink import KafkaSink
from realtime_analytics_tpu.telemetry.metrics import MetricsPublisher
from realtime_analytics_tpu.tracker import IouTracker
from realtime_analytics_tpu.config import TrackerConfig


def make_worker(stream_kwargs):
    stream = StreamConfig(name="s", url="synthetic://", **stream_kwargs)
    pconf = PipelineConfig(
        streams=[stream],
        detector=DetectorConfig(warmup=False),
        kafka=KafkaSinkConfig(enabled=False),
        prometheus=PrometheusConfig(enabled=False),
        snapshots=SnapshotConfig(enabled=False),
    )
    sched = StreamScheduler()
    health = StreamHealth("s")
    sched.register(health)
    return StreamWorker(
        stream=stream,
        batcher=None,  # not exercised by these tests
        detector=None,
        tracker=IouTracker(TrackerConfig()),
        kafka=KafkaSink(KafkaSinkConfig(enabled=False)),
        metrics=MetricsPublisher(PrometheusConfig(enabled=False)),
        health=health,
        scheduler=sched,
        pipeline_config=pconf,
    )


def test_idle_tolerance_triggers_skipping():
    w = make_worker(dict(adaptive_fps=True, target_fps=30, min_target_fps=6,
                         idle_frame_tolerance=3))
    assert w._max_process_every == 5  # round(30/6)
    for _ in range(2):
        w._adjust_adaptive_state(0)
    assert w._process_every == 1  # below tolerance
    w._adjust_adaptive_state(0)  # third idle frame
    assert w._process_every == 5


def test_activity_resets_skipping():
    w = make_worker(dict(adaptive_fps=True, target_fps=30, min_target_fps=6,
                         idle_frame_tolerance=1))
    w._adjust_adaptive_state(0)
    assert w._process_every > 1
    w._adjust_adaptive_state(3)  # detections appear
    assert w._process_every == 1
    assert w._idle_frames == 0


def test_disabled_adaptive_never_skips():
    w = make_worker(dict(adaptive_fps=False, target_fps=30))
    for _ in range(100):
        w._adjust_adaptive_state(0)
    assert w._process_every == 1


def test_live_tracks_keep_full_rate():
    """Reference contract: detections OR active tracks count as activity
    (reference pipeline.py:242-246), so streams don't throttle while tracks
    are still alive."""
    w = make_worker(dict(adaptive_fps=True, target_fps=30, min_target_fps=6,
                         idle_frame_tolerance=1))
    for _ in range(5):
        w._adjust_adaptive_state(0, num_tracks=2)
    assert w._process_every == 1
    assert w._idle_frames == 0
    w._adjust_adaptive_state(0, num_tracks=0)
    w._adjust_adaptive_state(0, num_tracks=0)
    assert w._process_every > 1


def test_skip_frame_ticks_adaptive_idle_state():
    """_skip_frame must feed the adaptive state machine like the reference
    (pipeline.py:222 calls _adjust_adaptive_state from the skip path)."""
    import asyncio

    w = make_worker(dict(adaptive_fps=True, target_fps=30, min_target_fps=6,
                         idle_frame_tolerance=2))

    class _Pkt:
        frame_id = 0
        frame = None

    async def run():
        for _ in range(2):
            await w._skip_frame(_Pkt())

    asyncio.run(run())
    assert w._idle_frames == 2
    assert w._process_every == w._max_process_every


def test_scheduler_decrease_hint_escalates_skipping():
    w = make_worker(dict(adaptive_fps=True, target_fps=30, min_target_fps=5,
                         idle_frame_tolerance=1000))
    # heavy load -> scheduler recommends decrease even before idle tolerance
    for _ in range(60):
        w.scheduler.record_processing_time(0.08)
    w._adjust_adaptive_state(0)
    assert w._process_every >= 2  # live wiring of the reference's dead API


def test_tracker_ema_ignores_empty_skip_updates():
    # review r4: skip-frames call _tracker_update([]) — those cheap aging
    # updates must not decay the inline/offload EMA, or a slow tracker
    # (byte_track_full on crowded scenes) periodically runs inline and
    # stalls every stream's completions
    import asyncio
    import time as _time

    w = make_worker(dict(target_fps=30))
    w._track_ema_ms = 5.0  # a measured-slow tracker

    real_update = w.tracker.update
    calls = []

    def slow_update(name, dets):
        calls.append(len(dets))
        return real_update(name, dets)

    w.tracker.update = slow_update

    async def drive():
        # 50 empty skip updates: EMA must not move
        for _ in range(50):
            await w._tracker_update([])
        assert w._track_ema_ms == 5.0
        # a real update still goes through the gate (offloaded) and
        # feeds the EMA
        from realtime_analytics_tpu.types import Detection

        det = Detection("s", 1, 0, 0.9, (0.0, 0.0, 10.0, 10.0))
        await w._tracker_update([det])
        assert w._track_ema_ms != 5.0

    asyncio.run(drive())
    assert calls.count(0) == 50

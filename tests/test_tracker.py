"""Tracker lifecycle tests against the reference's documented semantics."""

import numpy as np

from realtime_analytics_tpu.config import TrackerConfig
from realtime_analytics_tpu.tracker import IouTracker
from realtime_analytics_tpu.types import Detection, TemporalDetection


def det(stream="s", frame_id=0, cls=0, conf=0.9, box=(0, 0, 10, 10)):
    return Detection(stream, frame_id, cls, conf, box)


def test_new_tracks_get_global_monotonic_ids():
    tr = IouTracker(TrackerConfig(min_hits=1))
    t1 = tr.update("a", [det(box=(0, 0, 10, 10))])
    t2 = tr.update("b", [det(box=(0, 0, 10, 10))])
    assert t1[0].track_id == 1
    assert t2[0].track_id == 2  # ids unique across streams


def test_match_updates_track():
    tr = IouTracker(TrackerConfig(min_hits=1, max_iou_distance=0.3))
    tr.update("s", [det(box=(0, 0, 100, 100))])
    tracks = tr.update("s", [det(box=(5, 5, 105, 105), conf=0.7)])
    assert len(tracks) == 1
    t = tracks[0]
    assert t.hits == 2 and t.age == 0
    assert t.confidence == 0.7
    assert t.bbox_xyxy == (5, 5, 105, 105)


def test_class_gating_creates_new_track():
    tr = IouTracker(TrackerConfig(min_hits=1))
    tr.update("s", [det(cls=0, box=(0, 0, 100, 100))])
    tracks = tr.update("s", [det(cls=1, box=(0, 0, 100, 100))])
    assert len(tracks) == 2  # same box, different class -> no match


def test_unmatched_tracks_age_and_drop():
    cfg = TrackerConfig(max_age=2, min_hits=1)
    tr = IouTracker(cfg)
    tr.update("s", [det(box=(0, 0, 100, 100))])
    for _ in range(2):
        tracks = tr.update("s", [])
        assert len(tracks) == 1  # aging but alive
    tracks = tr.update("s", [])
    assert tracks == []  # age > max_age


def test_min_hits_prunes_one_shot_tracks():
    tr = IouTracker(TrackerConfig(min_hits=3))
    tr.update("s", [det(box=(0, 0, 100, 100))])
    # next update with no detections: hits=1 < min_hits -> dropped
    assert tr.update("s", []) == []


def test_same_frame_rematch_of_new_track():
    # Reference quirk: the second identical detection in one update matches
    # the track the first one just created (tracker.py searches the growing
    # dict), yielding ONE track with hits=2.
    tr = IouTracker(TrackerConfig(min_hits=1, max_iou_distance=0.5))
    tracks = tr.update("s", [det(box=(0, 0, 100, 100)), det(box=(0, 0, 100, 100))])
    assert len(tracks) == 1
    assert tracks[0].hits == 2


def test_returns_all_live_tracks_not_only_matched():
    tr = IouTracker(TrackerConfig(max_age=10, min_hits=1))
    tr.update("s", [det(box=(0, 0, 50, 50))])
    tracks = tr.update("s", [det(box=(500, 500, 600, 600))])
    assert len(tracks) == 2


def test_streams_are_isolated():
    tr = IouTracker(TrackerConfig(min_hits=1))
    tr.update("a", [det(box=(0, 0, 50, 50))])
    tracks_b = tr.update("b", [])
    assert tracks_b == []
    tr.reset_stream("a")
    assert tr.update("a", []) == []


def test_temporal_fields_pass_through():
    tr = IouTracker(TrackerConfig(min_hits=1))
    d = TemporalDetection(
        "s", 10, 2, 0.8, (0, 0, 10, 10),
        action_label="running", temporal_score=0.77,
        sequence_start_frame=3, sequence_end_frame=10,
    )
    tracks = tr.update("s", [d])
    t = tracks[0]
    assert t.action_label == "running"
    assert t.temporal_score == 0.77
    assert t.sequence_start_frame == 3 and t.sequence_end_frame == 10
    payload = t.as_dict()
    assert payload["action_label"] == "running"


def test_best_iou_wins(rng):
    tr = IouTracker(TrackerConfig(min_hits=1, max_iou_distance=0.1))
    tr.update("s", [det(box=(0, 0, 100, 100)), det(box=(80, 80, 180, 180))])
    # this detection overlaps both, but much more with track 2
    tracks = tr.update("s", [det(box=(75, 75, 175, 175))])
    by_id = {t.track_id: t for t in tracks}
    assert by_id[2].hits == 2
    assert by_id[1].hits == 1


def test_max_tracks_per_stream_bounds_growth():
    """max_tracks_per_stream is a real safety bound: a noisy detector can't
    grow a stream's track set without limit."""
    from realtime_analytics_tpu.config import TrackerConfig
    from realtime_analytics_tpu.tracker import IouTracker
    from realtime_analytics_tpu.types import Detection

    t = IouTracker(TrackerConfig(min_hits=1, max_age=100,
                                 max_tracks_per_stream=5))
    for i in range(20):  # disjoint boxes -> each wants a new track
        t.update("s", [Detection("s", i, 0, 0.9,
                                 (i * 50.0, 0.0, i * 50.0 + 40, 40.0))])
    assert t.active_track_count("s") <= 5

"""Property test: the vectorized tracker must equal a literal implementation
of the reference algorithm (greedy scan over a growing dict) on randomized
multi-frame scenarios."""

import itertools

import numpy as np
import pytest

from realtime_analytics_tpu.config import TrackerConfig
from realtime_analytics_tpu.tracker import IouTracker
from realtime_analytics_tpu.types import Detection


def _iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    area_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


class LiteralReferenceTracker:
    """Direct transcription of the reference algorithm (tracker.py:36-126):
    per-detection scan of the live dict in insertion order, strict-> best,
    same class, iou >= threshold; unmatched age++ then lifecycle cull."""

    def __init__(self, config):
        self.config = config
        self._ids = itertools.count(1)
        self._tracks = {}  # stream -> {tid: [class_id, conf, box, age, hits]}

    def update(self, stream, detections):
        tracks = self._tracks.setdefault(stream, {})
        matched = set()
        for det in detections:
            best_iou, best_tid = 0.0, None
            for tid, t in tracks.items():
                if t[0] != det.class_id:
                    continue
                v = _iou(t[2], det.bbox_xyxy)
                if v >= self.config.max_iou_distance and v > best_iou:
                    best_iou, best_tid = v, tid
            if best_tid is None:
                tid = next(self._ids)
                tracks[tid] = [det.class_id, det.confidence,
                               tuple(det.bbox_xyxy), 0, 1]
                matched.add(tid)
            else:
                t = tracks[best_tid]
                t[1] = det.confidence
                t[2] = tuple(det.bbox_xyxy)
                t[3] = 0
                t[4] += 1
                matched.add(best_tid)
        for tid in list(tracks):
            if tid in matched:
                continue
            tracks[tid][3] += 1
            if (tracks[tid][3] > self.config.max_age
                    or tracks[tid][4] < self.config.min_hits):
                del tracks[tid]
        return {
            tid: (t[0], round(t[1], 6), tuple(round(v, 4) for v in t[2]),
                  t[3], t[4])
            for tid, t in tracks.items()
        }


def _snapshot(tracks):
    return {
        t.track_id: (t.class_id, round(t.confidence, 6),
                     tuple(round(v, 4) for v in t.bbox_xyxy), t.age, t.hits)
        for t in tracks
    }


@pytest.mark.parametrize("seed", range(6))
def test_matches_literal_reference(seed):
    rng = np.random.default_rng(seed)
    cfg_kwargs = dict(
        max_age=int(rng.integers(1, 6)),
        max_iou_distance=float(rng.uniform(0.2, 0.6)),
        min_hits=int(rng.integers(0, 3)),
    )
    ours = IouTracker(TrackerConfig(**cfg_kwargs))
    ref = LiteralReferenceTracker(TrackerConfig(**cfg_kwargs))

    # persistent objects with drift + churn, overlapping boxes, few classes
    anchors = rng.uniform(0, 300, (8, 2))
    for frame in range(40):
        for stream in ("a", "b"):
            n = int(rng.integers(0, 7))
            dets = []
            for _ in range(n):
                k = int(rng.integers(0, len(anchors)))
                x, y = anchors[k] + rng.normal(0, 6, 2)
                w, h = rng.uniform(30, 90, 2)
                dets.append(
                    Detection(stream, frame, int(rng.integers(0, 3)),
                              float(rng.uniform(0.3, 1.0)),
                              (float(x), float(y), float(x + w), float(y + h)))
                )
            got = _snapshot(ours.update(stream, dets))
            exp = ref.update(stream, dets)
            assert got == exp, (
                f"divergence at frame {frame} stream {stream} (seed {seed}):\n"
                f"ours={got}\nref={exp}"
            )

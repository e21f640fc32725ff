"""IOU tracker with vectorized association.

Behavioral contract (reference ``tracker.py:36-147``):
  * one tracker instance is shared by all streams, keyed internally by stream
    name, so track ids are globally unique and monotonically increasing;
  * greedy per-detection matching, same-class only, minimum IoU =
    ``max_iou_distance`` (the reference name says "distance" but the code
    treats it as a minimum IoU — preserved);
  * a detection may match a track created or already matched earlier in the
    same update (the reference searches the live dict as it grows);
  * unmatched tracks age by one per update; a track is dropped when
    ``age > max_age`` or ``hits < min_hits``;
  * ``update`` returns *all* live tracks, not just matched ones.

The per-detection IoU search is vectorized over the track set (the reference
does a pure-Python O(T) scalar loop per detection, tracker.py:97-109).
Temporal fields on TemporalDetections pass through onto tracks.
"""

from __future__ import annotations

import itertools
import threading
from typing import Dict, Iterable, List

import numpy as np

from .config import TrackerConfig
from .types import Detection, Track

_TEMPORAL_FIELDS = (
    "action_label",
    "temporal_score",
    "sequence_start_frame",
    "sequence_end_frame",
)


class _StreamState:
    __slots__ = ("tracks", "boxes", "classes")

    def __init__(self) -> None:
        self.tracks: Dict[int, Track] = {}
        self.boxes = np.zeros((0, 4), dtype=np.float32)
        self.classes = np.zeros((0,), dtype=np.int32)

    def rebuild_arrays(self) -> None:
        if self.tracks:
            self.boxes = np.array(
                [t.bbox_xyxy for t in self.tracks.values()], dtype=np.float32
            )
            self.classes = np.array(
                [t.class_id for t in self.tracks.values()], dtype=np.int32
            )
        else:
            self.boxes = np.zeros((0, 4), dtype=np.float32)
            self.classes = np.zeros((0,), dtype=np.int32)


def _iou_one_to_many(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    if boxes.shape[0] == 0:
        return np.zeros((0,), dtype=np.float32)
    tl = np.maximum(box[:2], boxes[:, :2])
    br = np.minimum(box[2:], boxes[:, 2:])
    inter = np.prod(np.clip(br - tl, 0.0, None), axis=1)
    area_a = max(0.0, box[2] - box[0]) * max(0.0, box[3] - box[1])
    area_b = np.clip(boxes[:, 2] - boxes[:, 0], 0.0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0.0, None
    )
    union = area_a + area_b - inter
    return np.where(union > 0.0, inter / np.maximum(union, 1e-12), 0.0)


class IouTracker:
    """ByteTrack-compatible-shaped IOU tracker (see module docstring)."""

    def __init__(self, config: TrackerConfig):
        self.config = config
        self._next_track_id = itertools.count(1)
        self._streams: Dict[str, _StreamState] = {}
        # asyncio workers never await inside update(), but the batcher may
        # call from an executor thread; a lock keeps that safe.
        self._lock = threading.Lock()

    def update(
        self, stream_name: str, detections: Iterable[Detection]
    ) -> List[Track]:
        with self._lock:
            return self._update(stream_name, list(detections))

    def _update(self, stream_name: str, detections: List[Detection]) -> List[Track]:
        state = self._streams.setdefault(stream_name, _StreamState())
        track_ids: List[int] = list(state.tracks.keys())
        matched: set = set()

        for det in detections:
            box = np.asarray(det.bbox_xyxy, dtype=np.float32)
            ious = _iou_one_to_many(box, state.boxes)
            same_class = state.classes == det.class_id
            candidate = same_class & (ious >= self.config.max_iou_distance)
            match_idx = -1
            if candidate.any():
                # strict ">" on best keeps the first-seen track on ties,
                # matching the reference's insertion-order scan
                masked = np.where(candidate, ious, -1.0)
                match_idx = int(np.argmax(masked))

            temporal = {
                f: getattr(det, f) for f in _TEMPORAL_FIELDS if hasattr(det, f)
            }
            if match_idx < 0:
                track = Track(
                    track_id=next(self._next_track_id),
                    stream_name=stream_name,
                    class_id=det.class_id,
                    confidence=det.confidence,
                    bbox_xyxy=tuple(det.bbox_xyxy),
                    age=0,
                    hits=1,
                    **temporal,
                )
                state.tracks[track.track_id] = track
                track_ids.append(track.track_id)
                state.boxes = np.concatenate([state.boxes, box[None]], axis=0)
                state.classes = np.concatenate(
                    [state.classes, np.array([det.class_id], np.int32)]
                )
                matched.add(track.track_id)
            else:
                tid = track_ids[match_idx]
                track = state.tracks[tid]
                track.bbox_xyxy = tuple(det.bbox_xyxy)
                track.confidence = det.confidence
                track.hits += 1
                track.age = 0
                for key, value in temporal.items():
                    setattr(track, key, value)
                state.boxes[match_idx] = box
                matched.add(tid)

        # prune: unmatched tracks age, then lifecycle cull
        for tid in list(state.tracks.keys()):
            if tid in matched:
                continue
            track = state.tracks[tid]
            track.age += 1
            if track.age > self.config.max_age or track.hits < self.config.min_hits:
                del state.tracks[tid]
        state.rebuild_arrays()
        return list(state.tracks.values())

    def active_track_count(self, stream_name: str) -> int:
        state = self._streams.get(stream_name)
        return len(state.tracks) if state else 0

    def reset_stream(self, stream_name: str) -> None:
        """Drop all tracks of one stream (e.g. after a reconnect)."""
        with self._lock:
            self._streams.pop(stream_name, None)

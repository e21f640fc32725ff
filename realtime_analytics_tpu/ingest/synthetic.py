"""Deterministic synthetic video source.

URL scheme: ``synthetic://?width=640&height=480&boxes=2&frames=0``
(``frames=0`` means endless). Produces BGR uint8 frames with moving bright
rectangles on a dark background — enough signal for motion filters, trackers
and end-to-end tests without ffmpeg, files or network (the reference's
closest analog is its bundled demo.mp4 fixture + the ffmpeg simulator).
"""

from __future__ import annotations

from typing import Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np


class SyntheticSource:
    def __init__(
        self,
        width: int = 640,
        height: int = 480,
        boxes: int = 2,
        max_frames: int = 0,
        seed: int = 0,
        fail_after: Optional[int] = None,
    ):
        self.width = width
        self.height = height
        self.n_boxes = boxes
        self.max_frames = max_frames
        self.fail_after = fail_after
        self._i = 0
        rng = np.random.default_rng(seed)
        self._pos = rng.uniform(0.1, 0.7, (boxes, 2))
        self._vel = rng.uniform(-0.01, 0.01, (boxes, 2)) + 0.003
        self._size = rng.uniform(0.08, 0.2, (boxes, 2))
        self._colors = rng.integers(120, 256, (boxes, 3))
        self._opened = True

    @classmethod
    def from_url(cls, url: str) -> "SyntheticSource":
        q = parse_qs(urlparse(url).query)

        def geti(name, default):
            return int(q[name][0]) if name in q else default

        return cls(
            width=geti("width", 640),
            height=geti("height", 480),
            boxes=geti("boxes", 2),
            max_frames=geti("frames", 0),
            seed=geti("seed", 0),
            fail_after=geti("fail_after", 0) or None,
        )

    def isOpened(self) -> bool:  # cv2.VideoCapture API shape
        return self._opened

    def read(self) -> Tuple[bool, Optional[np.ndarray]]:
        if not self._opened:
            return False, None
        if self.max_frames and self._i >= self.max_frames:
            return False, None
        if self.fail_after is not None and self._i >= self.fail_after:
            return False, None
        frame = np.full((self.height, self.width, 3), 24, dtype=np.uint8)
        self._pos = self._pos + self._vel
        # bounce off edges
        for d in range(2):
            over = (self._pos[:, d] < 0.0) | (self._pos[:, d] + self._size[:, d] > 1.0)
            self._vel[over, d] *= -1
        self._pos = np.clip(self._pos, 0.0, 1.0 - self._size)
        for b in range(self.n_boxes):
            x0 = int(self._pos[b, 0] * self.width)
            y0 = int(self._pos[b, 1] * self.height)
            x1 = min(self.width, x0 + int(self._size[b, 0] * self.width))
            y1 = min(self.height, y0 + int(self._size[b, 1] * self.height))
            frame[y0:y1, x0:x1] = self._colors[b]
        self._i += 1
        return True, frame

    def read_labeled(self):
        """(ok, frame, boxes_xyxy [n_boxes, 4] float px, class_ids [n_boxes])
        — ground-truth boxes for the rendered rectangles, enabling supervised
        training/eval without datasets (see scripts/train.py). Class id = the
        rectangle's index (stable per source)."""
        ok, frame = self.read()
        if not ok:
            return False, None, None, None
        boxes = np.empty((self.n_boxes, 4), np.float32)
        boxes[:, 0] = self._pos[:, 0] * self.width
        boxes[:, 1] = self._pos[:, 1] * self.height
        boxes[:, 2] = boxes[:, 0] + self._size[:, 0] * self.width
        boxes[:, 3] = boxes[:, 1] + self._size[:, 1] * self.height
        classes = np.arange(self.n_boxes, dtype=np.int32)
        return True, frame, boxes, classes

    def release(self) -> None:
        self._opened = False

    def get(self, *_args) -> float:  # cv2 prop API compatibility
        return 0.0

    def set(self, *_args) -> bool:
        return True

"""Device-side ops: box math, batched NMS, fused preprocessing.

All ops use fixed shapes (padding + validity masks) so they compile once per
bucket and stay on the MXU/VPU — the TPU-native replacement for the
reference's per-frame NumPy postprocess (reference detector.py:266-375).
"""

from .boxes import iou_matrix, iou_one_to_many, unletterbox_boxes, xywh2xyxy  # noqa: F401
from .nms import batched_nms  # noqa: F401
from .preprocess import (  # noqa: F401
    LetterboxSpec,
    letterbox_numpy,
    letterbox_spec,
    preprocess_batch,
)

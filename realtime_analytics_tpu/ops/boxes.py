"""Box geometry ops (jax.numpy, shape-polymorphic over leading dims).

Semantics match the reference's NumPy implementations exactly:
  * IoU with union clamped at 1e-6       — reference detector.py:469-481
  * xywh -> xyxy center-size conversion  — reference detector.py:352-359
  * un-letterbox + clip to [0, size-1]   — reference detector.py:340-350
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] center-x, center-y, w, h  ->  x1, y1, x2, y2."""
    xy = boxes[..., :2]
    half = boxes[..., 2:4] * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two box sets.

    a: [..., M, 4], b: [..., N, 4] (xyxy) -> [..., M, N].
    """
    tl = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    br = jnp.minimum(a[..., :, None, 2:4], b[..., None, :, 2:4])
    inter = jnp.prod(jnp.maximum(br - tl, 0.0), axis=-1)
    area_a = jnp.prod(a[..., 2:4] - a[..., :2], axis=-1)
    area_b = jnp.prod(b[..., 2:4] - b[..., :2], axis=-1)
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


def iou_one_to_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one box [4] against many [N, 4]."""
    return iou_matrix(box[None, :], boxes)[0]


def unletterbox_boxes(
    boxes: jnp.ndarray,
    scale: jnp.ndarray,
    pad_left: jnp.ndarray,
    pad_top: jnp.ndarray,
    orig_h: jnp.ndarray,
    orig_w: jnp.ndarray,
) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed input pixels back to original-frame
    pixels and clip to the frame. Scalars may be per-image arrays broadcast
    against a batch dim: boxes [..., D, 4], scale/pads/sizes [...] or scalar.
    """
    scale = jnp.asarray(scale)[..., None, None]
    pad = jnp.stack(
        [jnp.asarray(pad_left), jnp.asarray(pad_top)], axis=-1
    )  # [..., 2]
    pad = jnp.concatenate([pad, pad], axis=-1)[..., None, :]  # [..., 1, 4]
    out = (boxes - pad) / scale
    hi_x = jnp.asarray(orig_w)[..., None] - 1.0
    hi_y = jnp.asarray(orig_h)[..., None] - 1.0
    x = jnp.clip(out[..., 0::2], 0.0, hi_x[..., None])
    y = jnp.clip(out[..., 1::2], 0.0, hi_y[..., None])
    return jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)

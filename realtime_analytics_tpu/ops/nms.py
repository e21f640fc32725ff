"""Batched fixed-shape NMS for TPU.

The reference runs a data-dependent greedy while-loop per frame on the host
(reference detector.py:361-375). On TPU that shape-polymorphic loop would be
poison: instead we run, for the whole batch at once,

  1. top-K candidate selection (static K = ``pre_topk``), scores pre-masked
     by the confidence threshold,
  2. one IoU matrix per image [K, K],
  3. greedy suppression solved as a monotone fixpoint: ``keep[i]`` iff no
     higher-scoring kept box overlaps it. Each sweep is a masked matvec over
     the overlap matrix (MXU-friendly); the fixpoint equals the exact greedy
     result, and converges in "suppression chain depth" sweeps (rarely > 4) —
     bounded by K.
  4. kept boxes compacted (stable, score-descending) into ``max_det`` padded
     slots plus a validity count.

Matches the reference's *class-agnostic* NMS semantics by default; set
``class_agnostic=False`` for per-class NMS (boxes offset by class id, the
standard trick).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import iou_matrix

_CLASS_OFFSET = 8192.0  # > any letterboxed input size


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "max_det", "pre_topk", "class_agnostic")
)
def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    *,
    iou_threshold: float,
    max_det: int = 300,
    pre_topk: int = 1024,
    class_agnostic: bool = True,
):
    """Batched NMS with static output shapes.

    Args:
      boxes:     [N, M, 4] xyxy (any pixel space).
      scores:    [N, M] confidence; entries already below the confidence
                 threshold must be zeroed (0 == invalid candidate).
      class_ids: [N, M] int32.

    Returns:
      (boxes [N, max_det, 4], scores [N, max_det], class_ids [N, max_det],
       num_valid [N] int32) — rows past num_valid[i] are zero padding.
    """
    n, m = scores.shape
    k = min(pre_topk, m)

    # 1. Top-K candidates per image, sorted score-descending.
    top_scores, top_idx = jax.lax.top_k(scores, k)  # [N, K]
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)  # [N, K, 4]
    top_classes = jnp.take_along_axis(class_ids, top_idx, axis=1)  # [N, K]
    valid = top_scores > 0.0  # [N, K]

    # 2. Overlap matrix. For class-aware NMS, shift boxes per class so
    #    different classes never overlap.
    nms_boxes = top_boxes
    if not class_agnostic:
        nms_boxes = top_boxes + (top_classes.astype(top_boxes.dtype) * _CLASS_OFFSET)[
            ..., None
        ]
    iou = iou_matrix(nms_boxes, nms_boxes)  # [N, K, K]
    # overlap[i, j] == 1 where j outranks i and suppresses it (strictly upper
    # rank; ranks are the sorted order, ties broken by index).
    rank = jnp.arange(k)
    outranked = rank[None, :, None] > rank[None, None, :]  # j < i in sort order
    overlap = (iou > iou_threshold) & outranked & valid[:, None, :] & valid[:, :, None]
    overlap_f = overlap.astype(jnp.float32)  # [N, K, K]

    # 3. Fixpoint sweeps: keep = valid & ~(overlap @ keep > 0).
    def sweep(state):
        keep, _changed, it = state
        suppressed = (
            jnp.einsum("nij,nj->ni", overlap_f, keep.astype(jnp.float32)) > 0.0
        )
        new_keep = valid & ~suppressed
        return new_keep, jnp.any(new_keep != keep), it + 1

    def cond(state):
        _keep, changed, it = state
        return changed & (it < k)

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(cond, sweep, (keep0, jnp.array(True), 0))

    # 4. Compact kept rows to the front, preserving score order.
    #    argsort of (not kept) is stable, so kept rows keep their relative
    #    (descending-score) order.
    d = min(max_det, k)
    order = jnp.argsort(~keep, axis=-1, stable=True)  # kept first
    order_d = order[:, :d]
    out_boxes = jnp.take_along_axis(top_boxes, order_d[..., None], axis=1)
    out_scores = jnp.take_along_axis(top_scores, order_d, axis=1)
    out_classes = jnp.take_along_axis(top_classes, order_d, axis=1)
    num_kept = jnp.minimum(jnp.sum(keep, axis=-1), d).astype(jnp.int32)

    slot_valid = jnp.arange(d)[None, :] < num_kept[:, None]
    out_boxes = jnp.where(slot_valid[..., None], out_boxes, 0.0)
    out_scores = jnp.where(slot_valid, out_scores, 0.0)
    out_classes = jnp.where(slot_valid, out_classes, 0).astype(jnp.int32)
    if d < max_det:  # pad up to the static contract
        pad = max_det - d
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)))
        out_classes = jnp.pad(out_classes, ((0, 0), (0, pad)))
    return out_boxes, out_scores, out_classes, num_kept

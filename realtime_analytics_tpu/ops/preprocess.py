"""Fused batched letterbox preprocessing.

The reference preprocesses one frame at a time on the host with cv2
(letterbox resize, 114-pad, BGR->RGB, /255, HWC->CHW — reference
detector.py:198-264). Here the whole batch is preprocessed on device in one
jitted graph: frames arrive as uint8 NHWC BGR (one H2D transfer), and resize,
pad, channel swap, normalization and dtype cast all fuse into the forward
pass's first conv under jit.

All letterbox geometry (scale, resized size, pad split) is *static* per
(source HxW -> target HxW) pair, so each source-resolution bucket compiles
exactly once. The math matches the reference bit-for-bit:

    scale = min(tw/w, th/h); new = int(round-toward-zero(size * scale))
    pad_top = (th - new_h) // 2 ; pad_left = (tw - new_w) // 2

``letterbox_numpy`` is the host/cv2 oracle with identical semantics, used by
tests and as a host-side fallback.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PAD_VALUE = 114.0


@dataclass(frozen=True)
class LetterboxSpec:
    """Static letterbox geometry for one (src -> dst) resolution pair."""

    src_h: int
    src_w: int
    dst_h: int
    dst_w: int
    scale: float
    new_h: int
    new_w: int
    pad_top: int
    pad_left: int


def letterbox_spec(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]) -> LetterboxSpec:
    h, w = src_hw
    th, tw = dst_hw
    scale = min(tw / w, th / h)
    new_w = int(w * scale)
    new_h = int(h * scale)
    return LetterboxSpec(
        src_h=h,
        src_w=w,
        dst_h=th,
        dst_w=tw,
        scale=scale,
        new_h=new_h,
        new_w=new_w,
        pad_top=(th - new_h) // 2,
        pad_left=(tw - new_w) // 2,
    )


def integer_axis_reduction(src: int, dst: int):
    """How half-pixel-center bilinear degenerates for an exact integer
    downscale ratio r = src/dst (source coords are (i+0.5)·r − 0.5):

      * ``("select", r, off)`` — r odd: coords are INTEGRAL, the resize is
        an exact pixel pick at stride r, offset (r−1)/2;
      * ``("mean2", r, off)`` — r even: coords land exactly halfway, a
        2-tap mean of offsets off, off+1 at stride r;
      * ``None`` — fractional ratio (general bilinear needed).

    This is THE geometry invariant shared by the host pixel-pick upload
    (engine host_select), the Pallas kernel's mode dispatch, and the XLA
    fast paths below — keep it in one place.
    """
    if src != dst and src % dst == 0:
        r = src // dst
        if r % 2 == 1:
            return ("select", r, (r - 1) // 2)
        return ("mean2", r, r // 2 - 1)
    return None


def _resize_axis(x: jnp.ndarray, axis: int, src: int, dst: int) -> jnp.ndarray:
    """Bilinear (half-pixel centers, no antialias) resize along one axis,
    with the ``integer_axis_reduction`` fast paths (1080p -> 640 is exactly
    3x); fractional ratios fall back to the general jax.image.resize."""
    if dst == src:
        return x
    red = integer_axis_reduction(src, dst)
    if red is not None:
        mode, r, off = red
        if mode == "select":
            return jax.lax.slice_in_dim(x, off, off + r * (dst - 1) + 1, r, axis=axis)
        t1 = jax.lax.slice_in_dim(x, off, off + r * (dst - 1) + 1, r, axis=axis)
        t2 = jax.lax.slice_in_dim(x, off + 1, off + r * (dst - 1) + 2, r, axis=axis)
        return (t1 + t2) * 0.5
    shape = list(x.shape)
    shape[axis] = dst
    return jax.image.resize(x, shape, method="linear", antialias=False)


@functools.partial(
    jax.jit, static_argnames=("spec", "out_dtype", "round_uint8", "layout")
)
def preprocess_batch(
    frames: jnp.ndarray,
    *,
    spec: LetterboxSpec,
    out_dtype: jnp.dtype = jnp.bfloat16,
    round_uint8: bool = True,
    layout: str = "NCHW",
) -> jnp.ndarray:
    """uint8 NHWC BGR batch -> normalized letterboxed batch.

    Args:
      frames: [N, src_h, src_w, 3] uint8 BGR.
      round_uint8: round the resized image to integers before normalizing,
        matching cv2's uint8 resize output (the reference resizes in uint8).
      layout: "NCHW" (reference tensor layout) or "NHWC" (TPU-conv native).

    Returns [N, 3, dst_h, dst_w] (or NHWC) in ``out_dtype``, RGB in [0, 1].
    """
    needs_resize = (spec.new_h, spec.new_w) != (spec.src_h, spec.src_w)
    int_ratio = (
        needs_resize
        and spec.src_h % spec.new_h == 0
        and spec.src_w % spec.new_w == 0
        and (spec.src_h // spec.new_h) % 2 == 1
        and (spec.src_w // spec.new_w) % 2 == 1
    )
    if int_ratio:
        # odd-integer ratio (1080p->640 is exactly 3x): bilinear degenerates
        # to a strided slice — do it on the *uint8* input so the full-res
        # frame is never materialized in f32 (at batch 128 that cast alone
        # is ~3.2 GB of HBM traffic, w+r ~8 ms)
        x = _resize_axis(frames, 1, spec.src_h, spec.new_h)
        x = _resize_axis(x, 2, spec.src_w, spec.new_w).astype(jnp.float32)
    else:
        x = frames.astype(jnp.float32)
        if needs_resize:
            x = _resize_axis(x, 1, spec.src_h, spec.new_h)
            x = _resize_axis(x, 2, spec.src_w, spec.new_w)
            if round_uint8:
                # floor(x + 0.5), not jnp.round: cv2's fixed-point uint8
                # resize rounds halves UP while jnp.round is half-to-even —
                # exact .5 interpolants (common at even integer ratios)
                # would differ by 1/255 from the cv2 oracle/host path
                x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
    pad_bottom = spec.dst_h - spec.new_h - spec.pad_top
    pad_right = spec.dst_w - spec.new_w - spec.pad_left
    x = jnp.pad(
        x,
        ((0, 0), (spec.pad_top, pad_bottom), (spec.pad_left, pad_right), (0, 0)),
        constant_values=_PAD_VALUE,
    )
    x = x[..., ::-1]  # BGR -> RGB
    x = x * (1.0 / 255.0)
    if layout == "NCHW":
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x.astype(out_dtype)


def letterbox_numpy(
    frame: np.ndarray,
    dst_hw: Tuple[int, int],
    dtype: np.dtype = np.float32,
) -> Tuple[np.ndarray, dict]:
    """Host/cv2 oracle with the reference's exact semantics.

    Returns (tensor [1, 3, H, W] RGB normalized, meta {orig_shape, scale, pad}).
    """
    import cv2

    spec = letterbox_spec(frame.shape[:2], dst_hw)
    if (spec.new_h, spec.new_w) != (spec.src_h, spec.src_w):
        resized = cv2.resize(
            frame, (spec.new_w, spec.new_h), interpolation=cv2.INTER_LINEAR
        )
    else:
        resized = frame
    canvas = cv2.copyMakeBorder(
        resized,
        spec.pad_top,
        spec.dst_h - spec.new_h - spec.pad_top,
        spec.pad_left,
        spec.dst_w - spec.new_w - spec.pad_left,
        cv2.BORDER_CONSTANT,
        value=(114, 114, 114),
    )
    image = cv2.cvtColor(canvas, cv2.COLOR_BGR2RGB).astype(dtype) * (1.0 / 255.0)
    tensor = np.expand_dims(np.ascontiguousarray(image.transpose(2, 0, 1)), 0)
    meta = {
        "orig_shape": (spec.src_h, spec.src_w),
        "scale": spec.scale,
        "pad": (spec.pad_left, spec.pad_top),
    }
    return tensor, meta

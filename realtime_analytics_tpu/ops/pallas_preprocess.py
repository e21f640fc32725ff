"""Pallas fused letterbox kernel (general resize ratios, MXU-based).

For integer ratios ``preprocess_batch`` already degenerates to a strided
slice (see ``preprocess.py``). For arbitrary ratios, bilinear resize is a
pair of sparse matrix products — and on TPU the fastest way to run a 2-tap
sparse matrix is as a *dense bf16 matmul on the MXU*:

    out[i, j] = sum_{y, x} A_h[i, y] * img[y, x] * A_w[x, j]

This kernel fuses, per (image, channel) grid step, entirely in VMEM:

    uint8 load -> bf16 -> A_h @ img @ A_w (two MXU dots, f32 accumulate)
    -> round (cv2 uint8-resize semantics) -> /255 -> BGR->RGB channel swap
    (via the output index map) -> write into the 114-padded canvas

HBM traffic: read H*W bytes + write Ht*Wt*2 bytes per channel — one pass,
no f32 intermediates (vs jax.image.resize materializing several).

Pixel values 0..255 are exact in bf16 (8 mantissa bits), so the only error
vs the f32 oracle is the bf16 rounding of interpolation weights (<=0.4%),
well inside the cv2 fixed-point tolerance used by the tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .preprocess import LetterboxSpec

_PAD = 114.0 / 255.0


def bilinear_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] half-pixel-center bilinear interpolation matrix
    (edge-clamped 2-tap rows; matches cv2.INTER_LINEAR geometry)."""
    A = np.zeros((dst, src), dtype=np.float32)
    ratio = src / dst
    for i in range(dst):
        x = (i + 0.5) * ratio - 0.5
        x0 = int(np.floor(x))
        w1 = x - x0
        A[i, min(max(x0, 0), src - 1)] += 1.0 - w1
        A[i, min(max(x0 + 1, 0), src - 1)] += w1
    return A


def _h_mode(spec: LetterboxSpec) -> Tuple[str, int, int]:
    """How to reduce the H axis: 'select' (odd-integer ratio — bilinear
    degenerates to a row pick), 'mean2' (even-integer ratio — exact 2-tap
    mean), or 'matmul' (general bilinear). The geometry rule lives in
    ``preprocess.integer_axis_reduction``."""
    from .preprocess import integer_axis_reduction

    red = integer_axis_reduction(spec.src_h, spec.new_h)
    return red if red is not None else ("matmul", 0, 0)


def _kernel(img_ref, ah_ref, awt_ref, out_ref, *, spec: LetterboxSpec,
            round_uint8: bool):
    # uint8 -> int32 -> bf16 (Mosaic has no direct u8->bf16 cast);
    # ints 0..255 are exact in bf16 (8 mantissa bits)
    mode, r_h, off = _h_mode(spec)
    img = img_ref[0]  # uint8; see pallas_letterbox for the per-mode shape
    w = spec.src_w
    if mode == "select":
        # integer-ratio H: bilinear degenerates to a row pick, which XLA
        # already performed (reshape + size-1 slice reads only the kept
        # rows), so the kernel sees [new_h, src_w] and only runs the W
        # matmul — kills the [new_h, src_h] @ [src_h, src_w] half, the
        # FLOP-dominant one at big downscales (1080p->640 is exactly 3x:
        # 912 -> 339 GFLOP per 128-frame batch)
        t = img.astype(jnp.int32).astype(jnp.bfloat16)  # [new_h, Ws]
    elif mode == "mean2":
        # even-integer H ratio: exact 2-tap mean of adjacent lane windows
        # (planes arrive flattened [new_h, r_h * src_w])
        a = img[:, off * w : (off + 1) * w].astype(jnp.int32)
        b = img[:, (off + 1) * w : (off + 2) * w].astype(jnp.int32)
        t = ((a.astype(jnp.float32) + b.astype(jnp.float32)) * 0.5).astype(
            jnp.bfloat16
        )
    else:
        full = img.astype(jnp.int32).astype(jnp.bfloat16)
        t = jnp.dot(ah_ref[:], full,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    r = jnp.dot(t, awt_ref[:], preferred_element_type=jnp.float32)
    if round_uint8:
        # floor(+0.5) matches cv2's half-up uint8 rounding (ops/preprocess
        # round_uint8 comment); jnp.round is half-to-even
        r = jnp.clip(jnp.floor(r + 0.5), 0.0, 255.0)
    r = r * (1.0 / 255.0)
    out_ref[0] = jnp.full((spec.dst_h, spec.dst_w), _PAD, dtype=out_ref.dtype)
    out_ref[
        0,
        spec.pad_top : spec.pad_top + spec.new_h,
        spec.pad_left : spec.pad_left + spec.new_w,
    ] = r.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "out_dtype", "round_uint8", "interpret", "mesh", "batch_axis"
    ),
)
def pallas_letterbox(
    frames: jnp.ndarray,
    *,
    spec: LetterboxSpec,
    out_dtype: jnp.dtype = jnp.bfloat16,
    round_uint8: bool = True,
    interpret: bool = False,
    mesh=None,
    batch_axis: str = "dp",
) -> jnp.ndarray:
    """uint8 NHWC BGR [N, Hs, Ws, 3] -> letterboxed NHWC RGB [N, Ht, Wt, 3].

    The grid is one plane per (image, channel), so the kernel is
    embarrassingly parallel along N. Under a device mesh the call is
    shard_map'd over ``batch_axis`` — each chip resizes its local batch
    shard (the engine's mesh bucket rounding guarantees N divides dp);
    without this a Mosaic call would reach pjit unpartitioned.
    """
    if mesh is not None and batch_axis in mesh.shape:
        from jax.sharding import PartitionSpec as P

        inner = functools.partial(
            pallas_letterbox, spec=spec, out_dtype=out_dtype,
            round_uint8=round_uint8, interpret=interpret,
        )
        p = P(batch_axis)
        return jax.shard_map(
            inner, mesh=mesh, in_specs=(p,), out_specs=p, check_vma=False,
        )(frames)
    n = frames.shape[0]
    ah = jnp.asarray(bilinear_matrix(spec.src_h, spec.new_h), jnp.bfloat16)
    awt = jnp.asarray(bilinear_matrix(spec.src_w, spec.new_w).T, jnp.bfloat16)

    # channel-major planes: Pallas TPU blocks want the last two dims to be
    # tile-aligned or full, so a [N*3, Hs, Ws] view with one plane per grid
    # step is the natural layout. Per-mode input prep (see _kernel):
    #   select — XLA row pick via reshape + size-1 slice (reads only the
    #     kept rows, ~0.7 ms cheaper than transposing the full frame and
    #     3x less kernel load traffic);
    #   mean2 — flatten each r_h-row group into one lane-row so the kernel
    #     reads both taps as contiguous lane windows;
    #   matmul — the plain full-plane transpose.
    mode, r_h, off = _h_mode(spec)
    if mode == "select":
        in_shape = (spec.new_h, spec.src_w)
        planes = (
            frames.reshape(n, spec.new_h, r_h, spec.src_w, 3)[:, :, off]
            .transpose(0, 3, 1, 2)
            .reshape(n * 3, *in_shape)
        )
    elif mode == "mean2":
        in_shape = (spec.new_h, r_h * spec.src_w)
        planes = (
            frames.transpose(0, 3, 1, 2)
            .reshape(n * 3, *in_shape)
        )
    else:
        in_shape = (spec.src_h, spec.src_w)
        planes = frames.transpose(0, 3, 1, 2).reshape(n * 3, *in_shape)

    kernel = functools.partial(_kernel, spec=spec, round_uint8=round_uint8)
    out = _call_kernel(
        planes, ah, awt, n, spec, kernel, out_dtype, interpret, in_shape
    )
    return out.reshape(n, 3, spec.dst_h, spec.dst_w).transpose(0, 2, 3, 1)


def pallas_stretch_resize(
    frames: jnp.ndarray,
    dst_hw: Tuple[int, int],
    *,
    out_dtype: jnp.dtype = jnp.bfloat16,
    round_uint8: bool = True,
    interpret: bool = False,
    mesh=None,
    batch_axis: str = "dp",
) -> jnp.ndarray:
    """Non-aspect-preserving resize (the ResNet/temporal preprocess contract:
    stretch to the model input, no letterbox pad): same MXU kernel with a
    zero-pad spec. uint8 NHWC BGR -> RGB [0, 1] NHWC."""
    n, src_h, src_w = frames.shape[0], frames.shape[1], frames.shape[2]
    spec = LetterboxSpec(
        src_h=src_h, src_w=src_w, dst_h=dst_hw[0], dst_w=dst_hw[1],
        scale=1.0, new_h=dst_hw[0], new_w=dst_hw[1], pad_top=0, pad_left=0,
    )
    return pallas_letterbox(
        frames, spec=spec, out_dtype=out_dtype, round_uint8=round_uint8,
        interpret=interpret, mesh=mesh, batch_axis=batch_axis,
    )


def _call_kernel(planes, ah, awt, n, spec, kernel, out_dtype, interpret,
                 in_shape=None):
    in_shape = in_shape or (spec.src_h, spec.src_w)
    return pl.pallas_call(
        kernel,
        grid=(n * 3,),
        in_specs=[
            pl.BlockSpec(
                (1, *in_shape),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (spec.new_h, spec.src_h), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (spec.src_w, spec.new_w), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        # BGR -> RGB: plane i lands at (i - i%3) + (2 - i%3)
        out_specs=pl.BlockSpec(
            (1, spec.dst_h, spec.dst_w),
            lambda i: (i - (i % 3) + 2 - (i % 3), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n * 3, spec.dst_h, spec.dst_w), out_dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 3 * (
                spec.new_h * spec.src_h * spec.src_w
                + spec.new_h * spec.src_w * spec.new_w
            ),
            bytes_accessed=n * 3 * (
                spec.src_h * spec.src_w + 2 * spec.dst_h * spec.dst_w
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes, ah, awt)

"""Fused YOLOv8 head decode (DFL + class reduce) as one Pallas kernel.

The serving decode (models/yolo.py:_detect_v8, reduce_scores path) is
mathematically small but XLA splits it into ~2 ms/step of HBM-level ops at
b=128: the DFL softmax materializes a [N, h, w, 4, 16] float32 intermediate
(26 MB at P3), the per-side expectation is another reduce+divide pass, and
the class max/argmax reads the [N, h, w, nc] logits twice more. Every one
of those passes is HBM-bound.

This kernel reads each level's head outputs ONCE and emits the decoded
(boxes, conf, cls) directly:

  - DFL expectation: per-side max-subtracted exp (jax.nn.softmax's own
    stabilization, as static 16-lane slices) then ONE [r, 64] @ [64, 8]
    MXU matmul whose columns are (sum_j j*e_group, sum_j e_group) per
    side — softmax numerator and denominator in the same pass;
    dist = num/den. Equal to jax.nn.softmax @ iota(16) for any logits.
  - grid offsets from an in-kernel iota; (x1, y1, x2, y2) = (g -/+ dist)
    * stride, the published v8 anchor-free decode.
  - class conf/ids: lane-dimension max over the raw bf16 logits, sigmoid
    on the [r, 1] max only (sigmoid is monotonic — models/yolo.py), and
    first-index argmax via a masked iota min (ties resolve like
    jnp.argmax).

Traffic per P3 level-call at b=128 drops from ~65 MB of f32 intermediates
to the 14 MB of bf16 inputs + 3.4 MB of outputs. Measured: the decode
chain shrinks from ~2.0 ms to ~0.4 ms/step (bench.py, v5e).

v5 decode (anchor-based, no DFL) keeps the XLA path — its levels carry 3x
fewer anchors per cell and never showed in the profile's top ops.

Reference contract: the decoded boxes/scores must match the reference's
postprocess (reference detector.py:266-338) — covered by the oracle tests
in tests/test_pallas_decode.py and the engine fidelity suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REG_MAX = 16


def _dfl_matrix() -> np.ndarray:
    """[64, 8]: columns 0-3 = per-side iota-weighted sums (softmax
    numerators), columns 4-7 = per-side plain sums (denominators)."""
    w = np.zeros((4 * REG_MAX, 8), np.float32)
    for j in range(4):
        rows = slice(REG_MAX * j, REG_MAX * (j + 1))
        w[rows, j] = np.arange(REG_MAX, dtype=np.float32)
        w[rows, 4 + j] = 1.0
    return w


def _decode_kernel(box_ref, cls_ref, w_ref, boxes_ref, conf_ref, cid_ref,
                   *, bh: int, w: int, nc: int, stride: float):
    r = bh * w
    row0 = pl.program_id(1) * bh  # first grid row of this band
    x = box_ref[0].reshape(r, 4 * REG_MAX).astype(jnp.float32)
    # shift-invariant softmax: subtract each side's max before exp (static
    # 16-lane slices keep it Mosaic-friendly) — exactly jax.nn.softmax's
    # stabilization, so arbitrarily scaled logits decode correctly
    e = jnp.concatenate(
        [
            jnp.exp(
                x[:, REG_MAX * j : REG_MAX * (j + 1)]
                - jnp.max(
                    x[:, REG_MAX * j : REG_MAX * (j + 1)], axis=1, keepdims=True
                )
            )
            for j in range(4)
        ],
        axis=1,
    )
    nd = jax.lax.dot_general(
        e, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # true-f32 MXU passes: the
        # default bf16 path costs ~0.1 px on the DFL expectation
    )  # [r, 8] = (num_l, num_t, num_r, num_b, den_l, den_t, den_r, den_b)
    dist = nd[:, :4] / nd[:, 4:]
    ii = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    gx = (ii % w).astype(jnp.float32) + 0.5
    gy = (ii // w + row0).astype(jnp.float32) + 0.5
    x1 = (gx - dist[:, 0:1]) * stride
    y1 = (gy - dist[:, 1:2]) * stride
    x2 = (gx + dist[:, 2:3]) * stride
    y2 = (gy + dist[:, 3:4]) * stride
    boxes_ref[0] = jnp.concatenate([x1, y1, x2, y2], axis=1)

    # f32 for the reductions: bf16->f32 is exact, so ordering and ties are
    # preserved. argmax = min over (iota where value == max): guarantees
    # jnp.argmax's FIRST-index tie-break (Mosaic's native argmax lowering
    # breaks ties differently). The f32 masked where avoids the Mosaic i1
    # relayout bug that the same formulation hits on bf16 operands.
    cl = cls_ref[0].reshape(r, nc).astype(jnp.float32)
    m = jnp.max(cl, axis=1, keepdims=True)
    conf_ref[0] = jax.nn.sigmoid(m)
    ci = jax.lax.broadcasted_iota(jnp.int32, (r, nc), 1).astype(jnp.float32)
    cand = jnp.where(cl == m, ci, float(nc))
    cid_ref[0] = jnp.min(cand, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def decode_v8_level(
    box_f: jnp.ndarray,
    cls_f: jnp.ndarray,
    *,
    stride: float,
    interpret: bool = False,
):
    """Decode one v8 head level.

    box_f: [N, h, w, 64] DFL logits; cls_f: [N, h, w, nc] class logits.
    Returns (boxes [N, h*w, 4] f32 xyxy input-px, conf [N, h*w] f32,
    cls [N, h*w] int32).
    """
    n, h, w, c = box_f.shape
    assert c == 4 * REG_MAX
    nc = cls_f.shape[-1]
    # band the rows so the per-step f32 working set fits scoped VMEM
    # (whole-level P3 blocks at 80x80 overflow the 16 MB stack limit)
    bh = h
    while bh * w > 2048 and bh % 2 == 0:
        bh //= 2
    rb = bh * w
    kernel = functools.partial(_decode_kernel, bh=bh, w=w, nc=nc, stride=stride)
    boxes, conf, cid = pl.pallas_call(
        kernel,
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, w, nc), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * REG_MAX, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h * w, 4), jnp.float32),
            jax.ShapeDtypeStruct((n, h * w, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, h * w, 1), jnp.int32),
        ],
        interpret=interpret,
    )(box_f, cls_f, jnp.asarray(_dfl_matrix()))
    return boxes, conf[..., 0], cid[..., 0]


def decode_v8_level_reference(box_f, cls_f, *, stride: float):
    """jnp oracle — the exact pre-kernel decode (models/yolo.py)."""
    n, h, w, _ = box_f.shape
    proj = jnp.arange(REG_MAX, dtype=jnp.float32)
    dist = box_f.astype(jnp.float32).reshape(n, h, w, 4, REG_MAX)
    dist = jax.nn.softmax(dist, axis=-1) @ proj
    ax = jnp.arange(w, dtype=jnp.float32) + 0.5
    ay = jnp.arange(h, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(ax, ay)
    x1 = (gx - dist[..., 0]) * stride
    y1 = (gy - dist[..., 1]) * stride
    x2 = (gx + dist[..., 2]) * stride
    y2 = (gy + dist[..., 3]) * stride
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(n, h * w, 4)
    conf = jax.nn.sigmoid(jnp.max(cls_f, axis=-1).astype(jnp.float32))
    cls = jnp.argmax(cls_f, axis=-1).astype(jnp.int32)
    return boxes, conf.reshape(n, h * w), cls.reshape(n, h * w)

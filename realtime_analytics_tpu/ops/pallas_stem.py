"""Pallas fused stem kernel: YOLO nodes 0+1 (P1/P2 convs) in one pass.

The round-3 b=128 profile (docs/performance.md, "Bottleneck analysis")
put the stem region at ~2-3 ms of the step: XLA runs the stem as a fused
2x2x48 conv but then writes the [B, 320, 320, 16] P1 activation to HBM
and reads it back for the P2 conv (HBM-bound — 16 channels fill 1/8 of
the lane dim). This kernel fuses both convs so P1 lives only in VMEM,
and packs the lane dimension with OUTPUT COLUMNS so the MXU is not
starved by the tiny channel counts.

Formulation (all lane arithmetic 128-aligned — the Mosaic compiler on
v5e rejects lane reshapes at non-tile granularity):

* conv0 (k3 s2 p1, 3->c0): on the space-to-depth(2) input it is an exact
  k2 s1 conv over "cells" of 12 channels (the same transform XLA itself
  derives). Cells are zero-padded to c0 channels so a group of
  gc0 = 128 // c0 output columns reads exactly 128 input lanes.
* conv1 (k3 s2 p1, c0->c1): reads the VMEM-resident P1 in groups of
  gc1 = 128 // c1 output columns = 2*gc1 input cells = 128 lanes.
* Each conv is a sum of [M, 128] @ [128, 128] matmul PIECES: per kernel
  row tap (dy / ky), part 0 covers the group's aligned 128 input lanes
  and part 1 the next 128 (whose lanes beyond the one overlap cell get
  structurally ZERO weight rows, so no lane slicing is ever needed).
  The piece weights are block-Toeplitz scatters of the conv weight,
  built in traced jnp outside the kernel (_piece_weights).

Memory plan: the grid is (batch, 4 row strips). The HALOED strips are
materialized by XLA as a [B, 4, rows, LX] tensor (strips overlap by one
P1 row, ~1.2x input HBM — overlapping VMEM blocks are not expressible
with BlockSpec index maps, and Mosaic's manual-DMA path
(make_async_copy / memory_space=ANY) crashes this v5e toolchain's
remote compiler at every size probed). Each grid step gets its ~1 MB
strip block, computes its 2*r2+1 P1 rows into a VMEM scratch, and emits
its r2-row P2 strip; whole-image VMEM blocks at 640^2 (~13 MB) also
crash the Mosaic allocator. Strips recompute their one-row P1 halo
instead of sharing it.

Both matmuls accumulate in f32; bias + SiLU apply in f32 before the
bf16 cast, matching the XLA path (which also materializes P1 in bf16).

Measured on v5e at b=128/640: see docs/performance.md ("fused-stem
kernel") for the adopt/reject verdict — this file is the measured answer
to the round-3 "parked on analysis" item (round-4 VERDICT #3).

Reference analog: none — the reference's stem runs inside TensorRT/ONNX
engines (reference detector.py:113-140); this is TPU-first capability.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stem_geometry_ok(h: int, w: int, c0: int, c1: int) -> bool:
    """Static-shape gate: channel counts must tile the 128-lane dim, the
    column groups must tile the width, and 4 row strips must tile the
    P2 height."""
    # c1 == 2*c0 is a kernel invariant (every published v5/v8 stem):
    # the P1 scratch lanes are sized from c1 (w2*c1 == w1*c0 only then)
    # and the 2-part piece decomposition covers conv1's taps only then
    if c0 < 12 or 128 % c0 or 128 % c1 or c1 > 128 or c1 != 2 * c0:
        return False
    gc0, gc1 = 128 // c0, 128 // c1
    h1, w1 = h // 2, w // 2
    h2, w2 = h // 4, w // 4
    # Mosaic: a non-degenerate out block's second-minor dim must be a
    # multiple of 8, so strips engage only when (h2 // 4) % 8 == 0
    # (640 -> r2 = 40); otherwise one whole-image step per batch element
    return (
        h % 4 == 0 and w % 4 == 0
        and w1 % gc0 == 0 and w2 % gc1 == 0
        and h2 % 4 == 0 and h1 == 2 * h2
    )


def _n_strips(h2: int) -> int:
    return 4 if (h2 // 4) % 8 == 0 else 1


def _s2d_stem_weight(w: jnp.ndarray, cp: int) -> jnp.ndarray:
    """[3, 3, 3, c0] HWIO (k3 s2 p1) -> the exact k2 s1 weight over the
    space-to-depth(2) input, [2, 2, cp, c0]: s2d channel order
    c*4 + py*2 + px (models/s2d.space_to_depth), zero rows past channel
    12 (cells are padded to cp = c0 channels for lane alignment)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3) and cin == 3
    out = jnp.zeros((2, 2, cp, cout), w.dtype)
    for ky in range(3):
        dy, py = divmod(ky, 2)
        for kx in range(3):
            dx, px = divmod(kx, 2)
            out = out.at[dy, dx, py * 2 + px : 12 : 4, :].set(w[ky, kx])
    return out


def _piece_weights(w_cell: jnp.ndarray, cp: int, cstride: int) -> jnp.ndarray:
    """Conv-over-cells weight [kw, ci, co] (one row tap) -> the two
    [128, 128] matmul piece weights [2, 128, 128].

    A group of gN = 128 // co output columns reads cells
    cstride*s + k (k < kw) of a window whose part-p lane l maps to cell
    p * (128 // cp) + l // cp, channel l % cp. Lanes whose (cell, chan)
    is not a real tap get zero rows — including every lane of part 1
    past the single overlap cell, which is what makes unsliced 128-lane
    input pieces sound."""
    kw, ci, co = w_cell.shape
    gn = 128 // co
    gcell = 128 // cp
    out = jnp.zeros((2, 128, 128), w_cell.dtype)
    for part in range(2):
        for lane_cell in range(gcell):
            d = part * gcell + lane_cell
            for s in range(gn):
                k = d - cstride * s
                if 0 <= k < kw:
                    out = out.at[
                        part,
                        lane_cell * cp : lane_cell * cp + ci,
                        s * co : (s + 1) * co,
                    ].set(w_cell[k])
    return out


def _mm(a, w):
    return jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel(xs_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref,
            p1_ref, *, h: int, w: int, c0: int, c1: int,
            _n_strips_static: int):
    """Grid = (B, ns). xs_ref: [1, 1, rr+1, LX] — this step's haloed
    s2d strip (strip t covers global s2d rows [2*t*r2, 2*t*r2 + rr]),
    cells zero-padded to c0 channels and flattened into lanes
    (cell*c0 + c). The step computes the 2*r2+1 P1 rows it needs into
    p1_ref (local row u = global P1p row 2*i0+u; row 0 of the first
    strip is the conv's zero top pad) and emits P2 rows
    [t*r2, (t+1)*r2)."""
    h1, w1 = h // 2, w // 2
    h2, w2 = h // 4, w // 4
    g0 = w1 * c0 // 128
    g1 = w2 * c1 // 128
    r2 = h2 // _n_strips_static
    # P1 rows needed per strip = 2*r2+1 (one-row halo recompute); rounded
    # up to a sublane-tile multiple — Mosaic's relayouts for the
    # [rows, G*128] -> [rows*G, 128] merge crash the v5e compiler at
    # 640^2 when rows is odd (81), and are fastest tile-aligned
    rr = (2 * r2 + 1 + 15) // 16 * 16

    t = pl.program_id(1)

    # zero the P1 borders (top pad row for strip 0, left pad cell, right
    # pad cells) — read back as the P2 conv's zero padding
    p1_ref[...] = jnp.zeros(p1_ref.shape, p1_ref.dtype)

    xs = xs_ref[0, 0]
    # conv0: local P1p rows u in [0, rr) (= global P1p rows 2*i0+u; the
    # P1 value for global row r lives at u = r - 2*i0 + 1). Local row u
    # reads xs_ref rows u+dy — for the first strip u=0 computes garbage
    # from the zero pad row and is re-zeroed below.
    acc = None
    for dy in range(2):
        blk = xs[dy : dy + rr]  # [rr, (G0+1)*128]
        pa = blk[:, : g0 * 128].reshape(rr * g0, 128)
        pb = blk[:, 128 : (g0 + 1) * 128].reshape(rr * g0, 128)
        y = _mm(pa, w0_ref[2 * dy]) + _mm(pb, w0_ref[2 * dy + 1])
        acc = y if acc is None else acc + y
    acc = acc + b0_ref[...]
    acc = acc * jax.nn.sigmoid(acc)  # SiLU, f32
    # P1 is stored PAIR-INTERLEAVED: scratch row a holds P1p rows 2a
    # (lanes [0, lp)) and 2a+1 (lanes [lp, 2*lp)). Extracting both
    # parities of one sublane-split reshape crashes this v5e Mosaic
    # compiler (probed: a [rows, 2, L] reshape of the scratch is fine
    # until BOTH [:, 0] and [:, 1] are consumed); the pair layout needs
    # only plain 128-aligned 2-D lane slices. The [rr, L] -> [rr//2, 2L]
    # value reshape below is an aligned sublane-pair -> lane merge.
    lp = (g1 + 1) * 128
    l0 = g0 * 128
    acc2 = acc.astype(p1_ref.dtype).reshape(rr // 2, 2 * l0)
    p1_ref[:, c0 : c0 + l0] = acc2[:, :l0]
    p1_ref[:, lp + c0 : lp + c0 + l0] = acc2[:, l0 : 2 * l0]

    @pl.when(t == 0)
    def _zero_top():  # global P1p row 0 is the conv's zero top pad
        p1_ref[0:1, 0:lp] = jnp.zeros((1, lp), p1_ref.dtype)

    # conv1: P2 row i (local, 0..r2-1) reads local P1p rows 2i+ky =
    # scratch row i + (ky>>1), lane half ky&1
    p1 = p1_ref[...]
    acc = None
    for ky in range(3):
        blk = p1[(ky >> 1) : (ky >> 1) + r2]
        base = (ky & 1) * lp
        pa = blk[:, base : base + g1 * 128].reshape(r2 * g1, 128)
        pb = blk[:, base + 128 : base + (g1 + 1) * 128].reshape(r2 * g1, 128)
        y = _mm(pa, w1_ref[2 * ky]) + _mm(pb, w1_ref[2 * ky + 1])
        acc = y if acc is None else acc + y
    acc = acc + b1_ref[...]
    acc = acc * jax.nn.sigmoid(acc)
    out_ref[0, :, :] = acc.astype(out_ref.dtype).reshape(r2, g1 * 128)


def fused_stem_p1p2(
    x: jnp.ndarray,
    p0: Dict,
    p1: Dict,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, H, W, 3] (compute dtype, pixel scale — the engine's stem-
    folded weights absorb BGR flip and /255). p0/p1: the node-0/node-1
    conv param dicts ({"w": [3,3,ci,co] HWIO, "b": [co]}). Returns the
    node-1 output [B, H//4, W//4, c1] with conv+BN-fold+SiLU applied to
    both levels, equal to conv_act(p1, conv_act(p0, x, stride=2),
    stride=2) up to bf16/f32 accumulation order."""
    from ..models.layers import get_weight
    from ..models.s2d import space_to_depth

    b, h, w, cin = x.shape
    assert cin == 3, "fused stem expects a 3-channel input"
    dtype = x.dtype
    w0 = get_weight(p0, dtype)
    w1 = get_weight(p1, dtype)
    c0, c1 = w0.shape[-1], w1.shape[-1]
    assert stem_geometry_ok(h, w, c0, c1), (h, w, c0, c1)
    h1, w1_ = h // 2, w // 2
    h2, w2 = h // 4, w // 4
    g0 = w1_ * c0 // 128
    g1 = w2 * c1 // 128
    ns = _n_strips(h2)
    r2 = h2 // ns
    rr = (2 * r2 + 1 + 15) // 16 * 16

    # s2d(2) of the zero-padded input; cells zero-padded to c0 channels,
    # flattened into lanes, lane-padded so the part-1 (shifted) slice
    # stays in bounds; one extra zero TOP row so every strip's DMA window
    # [2*i0, 2*i0 + 2*r2+2) is in range
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = space_to_depth(xp, 2)  # [B, h1+1, w1_+1, 12]
    # +1 zero top row (strip DMA windows start at 2*i0) and enough bottom
    # zero rows that the last strip's tile-rounded window stays in range
    xrows = 2 * r2 * (ns - 1) + rr + 1
    xs = jnp.pad(xs, ((0, 0), (1, xrows - (h1 + 2)), (0, 0), (0, c0 - 12)))
    xs = xs.reshape(b, xrows, (w1_ + 1) * c0)
    lx = (g0 + 1) * 128
    if xs.shape[-1] < lx:
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, lx - xs.shape[-1])))
    # haloed strips materialized by XLA (see module docstring: overlapping
    # VMEM blocks are not expressible, manual DMA crashes this toolchain)
    xs = jnp.stack(
        [xs[:, 2 * r2 * t : 2 * r2 * t + rr + 1] for t in range(ns)], axis=1
    )  # [B, ns, rr+1, lx]

    # piece weights: conv0 = k2 s1 over cells (c0 chans); conv1 = k3,
    # column stride 2 over P1 cells
    w0c = _s2d_stem_weight(w0, c0)  # [2, 2, c0, c0]
    w0p = jnp.stack(
        [_piece_weights(w0c[dy], c0, 1)[part]
         for dy in range(2) for part in range(2)]
    )  # [4, 128, 128]
    w1p = jnp.stack(
        [_piece_weights(w1[ky], c0, 2)[part]
         for ky in range(3) for part in range(2)]
    )  # [6, 128, 128]

    def btile(p, c, gn):
        v = p.get("b")
        v = (jnp.zeros((c,), jnp.float32) if v is None
             else v.astype(jnp.float32))
        return jnp.tile(v, gn)[None, :]  # [1, 128], (col s, chan) order

    b0t = btile(p0, c0, 128 // c0)
    b1t = btile(p1, c1, 128 // c1)

    lp = (g1 + 1) * 128
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c0=c0, c1=c1,
                          _n_strips_static=ns),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2 * c1), dtype),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, 1, rr + 1, lx), lambda i, t: (i, t, 0, 0)),
            pl.BlockSpec((4, 128, 128), lambda i, t: (0, 0, 0)),
            pl.BlockSpec((1, 128), lambda i, t: (0, 0)),
            pl.BlockSpec((6, 128, 128), lambda i, t: (0, 0, 0)),
            pl.BlockSpec((1, 128), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r2, w2 * c1), lambda i, t: (i, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((rr // 2, 2 * lp), dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xs, w0p.astype(dtype), b0t, w1p.astype(dtype), b1t)
    return out.reshape(b, h2, w2, c1)

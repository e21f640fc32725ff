"""Batched row gather as a two-level one-hot contraction (Pallas, TPU).

``take_along_axis`` on TPU lowers to element-serial gathers — the profile
of the fused detect step shows the NMS payload gathers (top-K boxes/classes
and the final compaction) costing ~1.9 ms/step at 1.5 GiB/s, nearly as much
as the whole backbone. A gather is a one-hot matmul, and the MXU is the
fastest memory mover on the chip — but a flat one-hot [K, M] contraction
wastes M/K of its FLOPs. Splitting the index arithmetic makes it cheap:

    idx = t * 128 + o        (t = lane-tile id, o = offset within the tile)

  stage 1 — tile gather:  rows [K, 128*B] = onehot_t [K, M/128] (int8) @
                          payload-bytes viewed as [M/128, 128*B] (int8),
                          int32 accumulation on the MXU;
  stage 2 — offset select: zero every column whose offset != o, then fold
                          the 128 offset groups pairwise (7 halvings) — each
                          surviving column is one byte + zeros, so integer
                          adds reconstruct it exactly.

Exactness: the MXU multiplies floats in bf16, which would round an f32
payload (~1e-3 relative — ~half-pixel box error at 640 px). So the payload
is BITCAST to bytes and gathered with an int8 x int8 -> int32 matmul: a
one-hot times a byte accumulates the byte exactly, and the output bytes
bitcast back to float32 untouched. Bit-exact for any payload values
(verified against the NumPy oracle in tests/test_pallas_gather.py, which
runs the same kernel in interpret mode).

~9 int-GOP for [128, 8400, 5] -> [128, 512, 5] — measured ~0.2 ms vs
~1.9 ms for the XLA gathers it replaces in the detect step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_ELEM = 4  # bytes per f32 payload element


def _gather_kernel(idx_ref, bytes_ref, out_ref, *, m_tiles: int, bpr: int):
    """bpr = bytes per payload row (p_pad * 4, a power of two)."""
    k = idx_ref.shape[-1]
    idx = idx_ref[0, 0].reshape(k, 1)  # [K, 1] int32 (2D: TPU dislikes 1D)
    t = (idx // LANE).astype(jnp.int32)  # [K, 1] tile ids
    o = (idx % LANE).astype(jnp.int32)  # [K, 1] offsets

    # stage 1: int8 one-hot over tiles @ byte tiles -> exact int32 rows
    tiles_iota = jax.lax.broadcasted_iota(jnp.int32, (k, m_tiles), 1)
    onehot_t = (t == tiles_iota).astype(jnp.int8)
    rows = jax.lax.dot_general(
        onehot_t,
        bytes_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [K, 128 * bpr]: row r = all bytes of the tile containing idx[r]

    # stage 2: keep only the bytes of offset o_r, then fold the 128 offset
    # groups pairwise. Columns are offset-major (o * bpr + byte), so each
    # halving adds columns bpr*half apart; after log2(128) folds only the
    # selected byte remains (everything else is 0 — integer adds are exact).
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (k, LANE * bpr), 1)
    masked = jnp.where(col_iota // bpr == o, rows, 0)
    width = LANE * bpr
    while width > bpr:
        width //= 2
        masked = masked[:, :width] + masked[:, width:2 * width]
    out_ref[0] = masked.astype(jnp.int8)  # low byte == the gathered byte


@functools.partial(jax.jit, static_argnames=("interpret", "mesh", "batch_axis"))
def pallas_row_gather(
    payload: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    interpret: bool = False,
    mesh=None,
    batch_axis: str = "dp",
) -> jnp.ndarray:
    """out[n, j, q] = payload[n, idx[n, j], q] — bit-exact, MXU-based.

    payload: [N, M, P] float32; idx: [N, K] int32 with 0 <= idx < M.
    Returns [N, K, P] float32.

    The grid is the batch dim, so the kernel is embarrassingly parallel
    along N. Under a device mesh (``mesh`` given) the call is wrapped in
    ``jax.shard_map`` over ``batch_axis``: each device runs the single-chip
    Mosaic kernel on its local batch shard (N must be a multiple of the
    axis size — the engine's mesh bucket rounding guarantees it), and the
    mesh serving path keeps the MXU gather instead of falling back to
    XLA's element-serial one.
    """
    if mesh is not None and batch_axis in mesh.shape:
        from jax.sharding import PartitionSpec as P

        inner = functools.partial(pallas_row_gather, interpret=interpret)
        spec = P(batch_axis)
        return jax.shard_map(
            inner, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
            check_vma=False,
        )(payload, idx)
    n, m, p = payload.shape
    k = idx.shape[1]
    payload = payload.astype(jnp.float32)
    m_tiles = -(-m // LANE)
    if m_tiles * LANE != m:
        payload = jnp.pad(payload, ((0, 0), (0, m_tiles * LANE - m), (0, 0)))
    # the offset fold halves the 128 offset groups (a power of two), so any
    # bytes-per-row works — no column padding, the dot width stays minimal
    bpr = p * _ELEM
    # [N, M, P, 4] bytes -> offset-major tile view [N, m_tiles, 128 * bpr]
    as_bytes = jax.lax.bitcast_convert_type(payload, jnp.uint8)
    tiles = jax.lax.bitcast_convert_type(
        as_bytes.reshape(n, m_tiles, LANE * bpr), jnp.int8
    )
    kernel = functools.partial(_gather_kernel, m_tiles=m_tiles, bpr=bpr)
    out_bytes = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            # idx rides as [N, 1, K]: a (1, 1, K) block keeps the last two
            # dims equal to the array dims (TPU block-shape constraint)
            pl.BlockSpec(
                (1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, m_tiles, LANE * bpr), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, k, bpr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, k, bpr), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k * m_tiles * LANE * bpr,
            bytes_accessed=n * (m_tiles * LANE * bpr + k * 4 + k * bpr),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None, :], tiles)
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(out_bytes, jnp.uint8).reshape(
            n, k, p, _ELEM
        ),
        jnp.float32,
    )


def row_gather_reference(payload: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """NumPy oracle for tests."""
    return np.take_along_axis(
        np.asarray(payload), np.asarray(idx)[..., None], axis=1
    )

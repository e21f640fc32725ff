"""Space-to-depth (s2d) early-backbone transform for TPU lane efficiency.

Why: the first YOLO stage runs at 320x320x16 / 160x160x32 — channel-minor
TPU layouts put those 16/32 channels in the 128-lane minor dimension, so
every HBM tile is 87.5%/75% empty. A jax.profiler trace of the b=128 fused
detect step shows the conv consuming the stem output running at
154 GB/s (vs ~900 peak) purely from that lane waste — ~4.3 ms of the
16.5 ms step sits in the sub-128-channel region.

Fix: run the whole P1/P2 stage in space-to-depth layout. s2d(f) folds each
f x f spatial block into channels, so the stem stage tensors become
[N, 160, 160, 48] -> [N, 160, 160, 64] -> [N, 80, 80, 128] — 37-100% lane
utilization instead of 2-25%. Every conv in the region has an EXACT
equivalent conv over the s2d tensors whose weight is the original weight
scattered by two constant 0/1 phase matrices (one per spatial axis):

    out s-row Y, output phase q, original tap t (offset from center):
        original input row  r = stride*(fo*Y + q) + t
        s2d input position  (s-row r // fi, phase r % fi)

  so  w'[wy, wx, ci*fi^2 + py*fi + px, co*fo^2 + qy*fo + qx]
        = w[t_y + pad, t_x + pad, ci, co]
  for the (window, phase) pairs the mapping hits; everything else is zero.

The transform is one einsum per conv, applied to the traced params inside
jit (weights are tiny; the einsum is nanoseconds). Exact up to f32/bf16
accumulation order — the phase matrices are 0/1, no arithmetic touches the
weight values. 1x1 convs degenerate to phase-diagonal block weights, so
C2f/C3 split/concat semantics survive unchanged in the channel-major
(c * fi^2 + phase) ordering.

Cost/benefit — MEASURED OUTCOME (v5e, b=128 fused step): 17.8 ms with s2d
vs 16.5 ms without. Scattering dilutes FLOPs (a k3 s2 conv becomes k3 over
4x channels: 4x the MACs) and XLA runs the scattered convs at 54-80
TFLOP/s, so the dilution outweighs the lane-density win; the u8 input
chain also gains a transpose (+0.6 ms). Default is therefore OFF
(`detector.s2d_backbone: on` forces it). The transform is kept — exact,
fully tested — because the trade flips wherever HBM bandwidth per FLOP is
scarcer than on v5e or the early stage is narrower still.

Reference point: the reference has no equivalent (its backends consume
NCHW and the vendor runtimes handle layout); this is a TPU-specific
layout-domain optimization, cited from the SURVEY §6 perf-first mandate.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .layers import get_weight, silu


def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/f, W/f, C*f*f], channel-major (c*f*f + py*f + px)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h // f, w // f, c * f * f)


def depth_to_space(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (tests / debugging)."""
    n, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(n, h, w, c, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * f, w * f, c)


@functools.lru_cache(maxsize=None)
def _phase_matrix(
    k: int, pad: int, stride: int, fi: int, fo: int
) -> Tuple[np.ndarray, int, Tuple[int, int]]:
    """One-axis tap->(window, phase) scatter matrix M[k', fi, fo, k].

    Returns (M, s-grid stride, (pad_lo, pad_hi)). The derived conv reads
    input s-rows  S'*Y + win  for win in [wmin, wmax]; pad_hi follows from
    requiring the s-grid output length H/S' (= wmax - S' + 1, independent
    of H).
    """
    assert stride * fo % fi == 0, "incompatible s2d factors"
    sp = stride * fo // fi
    vs = [stride * q + (a - pad) for q in range(fo) for a in range(k)]
    wmin = min(v // fi for v in vs)
    wmax = max(v // fi for v in vs)
    kp = wmax - wmin + 1
    m = np.zeros((kp, fi, fo, k), np.float32)
    for q in range(fo):
        for a in range(k):
            v = stride * q + (a - pad)
            m[v // fi - wmin, v % fi, q, a] = 1.0
    return m, sp, (-wmin, wmax - sp + 1)


def s2d_conv_weight(
    w: jnp.ndarray, fi: int, fo: int, stride: int, pad: Optional[int] = None
) -> Tuple[jnp.ndarray, int, Tuple[int, int]]:
    """Scatter an original conv weight [kh, kw, ci, co] into its s2d
    equivalent [k', k', ci*fi^2, co*fo^2]; returns (w', stride', padding)."""
    kh, kw, ci, co = w.shape
    pad_ = kh // 2 if pad is None else pad
    my, sp, padding = _phase_matrix(kh, pad_, stride, fi, fo)
    mx, _, _ = _phase_matrix(kw, pad_, stride, fi, fo)
    myj = jnp.asarray(my, w.dtype)
    mxj = jnp.asarray(mx, w.dtype)
    # [kh,kw,ci,co] x [k'y,py,qy,kh] x [k'x,px,qx,kw]
    #   -> [k'y, k'x, ci, py, px, co, qy, qx]
    wp = jnp.einsum("abcd,eufa,gvhb->egcuvdfh", w, myj, mxj)
    kpy, kpx = my.shape[0], mx.shape[0]
    return wp.reshape(kpy, kpx, ci * fi * fi, co * fo * fo), sp, padding


def s2d_conv_act(
    p: Dict,
    x: jnp.ndarray,
    *,
    fi: int,
    fo: int,
    stride: int = 1,
    pad: Optional[int] = None,
    act: bool = True,
) -> jnp.ndarray:
    """conv + SiLU over s2d tensors, exactly equal (up to accumulation
    order) to ``conv_act`` on the depth-to-space'd input."""
    import jax

    w = get_weight(p, x.dtype)
    wp, sp, padding = s2d_conv_weight(w, fi, fo, stride, pad)
    out = jax.lax.conv_general_dilated(
        x,
        wp,
        window_strides=(sp, sp),
        padding=(padding, padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = p.get("b")
    if b is not None:
        out = out + jnp.repeat(b.astype(out.dtype), fo * fo)
    return silu(out) if act else out


def _bottleneck_s2d(p: Dict, x: jnp.ndarray, shortcut: bool, fi: int) -> jnp.ndarray:
    y = s2d_conv_act(p["cv1"], x, fi=fi, fo=fi, stride=1)
    y = s2d_conv_act(p["cv2"], y, fi=fi, fo=fi, stride=1)
    return x + y if shortcut and x.shape[-1] == y.shape[-1] else y


def c2f_s2d(p: Dict, x: jnp.ndarray, n: int, shortcut: bool, fi: int) -> jnp.ndarray:
    """C2f over an s2d tensor: channel-major layout keeps split/concat
    block-aligned, 1x1 convs become phase-diagonal via the same scatter."""
    y = s2d_conv_act(p["cv1"], x, fi=fi, fo=fi, stride=1)
    a, b = jnp.split(y, 2, axis=-1)
    ys = [a, b]
    cur = b
    for j in range(n):
        cur = _bottleneck_s2d(p["m"][j], cur, shortcut, fi)
        ys.append(cur)
    return s2d_conv_act(p["cv2"], jnp.concatenate(ys, axis=-1), fi=fi, fo=fi, stride=1)


def c3_s2d(p: Dict, x: jnp.ndarray, n: int, shortcut: bool, fi: int) -> jnp.ndarray:
    a = s2d_conv_act(p["cv1"], x, fi=fi, fo=fi, stride=1)
    b = s2d_conv_act(p["cv2"], x, fi=fi, fo=fi, stride=1)
    for j in range(n):
        a = _bottleneck_s2d(p["m"][j], a, shortcut, fi)
    return s2d_conv_act(
        p["cv3"], jnp.concatenate([a, b], axis=-1), fi=fi, fo=fi, stride=1
    )

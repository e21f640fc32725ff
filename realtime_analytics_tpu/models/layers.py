"""Functional conv building blocks (NHWC / HWIO, BN folded).

These are the primitives shared by the YOLO, ResNet and temporal models.
Everything is a pure function over a params pytree:

    params for a fused conv: {"w": [kh, kw, cin//groups, cout], "b": [cout]}

BatchNorm never exists at inference time — checkpoint loaders fold it into
the conv weight/bias (see ``weights.py``), which is both faster on TPU (one
fused op) and simpler to shard.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")


def get_weight(params: dict, dtype=None) -> jnp.ndarray:
    """Materialize a conv/dense weight from params.

    Supports the weight-only int8 format produced by
    ``weights.quantize_params_int8``: {"w_q": int8 [..., O],
    "w_scale": [O]} — dequantization fuses into the consuming conv/dot, so
    HBM reads stay int8 (half of bf16, quarter of f32)."""
    if "w_q" in params:
        w = params["w_q"].astype(jnp.bfloat16) * params["w_scale"].astype(
            jnp.bfloat16
        )
        return w.astype(dtype) if dtype is not None else w
    w = params["w"]
    return w.astype(dtype) if dtype is not None else w


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    groups: int = 1,
    padding: Optional[int] = None,
) -> jnp.ndarray:
    """2D conv with torch-style symmetric padding (default k//2 "autopad")."""
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = kh // 2
    # bf16 inputs -> bf16 outputs: the MXU still accumulates partial sums in
    # f32 internally, but emitting bf16 halves every activation tensor in
    # HBM (the v8n forward is bandwidth-bound: 13.3 GB accessed per batch-32
    # step with f32 intermediates). f32 inputs keep f32 for exactness.
    out_dtype = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)) if isinstance(padding, int)
        else padding,
        dimension_numbers=DN,
        feature_group_count=groups,
        preferred_element_type=out_dtype,
    )
    if b is not None:
        out = out + b.astype(out_dtype)
    return out.astype(x.dtype)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


# Eager-mode calibration sink: maps id(conv params node) -> max |input|.
# Enabled only by weights.calibrate_int8_activations (never inside jit).
_calibration_sink: Optional[dict] = None


def conv2d_int8(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: Optional[int] = None,
    act_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full int8 conv: int8 x int8 -> int32 on the MXU, dequantized with
    (activation scale x per-channel weight scale). The TPU-native analog of
    the reference's RKNN uint8 NPU path (detector.py:705-869).

    ``act_scale``: static calibrated per-tensor scale (preferred — no extra
    pass over the activations); falls back to dynamic per-batch max."""
    kh = w_q.shape[0]
    if padding is None:
        padding = kh // 2
    x_f = x.astype(jnp.float32)
    if act_scale is None:
        act_scale = jnp.maximum(jnp.max(jnp.abs(x_f)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x_f / act_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq,
        w_q,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=DN,
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (act_scale * w_scale.astype(jnp.float32))
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def conv_act(params: dict, x: jnp.ndarray, *, stride: int = 1, groups: int = 1,
             padding: Optional[int] = None, act: bool = True,
             act_int8: bool = False) -> jnp.ndarray:
    """YOLO "Conv" block: conv + (folded BN) + SiLU."""
    if _calibration_sink is not None:  # eager calibration pass only
        key = id(params)
        cur = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
        _calibration_sink[key] = max(_calibration_sink.get(key, 0.0), cur)
    if act_int8 and "w_q" in params:
        y = conv2d_int8(x, params["w_q"], params["w_scale"], params.get("b"),
                        stride=stride, padding=padding,
                        act_scale=params.get("a_scale"))
    else:
        y = conv2d(x, get_weight(params, x.dtype), params.get("b"),
                   stride=stride, groups=groups, padding=padding)
    return silu(y) if act else y


def max_pool(x: jnp.ndarray, k: int, stride: int = 1) -> jnp.ndarray:
    """Max pooling with torch-parity padding: odd kernels autopad k//2
    (SPPF passes MaxPool2d(k, padding=k//2) explicitly; torchvision
    ResNet uses (3, stride 2, pad 1)), EVEN kernels pad 0 — torch's
    MaxPool2d default, and what anyone writing nn.MaxPool2d(2) gets; a
    k//2 pad there would add degenerate one-pixel edge windows and make
    2x pooling produce H/2+1."""
    pad = k // 2 if k % 2 else 0
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (torch nn.Upsample(scale_factor=2))."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def avg_pool_global(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_conv(
    key: jax.Array, cin: int, cout: int, k: int, *, groups: int = 1
) -> dict:
    """He-normal conv + zero bias (the post-BN-fold parameter shape)."""
    fan_in = cin // groups * k * k
    std = float(np.sqrt(2.0 / max(1, fan_in)))
    w = jax.random.normal(key, (k, k, cin // groups, cout), dtype=jnp.float32) * std
    return {"w": w, "b": jnp.zeros((cout,), dtype=jnp.float32)}


def make_divisible(v: float, divisor: int = 8) -> int:
    """Round channel counts up to a multiple of ``divisor`` (matches the
    channel arithmetic of published YOLO configs)."""
    return int(np.ceil(v / divisor) * divisor)


def split_keys(key: jax.Array, n: int) -> Sequence[jax.Array]:
    return jax.random.split(key, n)


def cast_tree(params, dtype) -> dict:
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )

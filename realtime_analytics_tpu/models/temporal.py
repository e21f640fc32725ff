"""Temporal action-recognition models as lax.scan clip pipelines.

Capability parity with the reference's temporal family
(temporal_detector.py:150-800: CNN-LSTM, 3D-CNN, ConvGRU, plus SlowFast
served by the 3D-CNN class per detector.py:71-74), designed TPU-first:

  * recurrent models (LSTM / ConvGRU) scan over the clip axis with
    ``jax.lax.scan`` — one compiled graph regardless of sequence length;
  * 3D-CNN / SlowFast use ``lax.conv_general_dilated`` over NDHWC — time is
    just another spatial dim for the MXU;
  * all models take [N, T, H, W, 3] ImageNet-normalized RGB clips and return
    action logits [N, num_classes];
  * ``temporal_pooling`` (avg | max | last) is actually applied to the
    per-step recurrent outputs (the reference validates the knob but never
    uses it — config.py:148, fixed here).

The reference's production story for these models is ONNX exports of the
demo architectures in scripts/convert_temporal_model_to_onnx.py:34-121;
these JAX models fill the same role natively.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .layers import conv2d, init_conv, max_pool

DN3D = ("NDHWC", "DHWIO", "NDHWC")


def _dense(key, cin, cout):
    w = jax.random.normal(key, (cin, cout), jnp.float32) * (1.0 / jnp.sqrt(cin))
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _apply_dense(p, x):
    return x @ p["w"] + p["b"]


def _conv3d(x, w, b=None, stride=(1, 1, 1), padding=None):
    kd, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    if padding is None:
        padding = ((kd // 2, kd // 2), (kh // 2, kh // 2), (kw // 2, kw // 2))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=DN3D, preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def _init_conv3d(key, cin, cout, k: Tuple[int, int, int]):
    fan_in = cin * k[0] * k[1] * k[2]
    std = float(jnp.sqrt(2.0 / max(1, fan_in)))
    w = jax.random.normal(key, (*k, cin, cout), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _pool3d(x, k=(1, 2, 2), s=None):
    s = s or k
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, *k, 1), window_strides=(1, *s, 1),
        padding="VALID",
    )


def _frame_encoder_init(key, width: int = 64, out_dim: int = 256):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "c1": init_conv(k1, 3, width, 3),
        "c2": init_conv(k2, width, width * 2, 3),
        "c3": init_conv(k3, width * 2, width * 4, 3),
        "proj": _dense(k4, width * 4, out_dim),
    }


def _frame_encoder(p, x):
    """[N, H, W, 3] -> [N, out_dim] conv stack + GAP."""
    y = jax.nn.relu(conv2d(x, p["c1"]["w"], p["c1"]["b"], stride=2))
    y = max_pool(y, 2, stride=2)
    y = jax.nn.relu(conv2d(y, p["c2"]["w"], p["c2"]["b"], stride=2))
    y = jax.nn.relu(conv2d(y, p["c3"]["w"], p["c3"]["b"], stride=2))
    y = jnp.mean(y, axis=(1, 2))
    return jax.nn.relu(_apply_dense(p["proj"], y))


def _pool_steps(outputs: jnp.ndarray, pooling: str) -> jnp.ndarray:
    """outputs: [T, N, D] -> [N, D] per temporal_pooling."""
    if pooling == "avg":
        return jnp.mean(outputs, axis=0)
    if pooling == "max":
        return jnp.max(outputs, axis=0)
    return outputs[-1]  # "last"


# ---------------------------------------------------------------------------
# CNN-LSTM
# ---------------------------------------------------------------------------


@dataclass
class CNNLSTM:
    num_classes: int
    hidden: int = 256
    feat: int = 256
    pooling: str = "avg"

    def init_params(self, key: jax.Array) -> Dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "encoder": _frame_encoder_init(k1, out_dim=self.feat),
            "lstm": {
                "wx": jax.random.normal(k2, (self.feat, 4 * self.hidden)) * 0.05,
                "wh": jax.random.normal(k3, (self.hidden, 4 * self.hidden)) * 0.05,
                "b": jnp.zeros((4 * self.hidden,)),
            },
            "fc": _dense(k4, self.hidden, self.num_classes),
        }

    def apply(self, params: Dict, clips: jnp.ndarray) -> jnp.ndarray:
        """clips: [N, T, H, W, 3] -> logits [N, num_classes]."""
        n, t = clips.shape[0], clips.shape[1]
        frames = clips.reshape(n * t, *clips.shape[2:])
        feats = _frame_encoder(params["encoder"], frames).reshape(n, t, -1)
        feats = jnp.swapaxes(feats, 0, 1)  # [T, N, F]

        lstm = params["lstm"]
        h0 = jnp.zeros((n, self.hidden), feats.dtype)
        c0 = jnp.zeros((n, self.hidden), feats.dtype)

        def cell(carry, x_t):
            h, c = carry
            gates = x_t @ lstm["wx"] + h @ lstm["wh"] + lstm["b"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        (_, _), hs = jax.lax.scan(cell, (h0, c0), feats)
        pooled = _pool_steps(hs, self.pooling)
        return _apply_dense(params["fc"], pooled.astype(jnp.float32))


# ---------------------------------------------------------------------------
# ConvGRU
# ---------------------------------------------------------------------------


@dataclass
class ConvGRU:
    num_classes: int
    hidden_ch: int = 64
    pooling: str = "avg"

    def init_params(self, key: jax.Array) -> Dict:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        hc = self.hidden_ch
        return {
            "stem": init_conv(k1, 3, hc, 3),
            # gates operate on [x ; h] concatenated channels
            "zr": init_conv(k2, 2 * hc, 2 * hc, 3),
            "hcand": init_conv(k3, 2 * hc, hc, 3),
            "head": init_conv(k4, hc, 2 * hc, 3),
            "fc": _dense(k5, 2 * hc, self.num_classes),
        }

    def apply(self, params: Dict, clips: jnp.ndarray) -> jnp.ndarray:
        n, t = clips.shape[0], clips.shape[1]
        frames = clips.reshape(n * t, *clips.shape[2:])
        # stride-4 spatial reduction before recurrence
        enc = jax.nn.relu(
            conv2d(frames, params["stem"]["w"], params["stem"]["b"], stride=2)
        )
        enc = max_pool(enc, 2, stride=2)

        hc = self.hidden_ch
        # The gate convs act on [x ; h] concatenated channels (the layout
        # checkpoints ship, kept verbatim in params) — but conv([x;h], W)
        # = conv(x, W[:, :, :hc]) + conv(h, W[:, :, hc:]), and only the
        # h-half is sequential. Hoist the x-half of BOTH gates out of the
        # scan into one [N*T]-batched conv (MXU-sized, parallel over time);
        # the scan then runs half-width convs: ~2x less sequential FLOPs,
        # numerically the same sums (measured 4.6 -> ~2.7 ms on the b=4
        # serving bucket, bench section 3).
        wzr, bzr = params["zr"]["w"], params["zr"]["b"]
        wcand, bcand = params["hcand"]["w"], params["hcand"]["b"]
        zr_x = conv2d(enc, wzr[:, :, :hc], bzr)
        cand_x = conv2d(enc, wcand[:, :, :hc], bcand)

        def unfold(a):  # [N*T, h, w, C] -> [T, N, h, w, C]
            return jnp.swapaxes(a.reshape(n, t, *a.shape[1:]), 0, 1)

        zr_x, cand_x = unfold(zr_x), unfold(cand_x)

        def cell(h, xs):
            zr_xt, cand_xt = xs
            zr = jax.nn.sigmoid(zr_xt + conv2d(h, wzr[:, :, hc:]))
            z, r = jnp.split(zr, 2, axis=-1)
            cand = jnp.tanh(cand_xt + conv2d(r * h, wcand[:, :, hc:]))
            h_new = (1.0 - z) * h + z * cand
            return h_new, h_new

        h0 = jnp.zeros((n, *zr_x.shape[2:4], hc), enc.dtype)
        _, hs = jax.lax.scan(cell, h0, (zr_x, cand_x))  # [T, N, h, w, C]
        pooled_t = _pool_steps(hs, self.pooling)  # [N, h, w, C]
        y = jax.nn.relu(
            conv2d(pooled_t, params["head"]["w"], params["head"]["b"], stride=2)
        )
        y = jnp.mean(y, axis=(1, 2))
        return _apply_dense(params["fc"], y.astype(jnp.float32))


# ---------------------------------------------------------------------------
# 3D CNN
# ---------------------------------------------------------------------------


@dataclass
class CNN3D:
    num_classes: int
    width: int = 64

    def init_params(self, key: jax.Array) -> Dict:
        w = self.width
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        return {
            "c1": _init_conv3d(k1, 3, w, (3, 3, 3)),
            "c2": _init_conv3d(k2, w, w * 2, (3, 3, 3)),
            "c3": _init_conv3d(k3, w * 2, w * 4, (3, 3, 3)),
            "c4": _init_conv3d(k4, w * 4, w * 4, (3, 3, 3)),
            "fc": _dense(k5, w * 4, self.num_classes),
        }

    def apply(self, params: Dict, clips: jnp.ndarray) -> jnp.ndarray:
        """clips: [N, T, H, W, 3] (time = depth axis)."""
        y = jax.nn.relu(_conv3d(clips, params["c1"]["w"], params["c1"]["b"]))
        y = _pool3d(y, (1, 2, 2))
        y = jax.nn.relu(_conv3d(y, params["c2"]["w"], params["c2"]["b"]))
        y = _pool3d(y, (2, 2, 2))
        y = jax.nn.relu(_conv3d(y, params["c3"]["w"], params["c3"]["b"]))
        y = _pool3d(y, (2, 2, 2))
        y = jax.nn.relu(_conv3d(y, params["c4"]["w"], params["c4"]["b"]))
        y = jnp.mean(y, axis=(1, 2, 3))
        return _apply_dense(params["fc"], y.astype(jnp.float32))


# ---------------------------------------------------------------------------
# SlowFast (two-pathway 3D CNN)
# ---------------------------------------------------------------------------


@dataclass
class SlowFast:
    num_classes: int
    alpha: int = 4  # slow pathway samples every alpha-th frame
    slow_width: int = 64
    fast_width: int = 8

    def _pathway_init(self, key, width):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "c1": _init_conv3d(k1, 3, width, (1, 3, 3)),
            "c2": _init_conv3d(k2, width, width * 2, (3, 3, 3)),
            "c3": _init_conv3d(k3, width * 2, width * 4, (3, 3, 3)),
        }

    def init_params(self, key: jax.Array) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "slow": self._pathway_init(k1, self.slow_width),
            "fast": self._pathway_init(k2, self.fast_width),
            "fc": _dense(k3, self.slow_width * 4 + self.fast_width * 4,
                         self.num_classes),
        }

    def _pathway(self, p, x):
        y = jax.nn.relu(_conv3d(x, p["c1"]["w"], p["c1"]["b"]))
        y = _pool3d(y, (1, 2, 2))
        y = jax.nn.relu(_conv3d(y, p["c2"]["w"], p["c2"]["b"]))
        y = _pool3d(y, (1, 2, 2))
        y = jax.nn.relu(_conv3d(y, p["c3"]["w"], p["c3"]["b"]))
        return jnp.mean(y, axis=(1, 2, 3))

    def apply(self, params: Dict, clips: jnp.ndarray) -> jnp.ndarray:
        slow_in = clips[:, :: self.alpha]
        fast_in = clips
        slow = self._pathway(params["slow"], slow_in)
        fast = self._pathway(params["fast"], fast_in)
        fused = jnp.concatenate([slow, fast], axis=-1)
        return _apply_dense(params["fc"], fused.astype(jnp.float32))


def build_temporal(model_type: str, num_classes: int, pooling: str = "avg"):
    if model_type == "cnn_lstm":
        return CNNLSTM(num_classes=num_classes, pooling=pooling)
    if model_type == "conv_gru":
        return ConvGRU(num_classes=num_classes, pooling=pooling)
    if model_type == "3d_cnn":
        return CNN3D(num_classes=num_classes)
    if model_type == "slow_fast":
        return SlowFast(num_classes=num_classes)
    raise ValueError(f"unsupported temporal model_type: {model_type}")

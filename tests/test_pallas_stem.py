"""Fused P1/P2 stem kernel (ops/pallas_stem.py) parity gates.

The kernel was MEASURED SLOWER than XLA's own stem fusion at b=128/640
on v5e (docs/performance.md "fused-stem kernel") and defaults off; these
interpret-mode gates keep the committed kernel correct so the measured
rejection stays reproducible (same policy as s2d_backbone@128 and
pallas_decode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtime_analytics_tpu.models.layers import conv_act
from realtime_analytics_tpu.ops.pallas_stem import (
    fused_stem_p1p2,
    stem_geometry_ok,
)


def _params(rng, c0, c1, dtype=np.float32):
    return (
        {"w": jnp.asarray(rng.normal(size=(3, 3, 3, c0)).astype(dtype)) * 0.2,
         "b": jnp.asarray(rng.normal(size=(c0,)).astype(dtype))},
        {"w": jnp.asarray(rng.normal(size=(3, 3, c0, c1)).astype(dtype)) * 0.2,
         "b": jnp.asarray(rng.normal(size=(c1,)).astype(dtype))},
    )


@pytest.mark.parametrize("h,w,c0,c1", [
    (32, 32, 16, 32),    # v8n-shaped, single strip
    (128, 128, 16, 32),  # strip path (4 strips engage at h2 % 32 == 0)
    (64, 32, 32, 64),    # v8s-shaped channels
    (48, 64, 16, 32),    # non-square
])
def test_matches_conv_chain_f32(h, w, c0, c1):
    rng = np.random.default_rng(0)
    p0, p1 = _params(rng, c0, c1)
    x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
    assert stem_geometry_ok(h, w, c0, c1)
    ref = conv_act(p1, conv_act(p0, x, stride=2, padding=1),
                   stride=2, padding=1)
    got = fused_stem_p1p2(x, p0, p1, interpret=True)
    assert got.shape == ref.shape
    rel = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 2e-5, rel


def test_bf16_close_to_bf16_chain():
    """bf16 weights/activations: the kernel's f32-accumulated pieces must
    stay at bf16 rounding distance of the XLA bf16 chain (the P1
    intermediate is bf16 in both)."""
    rng = np.random.default_rng(1)
    p0, p1 = _params(rng, 16, 32)
    p0 = {k: v.astype(jnp.bfloat16) for k, v in p0.items()}
    p1 = {k: v.astype(jnp.bfloat16) for k, v in p1.items()}
    x = jnp.asarray(
        rng.uniform(0, 255, size=(2, 64, 64, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = conv_act(p1, conv_act(p0, x, stride=2, padding=1),
                   stride=2, padding=1).astype(jnp.float32)
    got = fused_stem_p1p2(x, p0, p1, interpret=True).astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 2e-2, rel


def test_geometry_gate():
    assert not stem_geometry_ok(30, 32, 16, 32)   # h % 4
    assert not stem_geometry_ok(32, 32, 48, 32)   # 128 % c0
    assert not stem_geometry_ok(32, 32, 8, 32)    # c0 < 12
    assert stem_geometry_ok(640, 640, 16, 32)     # v8n serving shape
    assert stem_geometry_ok(640, 640, 32, 64)     # v8s


def test_model_apply_pallas_stem_path():
    """YoloModel.apply(pallas_stem='interpret') must route nodes 0+1
    through the kernel and match the plain path."""
    from realtime_analytics_tpu.models.yolo import build_yolo

    model = build_yolo("yolov8", "n", nc=8)
    params = model.init_params(jax.random.PRNGKey(0))
    model.fuse_neck = False
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    ref = model.apply(params, x, s2d=False)
    got = model.apply(params, x, s2d=False, pallas_stem="interpret")
    assert np.allclose(np.asarray(got["boxes_xyxy"]),
                       np.asarray(ref["boxes_xyxy"]), atol=1e-2)
    assert np.allclose(np.asarray(got["scores"]),
                       np.asarray(ref["scores"]), atol=1e-4)

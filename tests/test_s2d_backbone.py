"""Space-to-depth early-backbone equivalence (models/s2d.py).

The s2d prefix must be numerically equivalent (up to f32 accumulation
order) to the plain forward: the phase-scatter matrices are 0/1, so no
arithmetic touches weight values. Oracle: the plain apply path, which is
itself oracle-tested against the torch mirror (test_yolo_fidelity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_analytics_tpu.models.s2d import (
    depth_to_space,
    s2d_conv_act,
    space_to_depth,
)
from realtime_analytics_tpu.models.yolo import build_yolo


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 5)).astype(np.float32))
    for f in (2, 4):
        y = space_to_depth(x, f)
        assert y.shape == (2, 16 // f, 24 // f, 5 * f * f)
        np.testing.assert_array_equal(depth_to_space(y, f), x)


def test_s2d_channel_order(rng):
    """Channel-major (c*f^2 + py*f + px): splitting s2d channels in half
    splits the original channels in half — the C2f/C3 contract."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    y = space_to_depth(x, 2)
    a, b = jnp.split(y, 2, axis=-1)
    xa, xb = jnp.split(x, 2, axis=-1)
    np.testing.assert_array_equal(depth_to_space(a, 2), xa)
    np.testing.assert_array_equal(depth_to_space(b, 2), xb)


@pytest.mark.parametrize(
    "k,stride,pad,fi,fo",
    [
        (3, 2, None, 4, 2),  # v8 stem
        (6, 2, 2, 4, 2),  # v5 stem
        (3, 2, None, 2, 2),  # P2 conv
        (1, 1, None, 2, 2),  # block 1x1 (phase-diagonal)
        (3, 1, None, 2, 2),  # bottleneck 3x3
        (3, 2, None, 2, 1),  # exit conv (s2d -> normal)
    ],
)
def test_s2d_conv_matches_plain(rng, k, stride, pad, fi, fo):
    from realtime_analytics_tpu.models.layers import conv_act

    ci, co, h = 3, 8, 16
    p = {
        "w": jnp.asarray(rng.normal(size=(k, k, ci, co)).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.normal(size=(co,)).astype(np.float32)),
    }
    x = jnp.asarray(rng.normal(size=(2, h, h, ci)).astype(np.float32))
    ref = conv_act(p, x, stride=stride, padding=pad)
    got = s2d_conv_act(p, space_to_depth(x, fi), fi=fi, fo=fo, stride=stride, pad=pad)
    got = depth_to_space(got, fo) if fo > 1 else got
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("model_type", ["yolov8", "yolov5"])
def test_s2d_full_model_equivalence(model_type):
    m = build_yolo(model_type, "n", nc=80)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    m.s2d_backbone = False
    ref = m.apply(params, x)
    m.s2d_backbone = True
    assert m._s2d_prefix_ok()
    out = m.apply(params, x)
    for key in ref:
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]), atol=1e-3, rtol=1e-4
        )


def test_s2d_skipped_for_unaligned_input():
    """Inputs not divisible by 4 fall back to the plain path (no crash)."""
    m = build_yolo("yolov8", "n", nc=80)
    params = m.init_params(jax.random.PRNGKey(0))
    m.s2d_backbone = True
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 36, 3), jnp.float32)
    out = m.apply(params, x)
    assert out["boxes_xyxy"].shape[0] == 1


def test_engine_s2d_on_matches_off(rng):
    """Engine-level: forced-on s2d produces the plain path's detections."""
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    frames = rng.integers(0, 256, size=(2, 96, 128, 3), dtype=np.uint8)

    def run(mode):
        cfg = DetectorConfig(
            model_path="missing.pt",
            model_type="yolov8",
            input_size=[64, 64],
            max_batch_size=2,
            batch_buckets=[2],
            precision="fp32",
            confidence_threshold=0.0015,
            warmup=False,
            s2d_backbone=mode,
        )
        eng = JaxYoloEngine(cfg)
        assert eng._s2d_for_bucket(2) == (mode == "on")
        return eng.predict_arrays(frames)

    ref, got = run("off"), run("on")
    np.testing.assert_array_equal(ref.num_valid, got.num_valid)
    for i in range(len(ref.num_valid)):
        k = int(ref.num_valid[i])
        np.testing.assert_array_equal(ref.class_ids[i, :k], got.class_ids[i, :k])
        np.testing.assert_allclose(
            got.boxes_xyxy[i, :k], ref.boxes_xyxy[i, :k], atol=0.5
        )
        np.testing.assert_allclose(got.scores[i, :k], ref.scores[i, :k], atol=5e-3)


def test_s2d_bucket_policy():
    """auto enables s2d PER COMPILE BUCKET: small buckets win (lane waste
    and relayout thrash at b<128), b=128 loses (batch-minor layouts
    already fill lanes) — measured on v5e, docs/performance.md."""
    import types

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    eng = JaxYoloEngine(DetectorConfig(
        model_path="missing.pt", input_size=[64, 64], precision="fp32",
        warmup=False, s2d_backbone="auto",
    ))
    # auto off-TPU (CPU test env): off at any bucket
    assert not eng._s2d_for_bucket(16)
    # simulate the single-chip TPU decision without hardware
    eng.device = types.SimpleNamespace(platform="tpu")
    assert eng._s2d_for_bucket(16)
    assert eng._s2d_for_bucket(32)
    assert not eng._s2d_for_bucket(64)  # measured WORSE with s2d
    assert not eng._s2d_for_bucket(128)
    eng.config.s2d_backbone = "on"
    assert eng._s2d_for_bucket(128)
    eng.config.s2d_backbone = "off"
    assert not eng._s2d_for_bucket(16)

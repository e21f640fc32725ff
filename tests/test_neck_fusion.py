"""Neck upsample-concat fusion: the split 1x1 formulation must match the
materialized upsample+concat graph (exact math modulo f32 accumulation
order), for both YOLOv8 (c2f) and YOLOv5 (c3) necks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtime_analytics_tpu.models.yolo import build_yolo


@pytest.mark.parametrize("model_type", ["yolov8", "yolov5"])
def test_fused_neck_matches_unfused(model_type):
    model = build_yolo(model_type, "n", 16)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3), jnp.float32)

    fus = model._neck_fusions()
    assert len(fus) == 4, fus  # two (upsample, concat) junction pairs

    model.fuse_neck = True
    out_fused = jax.jit(lambda p, v: model.apply(p, v))(params, x)
    model.fuse_neck = False
    out_plain = jax.jit(lambda p, v: model.apply(p, v))(params, x)

    np.testing.assert_allclose(
        np.asarray(out_fused["boxes_xyxy"]),
        np.asarray(out_plain["boxes_xyxy"]),
        rtol=1e-4, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_fused["scores"]),
        np.asarray(out_plain["scores"]),
        rtol=1e-4, atol=1e-5,
    )


def test_fusion_disabled_for_int8():
    model = build_yolo("yolov8", "n", 8)
    model.act_int8 = True
    params = model.init_params(jax.random.PRNGKey(0))
    # int8 path ignores fusion (activation scales calibrate on the unsplit
    # concat input); apply must not crash and must take the plain path
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = model.apply(params, x)  # float params, act_int8 falls back cleanly
    assert out["boxes_xyxy"].shape[0] == 1

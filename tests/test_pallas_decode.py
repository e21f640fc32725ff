"""Fused v8 head-decode kernel vs the jnp oracle (ops/pallas_decode.py).

The oracle IS the pre-kernel decode path (models/yolo.py _detect_v8),
which is itself fidelity-tested against the torch mirror — so kernel ==
oracle ties the kernel to the published v8 decode contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_analytics_tpu.models.yolo import build_yolo
from realtime_analytics_tpu.ops.pallas_decode import (
    decode_v8_level,
    decode_v8_level_reference,
)


@pytest.mark.parametrize("h,w,nc", [(8, 8, 80), (4, 6, 17), (2, 2, 3)])
def test_decode_matches_oracle(rng, h, w, nc):
    box = jnp.asarray(
        rng.normal(0, 3, (2, h, w, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    cls = jnp.asarray(
        rng.normal(0, 3, (2, h, w, nc)).astype(np.float32)
    ).astype(jnp.bfloat16)
    got = decode_v8_level(box, cls, stride=8.0, interpret=True)
    ref = decode_v8_level_reference(box, cls, stride=8.0)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))


def test_decode_argmax_tie_breaks_first(rng):
    """Equal class logits resolve to the LOWEST class id, like jnp.argmax."""
    cls = jnp.zeros((1, 2, 2, 5), jnp.bfloat16)
    box = jnp.asarray(rng.normal(0, 1, (1, 2, 2, 64)).astype(np.float32))
    _, _, cid = decode_v8_level(box.astype(jnp.bfloat16), cls, stride=8.0,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(cid), 0)


def test_decode_extreme_logits_saturate(rng):
    """|logit| > 30 clips — softmax there is already saturated, so the
    expectation error stays tiny."""
    box = rng.normal(0, 1, (1, 4, 4, 64)).astype(np.float32)
    box[0, 0, 0, :16] = -100.0
    box[0, 0, 0, 0] = 100.0  # one-hot side: expectation -> bin 0
    bj = jnp.asarray(box).astype(jnp.bfloat16)
    cls = jnp.zeros((1, 4, 4, 80), jnp.bfloat16)
    got = decode_v8_level(bj, cls, stride=8.0, interpret=True)
    ref = decode_v8_level_reference(bj, cls, stride=8.0)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-3)


def test_model_pallas_decode_matches_plain():
    """Full model: pallas_decode="interpret" equals the plain decode."""
    m = build_yolo("yolov8", "n", nc=80)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    ref = m.apply(params, x, reduce_scores=True)
    m.pallas_decode = "interpret"
    got = m.apply(params, x, reduce_scores=True)
    np.testing.assert_allclose(
        np.asarray(got["boxes_xyxy"]), np.asarray(ref["boxes_xyxy"]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["conf"]), np.asarray(ref["conf"]), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got["cls"]), np.asarray(ref["cls"]))


def test_engine_knob_wiring():
    from realtime_analytics_tpu.config import ConfigError, DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    cfg = DetectorConfig(model_path="__random__.pt", warmup=False,
                         input_size=[64, 64], precision="fp32",
                         pallas_decode="on", max_batch_size=1,
                         batch_buckets=[1], pre_nms_topk=64)
    eng = JaxYoloEngine(cfg)
    # "on" off-TPU maps to the interpreter (the kernel is Mosaic-only)
    assert eng.model.pallas_decode == "interpret"
    frames = np.zeros((1, 96, 128, 3), np.uint8)
    assert eng.predict_arrays(frames).boxes_xyxy.shape[0] == 1
    cfg = DetectorConfig(model_path="__random__.pt", warmup=False,
                         input_size=[64, 64], precision="fp32")
    # default off (layout-domain measurement, config.py)
    assert JaxYoloEngine(cfg).model.pallas_decode == "off"
    with pytest.raises(ConfigError):
        DetectorConfig(model_path="x.pt", pallas_decode="yes").validate()

"""Weight-only int8 quantization: output closeness + engine integration."""

import numpy as np

import jax
import jax.numpy as jnp

from realtime_analytics_tpu.config import DetectorConfig, StreamConfig
from realtime_analytics_tpu.engine.detector import JaxYoloEngine
from realtime_analytics_tpu.models.weights import quantize_params_int8
from realtime_analytics_tpu.models.yolo import build_yolo
from realtime_analytics_tpu.types import FramePacket


def test_quantized_tree_shapes_and_dtypes():
    m = build_yolo("yolov8", "n", nc=8)
    params = m.init_params(jax.random.PRNGKey(0))
    q = quantize_params_int8(params)
    node = q["layers"]["0"]
    assert node["w_q"].dtype == jnp.int8
    assert node["w_scale"].shape == (node["w_q"].shape[-1],)
    assert "w" not in node
    # biases untouched
    assert node["b"].dtype == jnp.float32


def test_quantized_forward_close_to_fp32():
    m = build_yolo("yolov8", "n", nc=8)
    params = m.init_params(jax.random.PRNGKey(1))
    q = quantize_params_int8(params)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3), jnp.float32)
    ref = m.apply(params, x)
    got = m.apply(q, x)
    # per-channel weight-only int8: scores stay close in absolute terms
    np.testing.assert_allclose(
        np.asarray(got["scores"]), np.asarray(ref["scores"]), atol=0.08
    )
    # boxes within a few px at 64x64 input
    np.testing.assert_allclose(
        np.asarray(got["boxes_xyxy"]), np.asarray(ref["boxes_xyxy"]), atol=4.0
    )
    # correlation sanity: quantization is a perturbation, not noise
    r = np.corrcoef(
        np.asarray(got["scores"]).ravel(), np.asarray(ref["scores"]).ravel()
    )[0, 1]
    assert r > 0.99


def test_full_int8_activations_close_to_fp32():
    m = build_yolo("yolov8", "n", nc=8)
    params = m.init_params(jax.random.PRNGKey(4))
    mq = build_yolo("yolov8", "n", nc=8)
    mq.act_int8 = True
    q = quantize_params_int8(params)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3), jnp.float32)
    ref = m.apply(params, x)
    got = mq.apply(q, x)
    r = np.corrcoef(
        np.asarray(got["scores"]).ravel(), np.asarray(ref["scores"]).ravel()
    )[0, 1]
    assert r > 0.99
    np.testing.assert_allclose(
        np.asarray(got["boxes_xyxy"]), np.asarray(ref["boxes_xyxy"]), atol=4.0
    )


def test_engine_int8_end_to_end():
    cfg = DetectorConfig(
        model_path="__random__.pt", confidence_threshold=0.005, warmup=False,
        input_size=[64, 64], max_batch_size=2, batch_buckets=[2],
        precision="int8", pre_nms_topk=64, max_detections=16,
    )
    eng = JaxYoloEngine(cfg)
    s = StreamConfig(name="s", url="mem://")
    pkt = FramePacket(
        s, np.random.default_rng(0).integers(0, 256, (96, 128, 3), np.uint8),
        0, 0.0,
    )
    dets = eng.predict(pkt)
    assert isinstance(dets, list)
    for d in dets:
        assert 0 <= d.bbox_xyxy[0] <= d.bbox_xyxy[2] <= 127.1

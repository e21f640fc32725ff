"""Engine with pallas_preprocess=on must match the XLA preprocess path."""

import numpy as np

from realtime_analytics_tpu.config import DetectorConfig, StreamConfig
from realtime_analytics_tpu.engine.detector import JaxYoloEngine
from realtime_analytics_tpu.types import FramePacket


def _engine(pallas: str) -> JaxYoloEngine:
    cfg = DetectorConfig(
        model_path="__random__.pt", confidence_threshold=0.01, warmup=False,
        input_size=[128, 128], max_batch_size=2, batch_buckets=[2],
        precision="fp32", pre_nms_topk=128, max_detections=32,
        pallas_preprocess=pallas,
    )
    return JaxYoloEngine(cfg)


def test_pallas_on_matches_off():
    # same random seed -> identical params
    e_off = _engine("off")
    e_on = _engine("on")
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (97, 131, 3), dtype=np.uint8)  # fractional ratio
    s = StreamConfig(name="s", url="mem://")
    pkt = FramePacket(s, frame, 0, 0.0)
    d_off = e_off.predict(pkt)
    d_on = e_on.predict(pkt)
    assert len(d_off) == len(d_on)
    for a, b in zip(d_off, d_on):
        assert a.class_id == b.class_id
        np.testing.assert_allclose(a.confidence, b.confidence, atol=2e-3)
        np.testing.assert_allclose(a.bbox_xyxy, b.bbox_xyxy, atol=1.5)

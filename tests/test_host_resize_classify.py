"""Host-resize path for classification/temporal engines (round-3 item:
bytes-on-link parity with the YOLO pick path — VERDICT r2 weak #6).

The reference classifiers resize on the HOST with cv2 (detector.py:980-1001,
temporal_detector.py:330-373); with ``host_resize`` active these engines do
the same, so a 1080p classification stream uploads input-sized pixels
(224*224*3 = 0.15 MB) instead of the 6 MB full frame.
"""

import numpy as np
import pytest

from realtime_analytics_tpu.config import DetectorConfig, StreamConfig
from realtime_analytics_tpu.engine.detector import JaxResNetEngine
from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine
from realtime_analytics_tpu.types import FramePacket

cv2 = pytest.importorskip("cv2")


def _stream(name="cam"):
    return StreamConfig(name=name, url="synthetic://", target_fps=25)


def _smooth_frame(h, w, seed=0):
    """A smooth (blurred) image: bilinear resamplers agree closely here,
    so path equivalence is testable without pinning one resizer's taps."""
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, (h // 8 + 1, w // 8 + 1, 3), np.uint8)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)


def _resnet_cfg(**kw):
    kw.setdefault("model_path", "resnet18-missing.npz")
    kw.setdefault("model_type", "resnet")
    kw.setdefault("input_size", [32, 32])
    kw.setdefault("resnet_num_classes", 10)
    kw.setdefault("resnet_scores", "softmax")  # positive scores
    kw.setdefault("confidence_threshold", 1e-6)  # everything passes
    kw.setdefault("precision", "fp32")  # no bf16 noise in path comparison
    kw.setdefault("warmup", False)
    return DetectorConfig(**kw)


def test_resnet_host_prepare_bytes_on_link():
    eng = JaxResNetEngine(_resnet_cfg(host_resize="on"))
    frames = [np.zeros((480, 640, 3), np.uint8) for _ in range(3)]
    prepared, resized = eng.host_prepare(frames, (480, 640))
    assert resized
    assert prepared.shape == (3, 32, 32, 3)
    # bytes-on-link parity with the YOLO pick path (0.69 MB/frame at 1080p):
    # the classification upload is input-sized, far below even that
    assert prepared[0].nbytes == 32 * 32 * 3


def test_resnet_host_prepare_noop_at_input_size():
    eng = JaxResNetEngine(_resnet_cfg(host_resize="on"))
    frames = [np.zeros((32, 32, 3), np.uint8)]
    _, resized = eng.host_prepare(frames, (32, 32))
    assert not resized  # identity geometry: nothing to resize


def test_resnet_resized_step_matches_device_step_math():
    """At identity geometry the device step's resize is a no-op, so the
    host-resized step must match it EXACTLY (same cast/flip/normalize/
    forward) — this pins the resized executable's math, independent of
    which bilinear produced the pixels."""
    eng = JaxResNetEngine(_resnet_cfg(host_resize="off"))
    x = np.random.default_rng(0).integers(0, 256, (2, 32, 32, 3), np.uint8)
    s_dev, c_dev = eng._get_step(2, (32, 32))(eng.params, x)
    s_rsz, c_rsz = eng._get_step_resized(2)(eng.params, x)
    np.testing.assert_array_equal(np.asarray(c_dev), np.asarray(c_rsz))
    np.testing.assert_allclose(
        np.asarray(s_dev), np.asarray(s_rsz), rtol=1e-5, atol=1e-5
    )


def test_resnet_host_vs_device_path_end_to_end():
    """On smooth frames the host (cv2) and device (jax.image) bilinears
    agree closely; the two full paths must produce the same top-1 class
    and nearby scores."""
    cfg_on = _resnet_cfg(host_resize="on")
    eng_on = JaxResNetEngine(cfg_on)
    eng_off = JaxResNetEngine(_resnet_cfg(host_resize="off"),
                              params=eng_on.params)
    frame = _smooth_frame(96, 128)
    pkt = FramePacket(_stream(), frame, 0, 0.0)
    d_on = eng_on.predict_packets([pkt])[0]
    d_off = eng_off.predict_packets([pkt])[0]
    assert d_on and d_off
    assert d_on[0].class_id == d_off[0].class_id
    assert abs(d_on[0].confidence - d_off[0].confidence) < 0.05


def _temporal_cfg(**kw):
    kw.setdefault("model_path", "cnn-lstm-missing.npz")
    kw.setdefault("model_type", "cnn_lstm")
    kw.setdefault("input_size", [32, 32])
    kw.setdefault("sequence_length", 4)
    kw.setdefault("sequence_stride", 1)
    kw.setdefault("num_action_classes", 6)
    kw.setdefault("confidence_threshold", 1e-6)  # softmax probs all pass
    kw.setdefault("precision", "fp32")  # no bf16 noise in path comparison
    kw.setdefault("warmup", False)
    return DetectorConfig(**kw)


def test_temporal_resized_step_matches_device_step_math():
    eng = JaxTemporalEngine(_temporal_cfg(host_resize="off"))
    clips = np.random.default_rng(1).integers(
        0, 256, (1, 4, 32, 32, 3), np.uint8
    )
    s_dev, c_dev = eng._get_step(1, (32, 32))(eng.params, clips)
    s_rsz, c_rsz = eng._get_step_resized(1)(eng.params, clips)
    np.testing.assert_array_equal(np.asarray(c_dev), np.asarray(c_rsz))
    np.testing.assert_allclose(
        np.asarray(s_dev), np.asarray(s_rsz), rtol=1e-5, atol=1e-5
    )


def test_temporal_host_resize_clips_shape_and_noop():
    eng = JaxTemporalEngine(_temporal_cfg(host_resize="on"))
    seqs = [[
        FramePacket(_stream(), _smooth_frame(96, 128, seed=t), t, float(t))
        for t in range(4)
    ]]
    clips = eng._host_resize_clips(seqs, [0], (96, 128))
    assert clips is not None and clips.shape == (1, 4, 32, 32, 3)
    # identity geometry -> None (device path handles it as a no-op)
    assert eng._host_resize_clips(seqs, [0], (32, 32)) is None


def test_temporal_host_resize_on_without_cv2_raises(monkeypatch):
    """Explicit ``host_resize: on`` with no cv2 must fail loudly (advisor
    r3): a silent fallback serves full-resolution device steps the operator
    explicitly opted out of — different compile shapes, more link bytes."""
    import sys

    from realtime_analytics_tpu.config import ConfigError

    eng = JaxTemporalEngine(_temporal_cfg(host_resize="on"))
    monkeypatch.setitem(sys.modules, "cv2", None)  # import cv2 -> ImportError
    with pytest.raises(ConfigError, match="host_resize"):
        eng._host_resize_active()


def test_temporal_host_resize_auto_without_cv2_warns_once(monkeypatch, caplog):
    import logging
    import sys

    eng = JaxTemporalEngine(_temporal_cfg(host_resize="auto"))
    monkeypatch.setattr(
        eng, "device", type("D", (), {"platform": "tpu"})(), raising=False
    )
    monkeypatch.setitem(sys.modules, "cv2", None)
    with caplog.at_level(logging.WARNING):
        assert eng._host_resize_active() is False
        assert eng._host_resize_active() is False  # second call: no repeat
    hits = [r for r in caplog.records if "cv2 is unavailable" in r.message]
    assert len(hits) == 1


def test_temporal_host_vs_device_path_end_to_end():
    cfg_on = _temporal_cfg(host_resize="on")
    eng_on = JaxTemporalEngine(cfg_on)
    eng_off = JaxTemporalEngine(_temporal_cfg(host_resize="off"),
                                params=eng_on.params)
    seq = [
        FramePacket(_stream(), _smooth_frame(96, 128, seed=t), t, float(t))
        for t in range(4)
    ]
    d_on = eng_on.predict_clips([seq])[0]
    d_off = eng_off.predict_clips([seq])[0]
    assert d_on and d_off
    assert d_on[0].class_id == d_off[0].class_id
    assert abs(d_on[0].confidence - d_off[0].confidence) < 0.05

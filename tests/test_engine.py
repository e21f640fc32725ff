"""Engine tests: fused detect step, bucketing, classification, temporal
sliding windows, and the cross-stream batcher."""

import asyncio
import time

import numpy as np
import pytest

from realtime_analytics_tpu.config import DetectorConfig, StreamConfig
from realtime_analytics_tpu.engine.batcher import InferenceBatcher
from realtime_analytics_tpu.engine.detector import (
    JaxResNetEngine,
    JaxYoloEngine,
    create_detector,
)
from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine
from realtime_analytics_tpu.types import FramePacket


def make_packet(stream_name="s", frame_id=0, hw=(120, 160), seed=0, **stream_kw):
    rng = np.random.default_rng(seed + frame_id)
    stream = StreamConfig(name=stream_name, url="mem://", **stream_kw)
    return FramePacket(
        stream, rng.integers(0, 256, (*hw, 3), dtype=np.uint8), frame_id, time.time()
    )


@pytest.fixture(scope="module")
def yolo_engine():
    cfg = DetectorConfig(
        model_path="__random__.pt",
        confidence_threshold=0.005,
        warmup=False,
        input_size=[128, 128],
        max_batch_size=4,
        pre_nms_topk=256,
        precision="fp32",
    )
    return JaxYoloEngine(cfg)


def test_yolo_predict_shapes_and_validity(yolo_engine):
    pkts = [make_packet(frame_id=i) for i in range(3)]
    res = yolo_engine.predict_packets(pkts)
    assert len(res) == 3
    for dets in res:
        for d in dets:
            x1, y1, x2, y2 = d.bbox_xyxy
            assert 0 <= x1 <= x2 <= 160 - 1 + 1e-3
            assert 0 <= y1 <= y2 <= 120 - 1 + 1e-3
            assert 0 <= d.class_id < 80
            assert d.confidence >= 0.005


def test_yolo_batch_matches_single(yolo_engine):
    """Batched inference must give identical results to one-at-a-time."""
    pkts = [make_packet(frame_id=i, seed=42) for i in range(3)]
    batched = yolo_engine.predict_packets(pkts)
    single = [yolo_engine.predict(p) for p in pkts]
    for b_dets, s_dets in zip(batched, single):
        assert len(b_dets) == len(s_dets)
        for b, s in zip(b_dets, s_dets):
            assert b.class_id == s.class_id
            np.testing.assert_allclose(b.confidence, s.confidence, rtol=1e-5)
            np.testing.assert_allclose(b.bbox_xyxy, s.bbox_xyxy, rtol=1e-4, atol=1e-2)


def test_yolo_mixed_resolutions(yolo_engine):
    pkts = [
        make_packet("a", 0, hw=(120, 160)),
        make_packet("b", 0, hw=(96, 128)),
        make_packet("c", 0, hw=(120, 160)),
    ]
    res = yolo_engine.predict_packets(pkts)
    assert len(res) == 3  # grouped by resolution internally, order preserved


def test_yolo_class_filter():
    cfg = DetectorConfig(
        model_path="__random__.pt",
        confidence_threshold=0.001,
        warmup=False,
        input_size=[128, 128],
        classes=[0, 2],
        max_batch_size=2,
        precision="fp32",
    )
    eng = JaxYoloEngine(cfg)
    res = eng.predict_packets([make_packet(frame_id=7)])
    for d in res[0]:
        assert d.class_id in (0, 2)


def test_create_detector_routing():
    det = create_detector(DetectorConfig(model_path="x.pt", warmup=False,
                                         input_size=[64, 64]))
    assert isinstance(det, JaxYoloEngine)
    cls = create_detector(
        DetectorConfig(model_path="resnet18.pt", model_type="resnet",
                       backend="onnx", resnet_num_classes=10)
    )
    assert isinstance(cls, JaxResNetEngine)
    tmp = create_detector(
        DetectorConfig(model_path="t.onnx", model_type="cnn_lstm", backend="onnx",
                       sequence_length=4, num_action_classes=7,
                       input_size=[64, 64])
    )
    assert isinstance(tmp, JaxTemporalEngine)


def test_resnet_topk_full_frame_boxes():
    cfg = DetectorConfig(
        model_path="resnet18.pt", model_type="resnet", backend="openvino",
        resnet_num_classes=50, resnet_top_k=4, confidence_threshold=0.0001,
        input_size=[64, 64], precision="fp32",
    )
    eng = JaxResNetEngine(cfg)
    pkt = make_packet(hw=(100, 140))
    dets = eng.predict(pkt)
    assert 1 <= len(dets) <= 4
    assert dets[0].bbox_xyxy == (0.0, 0.0, 140.0, 100.0)
    confs = [d.confidence for d in dets]
    assert confs == sorted(confs, reverse=True)


@pytest.mark.parametrize("model_type", ["cnn_lstm", "3d_cnn", "conv_gru", "slow_fast"])
def test_temporal_sliding_window(model_type):
    cfg = DetectorConfig(
        model_path="t.npz", model_type=model_type, backend="onnx",
        sequence_length=4, sequence_stride=1, temporal_overlap=0.5,
        num_action_classes=11, confidence_threshold=1e-6,
        input_size=[48, 48], precision="fp32",
        action_classes=["walk", "run"],
    )
    eng = JaxTemporalEngine(cfg)
    # step = max(1, int(4 * 0.5)) = 2: first clip at frame 4, then every 2
    fire_frames = []
    for i in range(1, 11):
        dets = eng.predict(make_packet(frame_id=i, hw=(64, 64)))
        if dets:
            fire_frames.append(i)
            d = dets[0]
            assert d.sequence_end_frame == i
            assert d.sequence_start_frame == i - 3
            assert d.action_label in ("walk", "run") or d.action_label.startswith(
                "action_"
            )
            assert d.temporal_score == d.confidence
    assert fire_frames == [4, 6, 8, 10]


def test_temporal_stride_and_reset():
    cfg = DetectorConfig(
        model_path="t.npz", model_type="cnn_lstm", backend="onnx",
        sequence_length=3, sequence_stride=2, temporal_overlap=0.0,
        num_action_classes=5, confidence_threshold=1e-6,
        input_size=[48, 48], precision="fp32",
    )
    eng = JaxTemporalEngine(cfg)
    fired = []
    for i in range(1, 14):
        if eng.predict(make_packet(frame_id=i, hw=(64, 64))):
            fired.append(i)
    # required = 6 frames, step=3 -> keep 3: fires at 6, then every 3
    assert fired == [6, 9, 12]
    eng.reset_stream("s")
    assert eng.predict(make_packet(frame_id=99, hw=(64, 64))) == []


def test_batcher_packs_and_resolves(yolo_engine):
    async def run():
        batcher = InferenceBatcher(yolo_engine, max_batch=4, batch_window_ms=20)
        await batcher.start()
        pkts = [make_packet(f"s{i}", i, seed=9) for i in range(4)]
        results = await asyncio.gather(*(batcher.submit(p) for p in pkts))
        await batcher.stop()
        return results, batcher.stats

    results, stats = asyncio.run(run())
    assert len(results) == 4
    assert stats.frames == 4
    assert stats.max_batch_size >= 2  # actually packed across "streams"


def test_batcher_per_stream_inflight_cap(yolo_engine):
    async def run():
        batcher = InferenceBatcher(yolo_engine, max_batch=4, batch_window_ms=5)
        # don't start the loop: submits stay queued, so the cap is hit
        task1 = asyncio.create_task(batcher.submit(make_packet("s", 0)))
        await asyncio.sleep(0.01)
        second = await batcher.submit(make_packet("s", 1))  # cap 1 -> dropped
        await batcher.start()
        first = await task1
        await batcher.stop()
        return first, second

    first, second = asyncio.run(run())
    assert second is None  # shed by in-flight cap (None, never a clean [])
    assert isinstance(first, list)


def test_host_select_path_matches_full_path():
    """For odd-integer letterbox ratios (e.g. 3x) the host-picked path must
    produce identical detections to the full-frame device path — the pick
    selects the exact pixels bilinear would."""
    import numpy as np

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    def make(host_select):
        return DetectorConfig(
            model_path="__random__.pt", confidence_threshold=0.01,
            input_size=[64, 64], max_batch_size=2, batch_buckets=[2],
            precision="fp32", warmup=False, pre_nms_topk=64,
            max_detections=16, host_select=host_select,
        )

    eng_sel = JaxYoloEngine(make("auto"))
    eng_off = JaxYoloEngine(make("off"), params=eng_sel.params)
    # 192x192 -> 64x64 letterbox: exactly 3x on both axes
    frames = np.random.default_rng(7).integers(
        0, 256, (2, 192, 192, 3), dtype=np.uint8
    )
    prepared, selected = eng_sel.host_prepare(frames, (192, 192))
    assert selected and prepared.shape == (2, 64, 64, 3)

    got = eng_sel.predict_arrays(frames)
    want = eng_off.predict_arrays(frames)
    np.testing.assert_array_equal(got.num_valid, want.num_valid)
    np.testing.assert_allclose(got.boxes_xyxy, want.boxes_xyxy,
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got.class_ids, want.class_ids)


def test_host_select_disabled_for_fractional_ratios():
    import numpy as np

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    eng = JaxYoloEngine(DetectorConfig(
        model_path="__random__.pt", input_size=[64, 64], warmup=False,
        max_batch_size=2, batch_buckets=[2], precision="fp32",
    ))
    frames = np.zeros((1, 100, 150, 3), dtype=np.uint8)
    prepared, selected = eng.host_prepare(frames, (100, 150))
    assert not selected and prepared is frames


def test_identity_sized_source_takes_selected_step():
    """Input-sized sources (and every TILE crop of the tiled path) are a
    degenerate pixel pick (ratio 1, offset 0): they must ride the lean
    stem-folded selected step — NOT the plain device letterbox/normalize
    step (measured 21.2 vs 15.7 ms at b=128) — with identical outputs."""
    import numpy as np

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    def make(host_select):
        return DetectorConfig(
            model_path="__random__.pt", confidence_threshold=0.01,
            input_size=[64, 64], max_batch_size=2, batch_buckets=[2],
            precision="fp32", warmup=False, pre_nms_topk=64,
            max_detections=16, host_select=host_select,
        )

    eng_sel = JaxYoloEngine(make("auto"))
    eng_off = JaxYoloEngine(make("off"), params=eng_sel.params)
    frames = np.random.default_rng(11).integers(
        0, 256, (2, 64, 64, 3), dtype=np.uint8
    )
    # geometry resolves to the degenerate pick, no host copy needed
    prepared, selected = eng_sel.host_prepare(frames, (64, 64))
    assert selected and prepared.shape == (2, 64, 64, 3)

    got = eng_sel.predict_arrays(frames)
    want = eng_off.predict_arrays(frames)
    assert int(got.num_valid.sum()) > 0
    np.testing.assert_array_equal(got.num_valid, want.num_valid)
    np.testing.assert_allclose(got.boxes_xyxy, want.boxes_xyxy,
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got.class_ids, want.class_ids)


def test_cost_aware_bucket_selection():
    """Bucket cost is non-monotonic on TPU (batch rides the lane dim:
    b=64 measured SLOWER than b=128 on v5e) — with warmup-measured costs
    the engine picks the cheapest bucket that fits, not the smallest."""
    cfg = DetectorConfig(
        model_path="__random__.pt", warmup=False, input_size=[64, 64],
        max_batch_size=128, batch_buckets=[16, 32, 64, 128], precision="fp32",
    )
    eng = JaxYoloEngine(cfg)
    hw = (1080, 1920)
    # no costs -> smallest fitting bucket (unchanged default behavior)
    assert eng._effective_bucket(40, hw) == 64
    # v5e-shaped measurements: 64 dominated by 128
    eng._bucket_cost_ms = {hw: {16: 10.6, 32: 16.0, 64: 21.5, 128: 16.5}}
    assert eng._effective_bucket(10, hw) == 16
    assert eng._effective_bucket(17, hw) == 32  # 32 cheaper than 64 AND 128
    assert eng._effective_bucket(40, hw) == 128  # padding to 128 beats b=64
    assert eng._effective_bucket(100, hw) == 128
    # costs are PER RESOLUTION: another source falls back to smallest-fit
    assert eng._effective_bucket(40, (720, 1280)) == 64
    # ties resolve to the smaller bucket
    eng._bucket_cost_ms = {hw: {64: 16.5, 128: 16.5}}
    assert eng._effective_bucket(40, hw) == 64
    # partial measurements only redirect among measured buckets
    eng._bucket_cost_ms = {hw: {16: 10.0}}
    assert eng._effective_bucket(40, hw) == 64


def test_warmup_records_bucket_costs():
    cfg = DetectorConfig(
        model_path="__random__.pt", warmup=False, input_size=[64, 64],
        max_batch_size=4, batch_buckets=[2, 4], precision="fp32",
    )
    eng = JaxYoloEngine(cfg)
    eng.warmup((96, 128))
    assert set(eng._bucket_cost_ms) == {(96, 128)}
    costs = eng._bucket_cost_ms[(96, 128)]
    assert set(costs) == {2, 4}
    assert all(v > 0 for v in costs.values())
    # a second warmup at another resolution keeps the first one's costs
    # AND compiles that resolution's own steps (no cost-aware redirection
    # mid-warmup)
    eng.warmup((64, 96))
    assert set(eng._bucket_cost_ms) == {(96, 128), (64, 96)}
    assert (2, 64, 96) in eng._steps and (4, 64, 96) in eng._steps


def test_host_resize_fractional_path(rng):
    """host_resize=on: fractional-ratio sources resize on the host (the
    reference's own cv2 preprocess) and ride the lean selected step;
    detections match the device-resize path."""
    import pytest

    cv2 = pytest.importorskip("cv2")  # noqa: F841
    frames = rng.integers(0, 256, size=(2, 72, 100, 3), dtype=np.uint8)

    def run(mode):
        cfg = DetectorConfig(
            model_path="__random__.pt", model_type="yolov8",
            input_size=[64, 64], max_batch_size=2, batch_buckets=[2],
            precision="fp32", confidence_threshold=0.0015, warmup=False,
            host_resize=mode,
        )
        eng = JaxYoloEngine(cfg)
        prepared, selected = eng.host_prepare(frames, (72, 100))
        if mode == "on":
            # scale = 64/100 -> content 46x64, uploaded pre-resized
            assert selected and prepared.shape == (2, 46, 64, 3)
        else:
            assert not selected and prepared.shape == frames.shape
        return eng.predict_arrays(frames)

    ref, got = run("off"), run("on")
    # not vacuous: random-init at a low threshold always detects something,
    # and both paths must agree on HOW MANY
    assert all(int(v) > 0 for v in ref.num_valid)
    np.testing.assert_array_equal(ref.num_valid, got.num_valid)
    # both paths implement the cv2 INTER_LINEAR letterbox contract; allow
    # interpolation-implementation slack at box edges
    for i in range(2):
        k = int(ref.num_valid[i])
        np.testing.assert_allclose(
            got.boxes_xyxy[i, :k], ref.boxes_xyxy[i, :k], atol=2.0
        )


def test_host_resize_production_packet_path(rng):
    """The batcher's predict_packets path (production serving) must take
    the host_resize route too — host_prepare alone only covers
    predict_arrays (bench/eval). Guarded by checking which executable key
    gets compiled: the 'sel' step, not the device-resize step."""
    import pytest

    pytest.importorskip("cv2")
    cfg = DetectorConfig(
        model_path="__random__.pt", model_type="yolov8",
        input_size=[64, 64], max_batch_size=2, batch_buckets=[2],
        precision="fp32", confidence_threshold=0.0015, warmup=False,
        host_resize="on",
    )
    eng = JaxYoloEngine(cfg)
    pkts = [make_packet("s", i, hw=(72, 100), seed=5) for i in range(2)]
    dets = eng.predict_packets(pkts)
    assert len(dets) == 2 and any(len(d) > 0 for d in dets)
    assert (2, 72, 100, "sel") in eng._steps  # host-resized selected step
    assert (2, 72, 100) not in eng._steps  # device-resize step NOT used


def test_host_resize_pick_precedence(rng):
    """Odd-integer ratios still take the exact pixel-pick path even with
    host_resize forced on."""
    frames = rng.integers(0, 256, size=(1, 192, 192, 3), dtype=np.uint8)
    cfg = DetectorConfig(
        model_path="__random__.pt", input_size=[64, 64], max_batch_size=1,
        batch_buckets=[1], precision="fp32", warmup=False, host_resize="on",
    )
    eng = JaxYoloEngine(cfg)
    prepared, selected = eng.host_prepare(frames, (192, 192))
    assert selected and prepared.shape == (1, 64, 64, 3)  # exact 3x pick

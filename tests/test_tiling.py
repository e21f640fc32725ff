"""Tiled (sliced) small-object inference: grid/crop/merge oracles plus the
engine path end to end (ops/tiling.py, JaxYoloEngine._predict_tiled_group).

Beyond-reference capability: the reference always letterboxes the whole
frame (reference detector.py:224-268) so a 1080p frame reaches a 640 model
at 1/3 scale; the tiled path detects at native resolution."""

import numpy as np
import pytest

from realtime_analytics_tpu.config import DetectorConfig, StreamConfig
from realtime_analytics_tpu.ops.tiling import (
    crop_tile,
    merge_frame,
    merge_tile_detections,
    offset_and_clip,
    tile_grid,
)
from realtime_analytics_tpu.types import FramePacket


# ---------------------------------------------------------------------------
# grid
# ---------------------------------------------------------------------------


def _covered(src_hw, grid, tile_hw):
    mask = np.zeros(src_hw, bool)
    th, tw = tile_hw
    for y0, x0 in grid:
        mask[y0: y0 + th, x0: x0 + tw] = True
    return mask.all()


def test_grid_covers_1080p():
    grid = tile_grid((1080, 1920), (640, 640), 0.2)
    assert len(grid) == 8  # 2 rows x 4 cols
    assert _covered((1080, 1920), grid, (640, 640))
    # every origin in bounds: tile never hangs off the frame
    for y0, x0 in grid:
        assert 0 <= y0 <= 1080 - 640 and 0 <= x0 <= 1920 - 640


@pytest.mark.parametrize("src", [(720, 1280), (1440, 2560), (643, 641)])
@pytest.mark.parametrize("overlap", [0.0, 0.2, 0.5])
def test_grid_covers_various(src, overlap):
    grid = tile_grid(src, (640, 640), overlap)
    assert _covered(src, grid, (640, 640))
    assert len(grid) == len(set(grid))  # no duplicate origins


def test_grid_small_frame_single_tile():
    assert tile_grid((480, 640), (640, 640), 0.2) == [(0, 0)]
    assert tile_grid((640, 640), (640, 640), 0.2) == [(0, 0)]


def test_grid_overlap_respected():
    # overlap 0.5 -> stride 320 on a 1280 axis: origins 0,320,640
    grid = tile_grid((640, 1280), (640, 640), 0.5)
    assert [x for _, x in grid] == [0, 320, 640]


# ---------------------------------------------------------------------------
# crop
# ---------------------------------------------------------------------------


def test_crop_tile_interior_and_padded_edge():
    frame = np.arange(100 * 120 * 3, dtype=np.int64).reshape(100, 120, 3)
    frame = (frame % 251).astype(np.uint8)
    out = np.empty((64, 64, 3), np.uint8)
    crop_tile(frame, 10, 20, (64, 64), out)
    np.testing.assert_array_equal(out, frame[10:74, 20:84])
    # frame smaller than the tile below/right: letterbox fill
    out2 = np.empty((64, 64, 3), np.uint8)
    crop_tile(frame, 60, 80, (64, 64), out2)
    np.testing.assert_array_equal(out2[:40, :40], frame[60:100, 80:120])
    assert (out2[40:] == 114).all() and (out2[:, 40:] == 114).all()


# ---------------------------------------------------------------------------
# merge
# ---------------------------------------------------------------------------


def test_merge_dedups_seam_cut_box():
    # tile A sees the full box; tile B sees only the sliver that crossed
    # the seam. IoU(full, sliver) = 0.125 — classic NMS would keep BOTH;
    # IoS = 1.0 dedups it.
    boxes = np.array([[100, 100, 180, 180], [100, 100, 110, 180]], np.float32)
    scores = np.array([0.9, 0.6], np.float32)
    classes = np.array([2, 2], np.int32)
    b, s, c, n = merge_tile_detections(boxes, scores, classes, 0.45, 10)
    assert n == 1
    np.testing.assert_array_equal(b[0], boxes[0])
    assert s[0] == pytest.approx(0.9) and c[0] == 2


def test_merge_keeps_distinct_boxes_and_orders_by_score():
    boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60], [90, 0, 99, 9]],
                     np.float32)
    scores = np.array([0.5, 0.9, 0.7], np.float32)
    classes = np.array([0, 1, 2], np.int32)
    b, s, c, n = merge_tile_detections(boxes, scores, classes, 0.45, 10)
    assert n == 3
    assert list(s[:3]) == [pytest.approx(0.9), pytest.approx(0.7),
                           pytest.approx(0.5)]


def test_merge_class_aware_mode_keeps_other_class():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 5], np.int32)
    _, _, _, n_agn = merge_tile_detections(
        boxes, scores, classes, 0.45, 10, class_agnostic=True)
    _, _, c, n_cls = merge_tile_detections(
        boxes, scores, classes, 0.45, 10, class_agnostic=False)
    assert n_agn == 1 and n_cls == 2
    assert set(c[:2]) == {0, 5}


def test_merge_caps_at_max_detections_and_handles_empty():
    k = 20
    boxes = np.stack([np.array([i * 20, 0, i * 20 + 10, 10]) for i in range(k)]
                     ).astype(np.float32)
    scores = np.linspace(0.9, 0.1, k).astype(np.float32)
    classes = np.zeros(k, np.int32)
    b, s, c, n = merge_tile_detections(boxes, scores, classes, 0.45, 5)
    assert n == 5 and s[4] > 0
    _, _, _, n0 = merge_tile_detections(
        np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
        np.zeros((0,), np.int32), 0.45, 5)
    assert n0 == 0


def test_offset_and_clip():
    boxes = np.array([[600, 600, 700, 700]], np.float32)
    out = offset_and_clip(boxes, 440, 1280, (1080, 1920))
    np.testing.assert_array_equal(out[0], [1880, 1040, 1920, 1080])


def test_merge_frame_offsets_tiles_but_not_extra_pass():
    grid = [(0, 0), (0, 100)]
    # same physical box seen by tile 1 (at local x=0) and by a whole-frame
    # pass (already global at x=100): must merge to ONE box at x=100
    t0 = (np.zeros((5, 4), np.float32), np.zeros(5, np.float32),
          np.zeros(5, np.int32), 0)
    t1 = (np.array([[0, 10, 40, 50]] + [[0, 0, 0, 0]] * 4, np.float32),
          np.array([0.8, 0, 0, 0, 0], np.float32),
          np.zeros(5, np.int32), 1)
    extra = (np.array([[100, 10, 140, 50]] + [[0, 0, 0, 0]] * 4, np.float32),
             np.array([0.9, 0, 0, 0, 0], np.float32),
             np.zeros(5, np.int32), 1)
    b, s, c, n = merge_frame([t0, t1, extra], grid, (200, 300), 0.45, 10)
    assert n == 1
    np.testing.assert_array_equal(b[0], [100, 10, 140, 50])
    assert s[0] == pytest.approx(0.9)


# ---------------------------------------------------------------------------
# engine path (CPU, small shapes)
# ---------------------------------------------------------------------------


def _engine(tiling=True, full_frame=False, input_size=64, overlap=0.2):
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    cfg = DetectorConfig(
        model_path="/tmp/tiling-missing.npz",  # random init is fine here
        model_type="yolov8",
        device="cpu",
        confidence_threshold=0.01,
        iou_threshold=0.45,
        input_size=[input_size, input_size],
        max_batch_size=8,
        batch_buckets=[4, 8],
        max_detections=50,
        pre_nms_topk=64,
        precision="fp32",
        warmup=False,
        host_resize="off",
        tiling=tiling,
        tiling_overlap=overlap,
        tiling_full_frame=full_frame,
    )
    return JaxYoloEngine(cfg)


def _packet(frame, name="cam", fid=0):
    stream = StreamConfig(name=name, url="synthetic://", target_fps=25)
    return FramePacket(stream, frame, fid, 0.0)


def _rng_frame(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (h, w, 3), np.uint8)


def test_engine_tiled_path_machinery():
    eng = _engine()
    frame = _rng_frame(120, 150, seed=1)  # 64² tiles -> 2x3 grid
    dets = eng.predict_packets([_packet(frame)])[0]
    for d in dets:
        x1, y1, x2, y2 = d.bbox_xyxy
        assert 0 <= x1 <= x2 <= 150 and 0 <= y1 <= y2 <= 120
    # scores descend (greedy merge order)
    scores = [d.confidence for d in dets]
    assert scores == sorted(scores, reverse=True)


def test_engine_tiled_matches_manual_composition():
    """Tiled group == manually cropping tiles, running the plain engine on
    each, offsetting and merging with the same ops. Guards the engine glue
    (crop loop, chunking, coordinate plumbing) with the ops as oracle."""
    eng = _engine(tiling=True, full_frame=False)
    plain = _engine(tiling=False)
    frame = _rng_frame(100, 170, seed=2)
    got = eng.predict_packets([_packet(frame)])[0]

    grid = tile_grid((100, 170), (64, 64), 0.2)
    tiles = np.empty((len(grid), 64, 64, 3), np.uint8)
    for t, (y0, x0) in enumerate(grid):
        crop_tile(frame, y0, x0, (64, 64), out=tiles[t])
    br = plain.predict_arrays(tiles)
    per_tile = [
        (br.boxes_xyxy[t], br.scores[t], br.class_ids[t],
         int(br.num_valid[t]))
        for t in range(len(grid))
    ]
    b, s, c, n = merge_frame(per_tile, grid, (100, 170), 0.45, 50)
    assert len(got) == n
    for j, d in enumerate(got):
        np.testing.assert_allclose(d.bbox_xyxy, b[j], atol=1e-4)
        assert d.confidence == pytest.approx(float(s[j]), abs=1e-6)
        assert d.class_id == int(c[j])


def test_engine_tiling_inactive_for_input_sized_frames():
    tiled = _engine(tiling=True)
    plain = _engine(tiling=False)
    frame = _rng_frame(64, 64, seed=3)
    a = tiled.predict_packets([_packet(frame)])[0]
    b = plain.predict_packets([_packet(frame)])[0]
    assert len(a) == len(b)
    for da, db in zip(a, b):
        np.testing.assert_allclose(da.bbox_xyxy, db.bbox_xyxy, atol=1e-4)
        assert da.confidence == pytest.approx(db.confidence, abs=1e-6)


def test_engine_tiled_with_full_frame_pass():
    eng = _engine(tiling=True, full_frame=True)
    frame = _rng_frame(120, 150, seed=4)
    dets = eng.predict_packets([_packet(frame)])[0]
    for d in dets:
        x1, y1, x2, y2 = d.bbox_xyxy
        assert 0 <= x1 <= x2 <= 150 and 0 <= y1 <= y2 <= 120


def test_engine_tiled_chunking_over_bucket_cap():
    """6 tiles/frame x 3 frames = 18 tiles > max bucket 8: the tiled path
    must chunk device calls, and per-frame results must stay aligned."""
    eng = _engine(tiling=True, full_frame=False)
    frames = [_rng_frame(120, 150, seed=s) for s in (5, 6, 7)]
    packets = [_packet(f, name=f"cam-{i}", fid=i)
               for i, f in enumerate(frames)]
    got = eng.predict_packets(packets)
    # each frame's result matches running it alone (alignment guard)
    for i, f in enumerate(frames):
        solo = eng.predict_packets([_packet(f, name=f"cam-{i}", fid=i)])[0]
        assert len(got[i]) == len(solo)
        for da, db in zip(got[i], solo):
            np.testing.assert_allclose(da.bbox_xyxy, db.bbox_xyxy, atol=1e-4)


def test_config_validates_overlap():
    from realtime_analytics_tpu.config import ConfigError

    with pytest.raises(ConfigError):
        DetectorConfig(model_path="x.pt", tiling_overlap=0.95).validate()
    DetectorConfig(model_path="x.pt", tiling_overlap=0.5).validate()

"""Ops tests: box math, batched NMS and letterbox preprocessing verified
against NumPy oracles with the reference's exact semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from realtime_analytics_tpu.ops import (
    batched_nms,
    iou_matrix,
    letterbox_numpy,
    letterbox_spec,
    preprocess_batch,
    unletterbox_boxes,
    xywh2xyxy,
)

# ---------------------------------------------------------------------------
# NumPy oracles (semantics of reference detector.py:340-375, 469-481)
# ---------------------------------------------------------------------------


def iou_one_many_np(box, boxes):
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.clip(a + b - inter, 1e-6, None)


def greedy_nms_np(boxes, scores, iou_threshold):
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = int(order[0])
        keep.append(i)
        if order.size == 1:
            break
        iou = iou_one_many_np(boxes[i], boxes[order[1:]])
        order = order[np.where(iou <= iou_threshold)[0] + 1]
    return keep


def random_boxes(rng, n, size=640):
    xy = rng.uniform(0, size * 0.8, (n, 2))
    wh = rng.uniform(8, size * 0.3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------


def test_xywh2xyxy_matches_reference_math(rng):
    xywh = rng.uniform(0, 640, (50, 4)).astype(np.float32)
    got = np.asarray(xywh2xyxy(jnp.asarray(xywh)))
    exp = xywh.copy()
    exp[:, 0] = xywh[:, 0] - xywh[:, 2] / 2
    exp[:, 1] = xywh[:, 1] - xywh[:, 3] / 2
    exp[:, 2] = xywh[:, 0] + xywh[:, 2] / 2
    exp[:, 3] = xywh[:, 1] + xywh[:, 3] / 2
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_iou_matrix_vs_oracle(rng):
    a = random_boxes(rng, 13)
    b = random_boxes(rng, 7)
    got = np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    exp = np.stack([iou_one_many_np(a[i], b) for i in range(len(a))])
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-7)


def test_unletterbox_matches_reference_scale_boxes(rng):
    spec = letterbox_spec((1080, 1920), (640, 640))
    boxes = random_boxes(rng, 20, size=640)
    got = np.asarray(
        unletterbox_boxes(
            jnp.asarray(boxes), spec.scale, spec.pad_left, spec.pad_top, 1080, 1920
        )
    )
    exp = boxes.copy()
    exp[:, [0, 2]] -= spec.pad_left
    exp[:, [1, 3]] -= spec.pad_top
    exp /= spec.scale
    exp[:, [0, 2]] = np.clip(exp[:, [0, 2]], 0, 1920 - 1)
    exp[:, [1, 3]] = np.clip(exp[:, [1, 3]], 0, 1080 - 1)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("seed", range(5))
def test_batched_nms_matches_greedy_oracle(seed):
    rng = np.random.default_rng(seed)
    n_img, m = 4, 120
    boxes = np.stack([random_boxes(rng, m) for _ in range(n_img)])
    scores = rng.uniform(0.05, 1.0, (n_img, m)).astype(np.float32)
    # Zero out ~30% as "below confidence threshold".
    scores[rng.uniform(size=scores.shape) < 0.3] = 0.0
    classes = rng.integers(0, 5, (n_img, m)).astype(np.int32)

    ob, osc, ocl, nv = batched_nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(classes),
        iou_threshold=0.45,
        max_det=64,
        pre_topk=m,
    )
    ob, osc, ocl, nv = map(np.asarray, (ob, osc, ocl, nv))

    for i in range(n_img):
        valid_idx = np.where(scores[i] > 0)[0]
        keep = greedy_nms_np(boxes[i][valid_idx], scores[i][valid_idx], 0.45)
        exp_idx = valid_idx[keep][:64]  # score-descending, capped at max_det
        assert nv[i] == len(exp_idx)
        np.testing.assert_allclose(osc[i, : nv[i]], scores[i][exp_idx], rtol=1e-6)
        np.testing.assert_allclose(ob[i, : nv[i]], boxes[i][exp_idx], rtol=1e-6)
        np.testing.assert_array_equal(ocl[i, : nv[i]], classes[i][exp_idx])
        # padding is zeroed
        assert np.all(osc[i, nv[i] :] == 0)


def test_batched_nms_class_aware(rng):
    # Two perfectly overlapping boxes of different classes survive per-class
    # NMS but not class-agnostic NMS.
    boxes = np.array([[[10, 10, 100, 100], [10, 10, 100, 100]]], dtype=np.float32)
    scores = np.array([[0.9, 0.8]], dtype=np.float32)
    classes = np.array([[0, 1]], dtype=np.int32)
    _, _, _, nv_ag = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        iou_threshold=0.5, max_det=8, pre_topk=2, class_agnostic=True,
    )
    _, _, _, nv_cls = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        iou_threshold=0.5, max_det=8, pre_topk=2, class_agnostic=False,
    )
    assert int(nv_ag[0]) == 1
    assert int(nv_cls[0]) == 2


def test_batched_nms_class_aware_huge_coordinates(rng):
    # the per-class offset adapts to the coordinate range: on a >8192 px
    # canvas (tile-global / panorama coordinates) different classes must
    # still never suppress each other
    boxes = np.array(
        [[[9000, 10, 9500, 400], [9000, 10, 9500, 400],
          [9000 - 8192, 10, 9500 - 8192, 400]]], dtype=np.float32
    )
    scores = np.array([[0.9, 0.8, 0.7]], dtype=np.float32)
    classes = np.array([[0, 1, 1]], dtype=np.int32)
    _, _, cls_out, nv = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        iou_threshold=0.5, max_det=8, pre_topk=3, class_agnostic=False,
    )
    # box 1 (class 1) must survive: it only overlaps box 0 of ANOTHER
    # class; box 2 (class 1, disjoint from box 1) survives too
    assert int(nv[0]) == 3, (
        "a fixed class offset smaller than the coordinate range lets "
        "classes collide"
    )


def test_batched_nms_class_aware_negative_coordinates(rng):
    # the per-class offset must cover the full coordinate SPAN (max - min),
    # not just max: with negative coordinates a max-derived offset can land
    # class c+1's shifted band inside class c's band. Constructed so the
    # old max-only offset (max(400, 8192) + 1 = 8193) maps the class-1 box
    # exactly onto the class-0 box.
    boxes = np.array(
        [[[-11800, 10, -11300, 400], [-19993, 10, -19493, 400]]],
        dtype=np.float32,
    )
    scores = np.array([[0.9, 0.8]], dtype=np.float32)
    classes = np.array([[0, 1]], dtype=np.int32)
    _, _, _, nv = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        iou_threshold=0.5, max_det=8, pre_topk=2, class_agnostic=False,
    )
    assert int(nv[0]) == 2, (
        "a class offset derived from max() only lets classes collide when "
        "coordinates go negative"
    )


def test_batched_nms_max_det_truncates(rng):
    # Disjoint boxes, none suppressed; max_det caps output.
    m = 16
    boxes = np.zeros((1, m, 4), dtype=np.float32)
    for j in range(m):
        boxes[0, j] = [j * 200, 0, j * 200 + 50, 50]
    scores = np.linspace(1.0, 0.5, m, dtype=np.float32)[None]
    classes = np.zeros((1, m), dtype=np.int32)
    ob, osc, _, nv = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        iou_threshold=0.5, max_det=4, pre_topk=m,
    )
    assert int(nv[0]) == 4
    np.testing.assert_allclose(np.asarray(osc)[0], scores[0, :4])


def test_letterbox_spec_matches_reference_math():
    spec = letterbox_spec((1080, 1920), (640, 640))
    assert spec.scale == min(640 / 1920, 640 / 1080)
    assert (spec.new_w, spec.new_h) == (int(1920 * spec.scale), int(1080 * spec.scale))
    assert spec.pad_top == (640 - spec.new_h) // 2
    assert spec.pad_left == (640 - spec.new_w) // 2
    # odd padding goes bottom/right-heavy like cv2.copyMakeBorder usage
    spec2 = letterbox_spec((100, 300), (64, 64))
    assert spec2.new_h + spec2.pad_top <= 64


@pytest.mark.parametrize("src_hw", [(1080, 1920), (480, 640), (640, 640), (97, 211)])
def test_preprocess_batch_matches_cv2_oracle(rng, src_hw):
    frames = rng.integers(0, 256, (3, *src_hw, 3), dtype=np.uint8)
    got = np.asarray(
        preprocess_batch(
            jnp.asarray(frames),
            spec=letterbox_spec(src_hw, (640, 640)),
            out_dtype=jnp.float32,
        )
    )
    for i in range(len(frames)):
        exp, meta = letterbox_numpy(frames[i], (640, 640))
        assert meta["orig_shape"] == src_hw
        # cv2 uses fixed-point bilinear taps; allow a couple of 8-bit steps.
        diff = np.abs(got[i] - exp[0])
        assert diff.max() <= 3.01 / 255.0, f"max diff {diff.max()*255:.2f}/255"
        assert np.mean(diff > 1.01 / 255.0) < 0.02


def test_preprocess_pad_value_and_layout(rng):
    frames = rng.integers(0, 256, (1, 480, 640, 3), dtype=np.uint8)
    spec = letterbox_spec((480, 640), (640, 640))
    out = np.asarray(
        preprocess_batch(jnp.asarray(frames), spec=spec, out_dtype=jnp.float32)
    )
    assert out.shape == (1, 3, 640, 640)
    # top pad rows must be 114/255 in all channels
    np.testing.assert_allclose(out[0, :, : spec.pad_top, :], 114.0 / 255.0, atol=1e-6)
    # NHWC layout option
    out2 = np.asarray(
        preprocess_batch(
            jnp.asarray(frames), spec=spec, out_dtype=jnp.float32, layout="NHWC"
        )
    )
    assert out2.shape == (1, 640, 640, 3)
    np.testing.assert_allclose(out2[0], out[0].transpose(1, 2, 0), atol=1e-6)

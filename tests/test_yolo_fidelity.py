"""Checkpoint-fidelity tests: JAX YOLO + loader vs a torch mirror with
Ultralytics state-dict layout. This is the acceptance gate from SURVEY.md §7
step 2 (boxes/scores must match the checkpoint's native forward)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from realtime_analytics_tpu.models.weights import (
    load_yolo_checkpoint,
    yolo_params_from_state_dict,
)
from realtime_analytics_tpu.models.yolo import build_yolo, size_from_model_path

from torch_mirror import TorchYoloMirror


@pytest.mark.parametrize("model_type", ["yolov8", "yolov5"])
def test_yolo_matches_torch_mirror(model_type):
    torch.manual_seed(3)
    jm = build_yolo(model_type, "n", nc=80)
    tm = TorchYoloMirror(jm).eval()

    x = torch.rand(2, 3, 160, 160)
    t_boxes, t_scores = tm(x)

    params = yolo_params_from_state_dict(jm, tm.ultralytics_state_dict())
    out = jax.jit(jm.apply)(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    j_boxes = np.asarray(out["boxes_xyxy"])
    j_scores = np.asarray(out["scores"])

    assert j_boxes.shape == tuple(t_boxes.shape)
    # boxes are in pixels; 0.1 px absolute tolerance (fp32 accumulation is
    # amplified by the anchor-scaled decode, e.g. (2p)^2 * 373 for v5 P5)
    np.testing.assert_allclose(j_boxes, t_boxes.numpy(), atol=1e-1, rtol=1e-3)
    np.testing.assert_allclose(j_scores, t_scores.numpy(), atol=2e-3, rtol=1e-3)


def test_load_checkpoint_from_pt_file(tmp_path):
    torch.manual_seed(4)
    jm = build_yolo("yolov8", "n", nc=80)
    tm = TorchYoloMirror(jm).eval()
    path = tmp_path / "yolov8n.pt"
    torch.save(tm.ultralytics_state_dict(), path)

    params = load_yolo_checkpoint(jm, str(path))
    assert params is not None
    x = torch.rand(1, 3, 160, 160)
    t_boxes, _ = tm(x)
    out = jm.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out["boxes_xyxy"]), t_boxes.numpy(), atol=2e-2, rtol=1e-3
    )


def test_load_checkpoint_from_npz(tmp_path):
    torch.manual_seed(5)
    jm = build_yolo("yolov5", "n", nc=80)
    tm = TorchYoloMirror(jm).eval()
    path = tmp_path / "yolov5n.npz"
    np.savez(
        path, **{k: v.numpy() for k, v in tm.ultralytics_state_dict().items()}
    )
    params = load_yolo_checkpoint(jm, str(path))
    assert params is not None


def test_load_checkpoint_bad_file_returns_none(tmp_path):
    path = tmp_path / "junk.pt"
    path.write_bytes(b"not a checkpoint")
    jm = build_yolo("yolov8", "n", nc=80)
    assert load_yolo_checkpoint(jm, str(path)) is None
    assert load_yolo_checkpoint(jm, str(tmp_path / "missing.pt")) is None


def test_size_from_model_path():
    assert size_from_model_path("models/yolov8s.pt") == "s"
    assert size_from_model_path("/x/yolov5m.onnx") == "m"
    assert size_from_model_path("custom.pt", default="n") == "n"


@pytest.mark.parametrize("model_type", ["yolov8", "yolov5"])
def test_reduce_scores_matches_full_decode(model_type):
    """The serving decode (reduce_scores=True: per-anchor max/argmax on raw
    logits, sigmoid monotonicity) must equal max/argmax of the full score
    matrix — same boxes, same conf, same class ids."""
    import jax
    import jax.numpy as jnp

    model = build_yolo(model_type, "n", nc=16)
    params = model.init_params(jax.random.PRNGKey(3))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    )
    full = model.apply(params, x)
    red = model.apply(params, x, reduce_scores=True)

    np.testing.assert_allclose(
        np.asarray(red["boxes_xyxy"]), np.asarray(full["boxes_xyxy"]), rtol=1e-5
    )
    scores = np.asarray(full["scores"])
    np.testing.assert_allclose(
        np.asarray(red["conf"]), scores.max(-1), rtol=1e-5, atol=1e-6
    )
    # argmax ties are broken identically only when scores differ; mask ties
    want_cls = scores.argmax(-1)
    got_cls = np.asarray(red["cls"])
    agree = want_cls == got_cls
    tie = (
        np.take_along_axis(scores, got_cls[..., None], -1)[..., 0]
        >= scores.max(-1) - 1e-6
    )
    assert np.all(agree | tie)

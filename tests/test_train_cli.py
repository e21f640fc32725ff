"""In-framework training: labeled synthetic data, train CLI, checkpoint
round-trip into the serving engine (the reference is inference-only)."""

import numpy as np

from realtime_analytics_tpu.ingest.synthetic import SyntheticSource


def test_read_labeled_boxes_match_rendered_pixels():
    src = SyntheticSource(width=160, height=120, boxes=3, seed=2)
    ok, frame, boxes, classes = src.read_labeled()
    assert ok and boxes.shape == (3, 4) and classes.tolist() == [0, 1, 2]
    for x1, y1, x2, y2 in boxes:
        assert 0 <= x1 < x2 <= 160 and 0 <= y1 < y2 <= 120
        cx, cy = int((x1 + x2) / 2), int((y1 + y2) / 2)
        # box centers land on bright rendered pixels, background stays dark
        assert frame[cy, cx].max() >= 120, "GT box center is not rendered"
    assert frame[0, 0].max() <= 24


def test_train_cli_decreases_loss_and_roundtrips(tmp_path):
    from realtime_analytics_tpu.scripts.train import main

    out = tmp_path / "trained.npz"
    rc = main([
        "--steps", "30", "--batch", "4", "--nc", "4",
        "--boxes-per-image", "2", "--input-size", "64", "64",
        "--log-every", "10", "--out", str(out), "--seed", "1",
    ])
    assert rc == 0 and out.exists()

    # the saved pytree loads straight into the serving engine
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    eng = JaxYoloEngine(DetectorConfig(
        model_path=str(out), model_type="yolov8", num_classes=4,
        input_size=[64, 64], warmup=False, precision="fp32",
        max_batch_size=1, batch_buckets=[1], pre_nms_topk=64,
        max_detections=8, confidence_threshold=0.05,
    ))
    frame = SyntheticSource(width=96, height=96, boxes=2, seed=9).read()[1]
    br = eng.predict_arrays(frame[None])
    assert br.boxes_xyxy.shape[0] == 1  # runs end to end


def test_pytree_checkpoint_shape_mismatch_rejected(tmp_path):
    """A pytree checkpoint for a different architecture must be refused
    (fall back to random init), not silently mis-loaded."""
    import jax

    from realtime_analytics_tpu.models.weights import load_yolo_checkpoint
    from realtime_analytics_tpu.models.yolo import build_yolo

    small = build_yolo("yolov8", "n", nc=2)
    params = jax.tree_util.tree_map(np.asarray,
                                    small.init_params(jax.random.PRNGKey(0)))
    path = tmp_path / "nc2.npz"
    np.savez(path, __pytree__=np.array(params, dtype=object))

    other = build_yolo("yolov8", "n", nc=80)
    assert load_yolo_checkpoint(other, str(path)) is None
    same = build_yolo("yolov8", "n", nc=2)
    assert load_yolo_checkpoint(same, str(path)) is not None


def test_train_checkpoint_resume(tmp_path):
    """Crash-safe training: periodic full-state checkpoints (params +
    optimizer state + step) and --resume continuing the step count."""
    import numpy as np

    from realtime_analytics_tpu.scripts.train import main

    ckdir = str(tmp_path / "ck")
    common = ["--batch", "2", "--nc", "3", "--boxes-per-image", "1",
              "--input-size", "64", "64", "--log-every", "50",
              "--checkpoint-dir", ckdir, "--checkpoint-every", "3",
              "--seed", "2"]
    out = str(tmp_path / "seed.npz")
    assert main(["--steps", "6", "--out", out, *common]) == 0
    ck = tmp_path / "ck" / "train_state.npz"
    assert ck.exists()
    tree = np.load(ck, allow_pickle=True)["__pytree__"].item()
    assert tree["step"] == 6
    assert "opt_state" in tree and "params" in tree

    # --steps is the TOTAL budget: a crash-recovery rerun of the original
    # command line (--steps 10) completes steps 7..10, not 10 more. Also:
    # --init-from must NOT clobber a resumed checkpoint (crash-recovery
    # reruns keep the original command line, --init-from included)
    assert main(["--steps", "10", "--resume", "--init-from", out, *common]) == 0
    tree = np.load(ck, allow_pickle=True)["__pytree__"].item()
    assert tree["step"] == 10  # original budget completed, not restarted

    # resuming at or past the budget performs no extra steps
    assert main(["--steps", "10", "--resume", *common]) == 0
    tree = np.load(ck, allow_pickle=True)["__pytree__"].item()
    assert tree["step"] == 10

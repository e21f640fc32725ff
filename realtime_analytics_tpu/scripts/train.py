"""``realtime-analytics-train``: fine-tune a detection model in-framework.

The reference is inference-only (models arrive as opaque .pt/.onnx files);
this framework carries a full sharded training step (forward, anchor-free
detection loss, backward, optax update — ``parallel/train.py``), so models
are trainable on-device, optionally over a (dp, tp) mesh.

Built-in data: the synthetic video source renders moving rectangles AND
knows their ground-truth boxes (``SyntheticSource.read_labeled``), so the
CLI trains/evaluates end to end with zero datasets — useful as a smoke
train, an overfit sanity check, and a template for plugging real data in
(`--steps`, `--batch`, `--mesh`).

The checkpoint (.npz pytree) loads straight back into the serving engine:
  realtime-analytics-train --steps 300 --out models/synth.npz
  # then detector.model_path: models/synth.npz
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def synthetic_batch(sources, input_hw, max_boxes):
    """One labeled batch from N synthetic sources: images normalized [0,1]
    RGB at input_hw, padded target boxes/classes/mask."""
    import cv2

    n = len(sources)
    h, w = input_hw
    images = np.empty((n, h, w, 3), np.float32)
    boxes = np.zeros((n, max_boxes, 4), np.float32)
    classes = np.zeros((n, max_boxes), np.int32)
    mask = np.zeros((n, max_boxes), bool)
    for i, src in enumerate(sources):
        ok, frame, gt, cls = src.read_labeled()
        if not ok:
            raise RuntimeError("synthetic source ended")
        sy, sx = h / frame.shape[0], w / frame.shape[1]
        resized = cv2.resize(frame, (w, h), interpolation=cv2.INTER_LINEAR)
        images[i] = resized[..., ::-1].astype(np.float32) / 255.0
        m = min(len(gt), max_boxes)
        boxes[i, :m] = gt[:m] * np.asarray([sx, sy, sx, sy], np.float32)
        classes[i, :m] = cls[:m]
        mask[i, :m] = True
    return images, {"boxes": boxes, "classes": classes, "mask": mask}


def mean_best_iou(engine, sources, input_hw, n_frames=8):
    """Detection quality probe: mean IoU of the best detection per GT box."""
    from ..ops.boxes import iou_matrix
    import jax.numpy as jnp

    total, count = 0.0, 0
    for src in sources[:4]:
        for _ in range(max(1, n_frames // 4)):
            ok, frame, gt, _cls = src.read_labeled()
            if not ok:
                return 0.0
            br = engine.predict_arrays(frame[None])
            nv = int(br.num_valid[0])
            if nv == 0:
                count += len(gt)
                continue
            ious = np.asarray(
                iou_matrix(jnp.asarray(gt), jnp.asarray(br.boxes_xyxy[0, :nv]))
            )
            total += float(ious.max(axis=1).sum())
            count += len(gt)
    return total / max(count, 1)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="realtime-analytics-train")
    p.add_argument("--model-type", default="yolov8", choices=["yolov8", "yolov5"])
    p.add_argument("--size", default="n", choices=list("nsmlx"))
    p.add_argument("--nc", type=int, default=8, help="number of classes")
    p.add_argument("--input-size", type=int, nargs=2, default=[128, 128],
                   metavar=("H", "W"))
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--boxes-per-image", type=int, default=3)
    p.add_argument("--mesh", default=None, metavar="DP,TP",
                   help="e.g. 4,2 — pjit the train step over a device mesh")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init-from", default=None,
                   help="checkpoint to fine-tune from (.pt/.npz/.onnx)")
    p.add_argument("--out", default=None, help="save .npz pytree checkpoint")
    p.add_argument("--eval", action="store_true",
                   help="report detection IoU before/after training")
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--checkpoint-dir", default=None,
                   help="periodic FULL train-state checkpoints (params + "
                        "optimizer state + step) for crash-safe resume")
    p.add_argument("--checkpoint-every", type=int, default=100)
    p.add_argument("--resume", action="store_true",
                   help="continue from --checkpoint-dir's latest state")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import DetectorConfig
    from ..ingest.synthetic import SyntheticSource
    from ..models.weights import load_yolo_checkpoint
    from ..models.yolo import build_yolo
    from ..parallel.mesh import batch_sharding, make_mesh, replicated
    from ..parallel.train import TrainState, make_train_step

    input_hw = tuple(args.input_size)
    model = build_yolo(args.model_type, args.size, nc=args.nc)

    if args.mesh:
        dp, tp = (int(v) for v in args.mesh.split(","))
        mesh = make_mesh(dp * tp, shape=(dp, tp))
    else:
        mesh = make_mesh(1, shape=(1, 1))
    init_fn, step_fn = make_train_step(model, mesh, input_hw,
                                       learning_rate=args.lr)

    sources = [
        SyntheticSource(width=input_hw[1] * 2, height=input_hw[0] * 2,
                        boxes=args.boxes_per_image, seed=args.seed + i)
        for i in range(args.batch)
    ]

    def as_engine(params):
        from ..engine.detector import JaxYoloEngine

        cfg = DetectorConfig(
            model_path="__trained__.pt", model_type=args.model_type,
            num_classes=args.nc, input_size=list(input_hw),
            confidence_threshold=0.10, warmup=False, precision="fp32",
            max_batch_size=1, batch_buckets=[1], pre_nms_topk=256,
            max_detections=16,
        )
        host = jax.tree_util.tree_map(np.asarray, params)
        return JaxYoloEngine(cfg, params=jax.tree_util.tree_map(
            jnp.asarray, host))

    ckpt_path = None
    if args.checkpoint_dir:
        import os

        os.makedirs(args.checkpoint_dir, exist_ok=True)
        ckpt_path = os.path.join(args.checkpoint_dir, "train_state.npz")

    def save_state(state):
        """Atomic full-state checkpoint: params + optimizer state + step
        (the object-array pytree trick used for .npz model checkpoints;
        optax states are namedtuples of arrays, so they round-trip)."""
        import os

        host = jax.tree_util.tree_map(
            np.asarray,
            {"params": state.params, "opt_state": state.opt_state,
             "step": int(state.step)},
        )
        tmp = ckpt_path + ".tmp.npz"
        np.savez(tmp, __pytree__=np.array(host, dtype=object))
        os.replace(tmp, ckpt_path)

    with mesh:
        state = init_fn(jax.random.PRNGKey(args.seed))
        resumed = False
        if args.resume and ckpt_path:
            import os

            if os.path.exists(ckpt_path):
                resumed = True
                tree = np.load(ckpt_path, allow_pickle=True)["__pytree__"].item()
                # adopt the init state's shardings for the restored leaves
                state = jax.tree_util.tree_map(
                    lambda restored, like: jax.device_put(
                        jnp.asarray(restored), like.sharding
                    ),
                    TrainState(params=tree["params"],
                               opt_state=tree["opt_state"],
                               step=np.int32(tree["step"])),
                    state,
                )
                print(f"resumed from {ckpt_path} at step {int(state.step)}")
            else:
                print(f"--resume: no checkpoint at {ckpt_path}, starting fresh")
        # --init-from seeds a FRESH run only: a resumed checkpoint already
        # contains the (further-trained) params plus matching optimizer
        # moments — overwriting the params here would silently discard the
        # training progress while keeping stale Adam state
        if args.init_from and not resumed:
            loaded = load_yolo_checkpoint(model, args.init_from)
            if loaded is None:
                print(f"could not load --init-from {args.init_from}",
                      file=sys.stderr)
                return 1
            state = TrainState(params=loaded, opt_state=state.opt_state,
                               step=state.step)

        if args.eval:
            iou0 = mean_best_iou(as_engine(state.params), sources, input_hw)
            print(f"eval before: mean best-IoU {iou0:.3f}")

        t0 = time.perf_counter()
        first = last = None
        # resume completes the ORIGINAL step budget: a run restored at step
        # k performs steps k+1..args.steps, and checkpoint cadence keys to
        # the global step, not a restarted loop counter
        start_step = int(state.step) + 1
        if start_step > args.steps:
            print(f"checkpoint already at step {start_step - 1} >= "
                  f"--steps {args.steps}; nothing to do")
        for step in range(start_step, args.steps + 1):
            images, targets = synthetic_batch(
                sources, input_hw, args.boxes_per_image
            )
            im = jax.device_put(images, batch_sharding(mesh, 4))
            tg = {
                "boxes": jax.device_put(targets["boxes"], batch_sharding(mesh, 3)),
                "classes": jax.device_put(targets["classes"], batch_sharding(mesh, 2)),
                "mask": jax.device_put(targets["mask"], batch_sharding(mesh, 2)),
            }
            state, loss = step_fn(state, im, tg)
            if ckpt_path and (step % args.checkpoint_every == 0
                              or step == args.steps):
                save_state(state)
            if step == 1 or step % args.log_every == 0 or step == args.steps:
                loss_v = float(loss)
                first = first if first is not None else loss_v
                last = loss_v
                rate = ((step - start_step + 1) * args.batch
                        / (time.perf_counter() - t0))
                print(f"step {step:5d}  loss {loss_v:8.4f}  "
                      f"({rate:.1f} images/s)")

        if args.eval:
            iou1 = mean_best_iou(as_engine(state.params), sources, input_hw)
            print(f"eval after:  mean best-IoU {iou1:.3f}")

    if args.out:
        host = jax.tree_util.tree_map(np.asarray, state.params)
        np.savez(args.out, __pytree__=np.array(host, dtype=object))
        print(f"saved {args.out} (loads via detector.model_path)")
    if first is not None and last is not None and last >= first:
        print("warning: loss did not decrease", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

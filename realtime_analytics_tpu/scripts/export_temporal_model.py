"""Export/initialize temporal model weights as .npz pytrees.

The reference ships a PyTorch->ONNX exporter with demo architectures
(scripts/convert_temporal_model_to_onnx.py) so users can run temporal
pipelines without real checkpoints. The TPU-native analog: initialize (or
convert) a temporal model's params pytree and save it as ``.npz`` with a
single ``__pytree__`` object entry — the format ``JaxTemporalEngine``
loads.

Usage:
  python -m realtime_analytics_tpu.scripts.export_temporal_model \
      --model-type cnn_lstm --num-classes 400 --out models/cnn_lstm.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model-type", required=True,
                   choices=["cnn_lstm", "3d_cnn", "conv_gru", "slow_fast"])
    p.add_argument("--num-classes", type=int, default=400)
    p.add_argument("--pooling", default="avg", choices=["avg", "max", "last"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--verify", action="store_true",
                   help="reload and run one clip through the engine")
    args = p.parse_args(argv)

    import jax

    from realtime_analytics_tpu.models.temporal import build_temporal

    model = build_temporal(args.model_type, args.num_classes, args.pooling)
    params = model.init_params(jax.random.PRNGKey(args.seed))
    params = jax.tree_util.tree_map(np.asarray, params)
    np.savez(args.out, __pytree__=np.array(params, dtype=object))
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))
    print(f"wrote {args.out}: {args.model_type}, {n_params/1e6:.2f}M params")

    if args.verify:
        import time

        from realtime_analytics_tpu.config import DetectorConfig
        from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine
        from realtime_analytics_tpu.types import FramePacket
        from realtime_analytics_tpu.config import StreamConfig

        cfg = DetectorConfig(
            model_path=args.out, model_type=args.model_type, backend="jax",
            sequence_length=8, num_action_classes=args.num_classes,
            confidence_threshold=1e-6,
        )
        eng = JaxTemporalEngine(cfg)
        stream = StreamConfig(name="verify", url="synthetic://")
        rng = np.random.default_rng(0)
        dets = []
        for i in range(8):
            frame = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
            dets = eng.predict(FramePacket(stream, frame, i, time.time()))
        print(f"verify: clip produced {len(dets)} TemporalDetections")
    return 0


if __name__ == "__main__":
    sys.exit(main())

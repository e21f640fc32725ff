"""bf16 (production precision) fidelity vs the fp32 torch mirror.

fp32 fidelity is exact (tests/test_yolo_fidelity.py); this guards the bf16
cast + bf16-output convs against accuracy regressions: scores must stay
within a few 1e-3 of the checkpoint's fp32 forward.
"""

import numpy as np
import torch

import jax.numpy as jnp

from realtime_analytics_tpu.models.weights import yolo_params_from_state_dict
from realtime_analytics_tpu.models.yolo import build_yolo

from torch_mirror import TorchYoloMirror


def test_bf16_scores_close_to_checkpoint_fp32():
    torch.manual_seed(9)
    jm = build_yolo("yolov8", "n", nc=80)
    tm = TorchYoloMirror(jm).eval()
    params = yolo_params_from_state_dict(jm, tm.ultralytics_state_dict())
    import jax

    params16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )

    x = torch.rand(1, 3, 160, 160)
    t_boxes, t_scores = tm(x)
    out = jm.apply(params16, jnp.asarray(x.numpy().transpose(0, 2, 3, 1),
                                         dtype=jnp.bfloat16))
    j_scores = np.asarray(out["scores"], dtype=np.float32)
    j_boxes = np.asarray(out["boxes_xyxy"], dtype=np.float32)

    score_diff = np.abs(j_scores - t_scores.numpy())
    box_diff = np.abs(j_boxes - t_boxes.numpy())
    # bf16 has ~3 decimal digits; class probabilities must stay close enough
    # that conf-thresholded detections are stable
    assert score_diff.max() < 0.02, f"score drift {score_diff.max():.4f}"
    assert np.median(box_diff) < 1.0, f"median box drift {np.median(box_diff):.2f}px"

"""ResNet classifiers (functional JAX, NHWC, BN folded).

Capability parity with the reference's ResNet classification path
(reference detector.py:872-1134: ResNetOpenVINO/ResNetONNX detectors), which
resizes without letterbox, applies ImageNet mean/std normalization, and emits
top-K class predictions as full-frame Detections.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from .layers import conv2d, init_conv, max_pool

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# blocks per stage, bottleneck?
_DEPTHS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
}


@dataclass
class ResNetModel:
    variant: str
    num_classes: int
    stages: Tuple[int, ...]
    bottleneck: bool

    def init_params(self, key: jax.Array) -> Dict:
        keys = iter(jax.random.split(key, 256))
        params: Dict = {"stem": init_conv(next(keys), 3, 64, 7)}
        cin = 64
        layers: List = []
        width = 64
        for stage_idx, n_blocks in enumerate(self.stages):
            stride = 1 if stage_idx == 0 else 2
            blocks = []
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                cout = width * (4 if self.bottleneck else 1)
                blk: Dict = {}
                if self.bottleneck:
                    blk["conv1"] = init_conv(next(keys), cin, width, 1)
                    blk["conv2"] = init_conv(next(keys), width, width, 3)
                    blk["conv3"] = init_conv(next(keys), width, cout, 1)
                else:
                    blk["conv1"] = init_conv(next(keys), cin, width, 3)
                    blk["conv2"] = init_conv(next(keys), width, cout, 3)
                if s != 1 or cin != cout:
                    blk["down"] = init_conv(next(keys), cin, cout, 1)
                blocks.append(blk)
                cin = cout
            layers.append(blocks)
            width *= 2
        params["layers"] = layers
        fck = next(keys)
        params["fc"] = {
            "w": jax.random.normal(fck, (cin, self.num_classes), jnp.float32)
            * (1.0 / jnp.sqrt(cin)),
            "b": jnp.zeros((self.num_classes,), jnp.float32),
        }
        return params

    def apply(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, H, W, 3] ImageNet-normalized RGB -> logits [N, num_classes]."""
        y = jax.nn.relu(conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2))
        y = max_pool(y, 3, stride=2)
        for stage_idx, blocks in enumerate(params["layers"]):
            stride = 1 if stage_idx == 0 else 2
            for b, blk in enumerate(blocks):
                s = stride if b == 0 else 1
                identity = y
                if self.bottleneck:
                    h = jax.nn.relu(conv2d(y, blk["conv1"]["w"], blk["conv1"]["b"]))
                    h = jax.nn.relu(
                        conv2d(h, blk["conv2"]["w"], blk["conv2"]["b"], stride=s)
                    )
                    h = conv2d(h, blk["conv3"]["w"], blk["conv3"]["b"])
                else:
                    h = jax.nn.relu(
                        conv2d(y, blk["conv1"]["w"], blk["conv1"]["b"], stride=s)
                    )
                    h = conv2d(h, blk["conv2"]["w"], blk["conv2"]["b"])
                if "down" in blk:
                    identity = conv2d(y, blk["down"]["w"], blk["down"]["b"], stride=s)
                y = jax.nn.relu(h + identity)
        pooled = jnp.mean(y, axis=(1, 2))
        return pooled @ params["fc"]["w"] + params["fc"]["b"]


def build_resnet(variant: str = "resnet50", num_classes: int = 1000) -> ResNetModel:
    if variant not in _DEPTHS:
        raise ValueError(f"unsupported resnet variant: {variant}")
    stages, bottleneck = _DEPTHS[variant]
    return ResNetModel(
        variant=variant, num_classes=num_classes, stages=stages, bottleneck=bottleneck
    )


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB NHWC -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std

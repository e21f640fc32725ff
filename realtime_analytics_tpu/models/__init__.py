"""Model zoo: functional JAX implementations with pytree params.

One JAX engine replaces the reference's five native backends
(reference detector.py:106-869). Models:

  * ``yolo``      — YOLOv8 (anchor-free, DFL head) and YOLOv5 (anchor-based)
  * ``resnet``    — ResNet-18/34/50 ImageNet classifiers
  * ``temporal``  — CNN-LSTM / 3D-CNN / ConvGRU / SlowFast clip models
  * ``onnx_jax`` / ``onnx_graph_model`` — ANY user ONNX graph, compiled to
    one jitted XLA program (the reference's arbitrary-graph ONNX backend,
    reference detector.py:484-609); ``onnx_exec`` is its numpy twin (the
    fidelity oracle)

All models are pure functions ``apply(params, x) -> outputs`` over NHWC
inputs with HWIO conv weights (TPU-native layouts); BatchNorm is folded into
conv weights at load time.
"""

from .yolo import YoloModel, build_yolo  # noqa: F401
from .resnet import ResNetModel, build_resnet  # noqa: F401

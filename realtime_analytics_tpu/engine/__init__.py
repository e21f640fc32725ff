"""The unified JAX inference engine.

One engine replaces the reference's five pluggable native backends
(Ultralytics/TensorRT/ONNX Runtime/OpenVINO/RKNN — reference
detector.py:54-96). Submodules:

  * ``detector``  — YOLO detection + ResNet classification engines and the
    ``create_detector`` factory (reference-compatible routing)
  * ``temporal``  — clip-model engines with sliding-window buffering
  * ``batcher``   — the cross-stream dynamic batcher (asyncio)
  * ``export``    — AOT ``.rvae`` serving artifacts (TensorRT-.engine
    analog) and the Exported*Engine classes that serve from them
"""

from .detector import (  # noqa: F401
    BaseDetector,
    JaxResNetEngine,
    JaxYoloEngine,
    create_detector,
)
from .batcher import InferenceBatcher  # noqa: F401

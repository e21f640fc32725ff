"""realtime_analytics_tpu — TPU-native multi-stream realtime video analytics.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``skygazer42/realtime-video-analytics-32streams``: up to 32 concurrent
RTSP/RTMP/file video streams, YOLOv5/v8 detection (plus ResNet classification
and CNN-LSTM / 3D-CNN / ConvGRU / SlowFast temporal action models), IOU
tracking, Kafka/event-bus sinks, Prometheus metrics and a live WebSocket
dashboard.

Architecture (TPU-first, not a port):
  * a single JAX detector engine replaces the reference's five pluggable
    native backends (Ultralytics / ONNX Runtime / TensorRT / OpenVINO / RKNN
    — reference ``src/realtime_analytics/detector.py``),
  * a cross-stream dynamic batcher packs frames from all streams into one
    device batch per step (the reference calls ``predict`` per-frame
    per-stream: ``pipeline.py:179``),
  * preprocess (letterbox, BGR->RGB, normalize), YOLO forward, box decode and
    NMS run as one fused jitted graph with static bucketed shapes,
  * multi-chip scaling is expressed with ``jax.sharding.Mesh`` + ``shard_map``
    (see ``realtime_analytics_tpu.parallel``).
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    ConfigError,
    DetectorConfig,
    FFmpegSimulatorConfig,
    KafkaSinkConfig,
    PipelineConfig,
    PrometheusConfig,
    StreamConfig,
    TrackerConfig,
    load_config,
)
from .types import Detection, FramePacket, TemporalDetection, Track  # noqa: F401

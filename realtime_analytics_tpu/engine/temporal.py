"""Temporal detection engines: sliding-window clip inference.

Preserves the reference's buffering contract exactly
(temporal_detector.py:50-147):

  * per-stream ring buffer of ``sequence_length * sequence_stride`` frames;
  * a clip is the strided sample ``buffer[i * stride] for i in range(T)``;
  * after inference, ``required - step`` frames are retained for overlap,
    where ``step = max(1, int(T * (1 - temporal_overlap)))``;
  * results are ``TemporalDetection``s: top-5 action classes over the clip,
    full-frame boxes, clip start/end frame ids.

Preprocessing matches the reference per model family: CNN-LSTM/ConvGRU use
ImageNet mean/std at 224x224 (temporal_detector.py:330-373); 3D-CNN/SlowFast
use mean/std 0.45/0.225 at 112x112 (temporal_detector.py:554-593). It all
runs inside the jitted clip step (device resize + normalize), one compile per
(bucket x source resolution).
"""

from __future__ import annotations

import logging
import time
from collections import deque
from typing import Deque, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import DetectorConfig
from ..models.temporal import build_temporal
from ..types import Detection, FramePacket, TemporalDetection
from .detector import BaseDetector, _pick_device

logger = logging.getLogger(__name__)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
TOP_K = 5  # reference emits top-5 actions per clip


class JaxTemporalEngine(BaseDetector):
    """CNN-LSTM / 3D-CNN / ConvGRU / SlowFast engine."""

    def __init__(self, config: DetectorConfig, params: Optional[Dict] = None):
        config.validate()
        self.config = config
        self.device = _pick_device(config)
        self.model = build_temporal(
            config.model_type, config.num_action_classes, config.temporal_pooling
        )
        self.input_hw: Tuple[int, int] = config.resolved_input_size
        # reference `half: true` means fp16 on GPU; on TPU the half
        # precision is bf16 — so half overrides an fp32 precision setting
        self.compute_dtype = (
            jnp.float32
            if config.precision == "fp32" and not config.half
            else jnp.bfloat16
        )
        if config.model_type in ("3d_cnn", "slow_fast"):
            self._mean = (0.45, 0.45, 0.45)
            self._std = (0.225, 0.225, 0.225)
        else:
            self._mean = IMAGENET_MEAN
            self._std = IMAGENET_STD

        params = params or self._try_load(config.model_path)
        if params is None:
            # generic-graph fallback: the reference's temporal detectors
            # execute ARBITRARY user ONNX graphs through ONNX Runtime
            # (temporal_detector.py:179-319) — when the file matches no
            # documented layout but carries a full graph, compile the
            # graph itself (models/onnx_jax.py) and serve it
            from ..models.onnx_graph_model import (
                graph_dtype,
                load_graph_fallback,
            )

            loaded = load_graph_fallback(
                config.model_path, "temporal",
                model_type=config.model_type,
                t_len=config.sequence_length,
                input_hw=tuple(self.input_hw),
                compute_dtype=graph_dtype(config.graph_precision),
            )
            if loaded is not None:
                self.model, params = loaded
        if params is None:
            logger.warning(
                "No loadable temporal weights at '%s' — using random init.",
                config.model_path,
            )
            params = self.model.init_params(jax.random.PRNGKey(0))
        if getattr(self.model, "graph_backed", False):
            # foreign graph numerics are the user's contract — fp32 end to
            # end by default, including the clip normalize feeding it;
            # graph_precision: bf16 opts into the mixed policy (detector.py
            # YOLO engine carries the rationale)
            self.compute_dtype = self.model.compute_dtype
        if self.compute_dtype != jnp.float32:
            from ..models.onnx_graph_model import cast_params_for_compute

            params = cast_params_for_compute(
                params, self.compute_dtype,
                getattr(self.model, "fp32_param_names", frozenset()),
            )
        # multi-chip: [dp, tp] shards channels over tp, clip batches over dp
        # (graph-backed temporal graphs: dp-only — BaseDetector._init_mesh)
        self._init_mesh(params)

        self.sequence_step = max(
            1, int(config.sequence_length * (1.0 - config.temporal_overlap))
        )
        self._buffers: Dict[str, Deque[FramePacket]] = {}
        self._steps: Dict[Tuple[int, int, int], object] = {}
        # warmup-measured step ms, keyed src_hw -> {bucket: ms}
        self._bucket_cost_ms: Dict[Tuple[int, int], Dict[int, float]] = {}
        self.last_infer_ms = 0.0

    def _try_load(self, path: str) -> Optional[Dict]:
        """Native .npz pytree, torch-named flat .npz, weights-.onnx, or .pt —
        the same checkpoint families the reference ingests via ONNX Runtime
        (temporal_detector.py:179-319)."""
        from ..models.weights import load_temporal_checkpoint

        return load_temporal_checkpoint(self.model, path)

    # -- clip step -----------------------------------------------------------

    def _host_resize_active(self) -> bool:
        """Host-side stretch resize of clip frames to ``input_size`` (the
        reference's own per-frame cv2 resize, temporal_detector.py:330-373):
        a 1080p 16-frame clip uploads 16 x 0.15 MB instead of 16 x 6 MB —
        bytes-on-link parity with the YOLO pick path.

        Requires cv2: warmup and predict MUST make the same decision, or
        warmup compiles/times the resized variant while predict silently
        falls back to raw-resolution steps that were never compiled
        (hot-path jit stalls + bucket costs measured on the wrong step)."""
        if self.config.host_resize == "off":
            return False
        if self.config.host_resize == "auto" and self.device.platform != "tpu":
            return False
        try:
            import cv2  # noqa: F401
        except ImportError:
            if self.config.host_resize == "on":
                from ..config import ConfigError

                raise ConfigError(
                    "host_resize: on requires cv2, which is not importable — "
                    "install opencv or set host_resize to auto/off"
                )
            if not getattr(self, "_warned_no_cv2", False):
                self._warned_no_cv2 = True
                logger.warning(
                    "host_resize: auto requested but cv2 is unavailable — "
                    "falling back to full-resolution device clip steps "
                    "(different compile shapes, more bytes on the link)"
                )
            return False
        return True

    def _host_resize_clips(self, sequences, idxs, src_hw) -> Optional[np.ndarray]:
        """[B, T, th, tw, 3] uint8 clips, resized frame by frame on the host
        straight into the batch buffer. None when inactive / no-op / no cv2."""
        th, tw = self.input_hw
        if tuple(src_hw) == (th, tw) or not self._host_resize_active():
            return None
        try:
            import cv2
        except ImportError:
            return None
        t_len = self.config.sequence_length
        out = np.empty((len(idxs), t_len, th, tw, 3), dtype=np.uint8)
        for j, i in enumerate(idxs):
            for t, p in enumerate(sequences[i]):
                cv2.resize(p.frame, (tw, th), dst=out[j, t],
                           interpolation=cv2.INTER_LINEAR)
        return out

    def warmup(self, src_hw: Tuple[int, int], buckets=None) -> None:
        """Pre-compile the clip step for each bucket (reference warms its
        temporal sessions too, temporal_detector.py:231-249) and time it —
        clip-bucket cost is non-monotonic on TPU for the same batch-minor
        layout reason as detection buckets (engine/detector.py). Warms the
        exact executable predict will use — the host-resized variant when
        active."""
        import time as _time

        buckets = buckets or self.config.resolved_buckets
        t_len = self.config.sequence_length
        th, tw = self.input_hw
        resized = (
            self._host_resize_active() and tuple(src_hw) != (th, tw)
        )
        costs = self._bucket_cost_ms.setdefault(tuple(src_hw), {})
        for b in buckets:
            rb = self._round_mesh(b)
            if resized:
                step = self._get_step_resized(rb)
                clips = np.zeros((rb, t_len, th, tw, 3), np.uint8)
            else:
                step = self._get_step(rb, src_hw)
                clips = np.zeros((rb, t_len, *src_hw, 3), np.uint8)
            jax.block_until_ready(self._mesh_call(step, clips))
            cost = float("inf")
            for _ in range(3):
                t0 = _time.perf_counter()
                jax.block_until_ready(self._mesh_call(step, clips))
                cost = min(cost, (_time.perf_counter() - t0) * 1e3)
            costs[b] = cost
            logger.info(
                "temporal warmup: compiled bucket B=%d src=%s "
                "(host_resize=%s) step=%.1fms", rb, src_hw, resized, cost,
            )

    def _clip_head(self, params, x, b):
        """Shared tail: x is [B*T, th, tw, 3] float32 RGB in [0, 1]."""
        th, tw = self.input_hw
        mean = jnp.asarray(self._mean, jnp.float32)
        std = jnp.asarray(self._std, jnp.float32)
        x = ((x - mean) / std).astype(self.compute_dtype)
        x = x.reshape(b, self.config.sequence_length, th, tw, 3)
        logits = self.model.apply(params, x).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        k = min(TOP_K, probs.shape[-1])
        return jax.lax.top_k(probs, k)

    def _get_step(self, batch: int, src_hw: Tuple[int, int]):
        key = (batch, *src_hw)
        step = self._steps.get(key)
        if step is None:
            th, tw = self.input_hw
            t_len = self.config.sequence_length

            use_pallas = (
                self.config.pallas_preprocess != "off"
                and self.device.platform == "tpu"
            )

            def run(params, clips_u8):  # [B, T, H, W, 3] uint8 BGR
                b = clips_u8.shape[0]
                flat = clips_u8.reshape(b * t_len, *clips_u8.shape[2:])
                if use_pallas:
                    from ..ops.pallas_preprocess import pallas_stretch_resize

                    # note: `flat` is [B*T, H, W, 3] — the leading dim is
                    # batch*time, sharded over dp by GSPMD propagation from
                    # the [B, T, ...] input (T divides evenly per shard)
                    x = pallas_stretch_resize(
                        flat, (th, tw), out_dtype=jnp.float32, mesh=self.mesh
                    )
                else:
                    x = jax.image.resize(
                        flat.astype(jnp.float32), (b * t_len, th, tw, 3),
                        "linear", antialias=False,
                    )
                    x = x[..., ::-1] * (1.0 / 255.0)  # BGR -> RGB
                return self._clip_head(params, x, b)

            step = (
                jax.jit(run) if self.mesh is not None  # sharded in/out
                else jax.jit(run, device=self.device)
            )
            self._steps[key] = step
        return step

    def _get_step_resized(self, batch: int):
        """Clip step over HOST-resized input [B, T, th, tw, 3] uint8 BGR
        (see _host_resize_clips): cast + flip + /255 + normalize + forward."""
        key = (batch, "rsz")
        step = self._steps.get(key)
        if step is None:
            th, tw = self.input_hw
            t_len = self.config.sequence_length

            def run(params, clips_u8):  # [B, T, th, tw, 3] uint8 BGR
                b = clips_u8.shape[0]
                flat = clips_u8.reshape(b * t_len, th, tw, 3)
                x = flat.astype(jnp.float32)
                x = x[..., ::-1] * (1.0 / 255.0)  # BGR -> RGB
                return self._clip_head(params, x, b)

            step = (
                jax.jit(run) if self.mesh is not None  # sharded in/out
                else jax.jit(run, device=self.device)
            )
            self._steps[key] = step
        return step

    # -- sliding-window predict ----------------------------------------------

    def buffer_packet(
        self, packet: FramePacket
    ) -> Optional[List[FramePacket]]:
        """Append to the stream's ring buffer; return a clip when one is due
        (reference buffering contract, temporal_detector.py:78-120).

        Public so the batcher can split buffering (cheap, host, per frame)
        from clip inference (expensive, device) and coalesce ready clips
        across streams — see ``InferenceBatcher`` temporal clip batching."""
        cfg = self.config
        name = packet.stream.name
        required = cfg.sequence_length * cfg.sequence_stride
        buf = self._buffers.get(name)
        if buf is None:
            buf = deque(maxlen=required)
            self._buffers[name] = buf
        if buf and buf[-1].frame.shape != packet.frame.shape:
            # source resolution changed without a detected reconnect (RTSP
            # renegotiation): a mixed-shape clip cannot stack — restart the
            # window, like reset_stream does on the reconnect path
            logger.info(
                "Stream '%s': frame shape changed %s -> %s; clip buffer "
                "reset", name, buf[-1].frame.shape, packet.frame.shape,
            )
            buf.clear()
        buf.append(packet)
        if len(buf) < required:
            return None
        sequence = [buf[i * cfg.sequence_stride] for i in range(cfg.sequence_length)]
        frames_to_keep = max(0, required - self.sequence_step)
        if frames_to_keep > 0:
            self._buffers[name] = deque(list(buf)[-frames_to_keep:], maxlen=required)
        else:
            buf.clear()
        return sequence

    # backward-compatible private aliases
    _buffer_and_extract = buffer_packet

    def predict(self, packet: FramePacket) -> List[Detection]:
        sequence = self.buffer_packet(packet)
        if sequence is None:
            return []
        return self.predict_clips([sequence])[0]

    def predict_packets(self, packets: Sequence[FramePacket]) -> List[List[Detection]]:
        """Cross-stream batched clip inference: clips that become ready in the
        same device batch run as ONE clip batch (the reference runs clips
        strictly one at a time)."""
        results: List[List[Detection]] = [[] for _ in packets]
        ready: List[Tuple[int, List[FramePacket]]] = []
        for i, p in enumerate(packets):
            seq = self.buffer_packet(p)
            if seq is not None:
                ready.append((i, seq))
        if ready:
            dets = self.predict_clips([s for _, s in ready])
            for (i, _), d in zip(ready, dets):
                results[i] = d
        return results

    def reset_stream(self, stream_name: str) -> None:
        """Clear the clip buffer (e.g. after reconnect — recurrent state must
        not straddle a stream gap)."""
        self._buffers.pop(stream_name, None)

    def predict_clips(
        self, sequences: Sequence[List[FramePacket]]
    ) -> List[List[Detection]]:
        """Batched device inference over ready clips (public: the batcher's
        clip-coalescing path calls this directly)."""
        by_shape: Dict[Tuple[int, int], List[int]] = {}
        for i, seq in enumerate(sequences):
            by_shape.setdefault(tuple(seq[0].frame.shape[:2]), []).append(i)
        results: List[List[Detection]] = [[] for _ in sequences]
        buckets = self.config.resolved_buckets
        for shape, idxs in by_shape.items():
            clips = self._host_resize_clips(sequences, idxs, shape)
            resized = clips is not None
            if not resized:
                clips = np.stack(
                    [np.stack([p.frame for p in sequences[i]]) for i in idxs]
                )  # [B, T, H, W, 3]
            n = clips.shape[0]
            from .detector import _cheapest_bucket

            bucket = self._round_mesh(_cheapest_bucket(
                buckets, n, self._bucket_cost_ms.get(shape, {})
            ))
            if n < bucket:  # pad to a compile bucket, slice results below
                pad = np.repeat(clips[-1:], bucket - n, axis=0)
                clips = np.concatenate([clips, pad], axis=0)
            step = (
                self._get_step_resized(bucket) if resized
                else self._get_step(bucket, shape)
            )
            t0 = time.perf_counter()
            scores, classes = jax.device_get(self._mesh_call(step, clips))
            self.last_infer_ms = (time.perf_counter() - t0) * 1e3
            for j, i in enumerate(idxs):
                results[i] = self._to_detections(sequences[i], scores[j], classes[j])
        return results

    def _to_detections(
        self, sequence: List[FramePacket], scores: np.ndarray, classes: np.ndarray
    ) -> List[Detection]:
        cfg = self.config
        last = sequence[-1]
        h, w = last.frame.shape[:2]
        names = cfg.action_classes or []
        dets: List[Detection] = []
        for r in range(len(scores)):
            conf = float(scores[r])
            if conf < cfg.confidence_threshold:
                continue
            cid = int(classes[r])
            label = names[cid] if cid < len(names) else f"action_{cid}"
            dets.append(
                TemporalDetection(
                    stream_name=last.stream.name,
                    frame_id=last.frame_id,
                    class_id=cid,
                    confidence=conf,
                    bbox_xyxy=(0.0, 0.0, float(w), float(h)),
                    action_label=label,
                    temporal_score=conf,
                    sequence_start_frame=sequence[0].frame_id,
                    sequence_end_frame=last.frame_id,
                )
            )
        return dets


def create_temporal_detector(config: DetectorConfig) -> JaxTemporalEngine:
    return JaxTemporalEngine(config)

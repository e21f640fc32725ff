"""Detection / classification engines: one fused jit graph per shape bucket.

TPU-first redesign of the reference's detector stack (detector.py:106-1134):
instead of per-frame host NumPy pre/post around a native runtime call, the
entire chain

    uint8 NHWC batch -> letterbox resize/pad -> BGR->RGB -> normalize
        -> model forward (bf16 MXU) -> confidence/class masking
        -> batched NMS -> un-letterbox to original pixels

is ONE ``jax.jit`` graph with static shapes, compiled once per
(batch bucket x source resolution) and reused forever. The host only moves
raw uint8 frames in and small padded result arrays out.

Shape policy: batch sizes are bucketed to ``config.resolved_buckets`` (pad up,
slice down), detections are padded to ``max_detections`` with validity counts
— no data-dependent shapes anywhere, so no recompiles in steady state.
"""

from __future__ import annotations

import abc
import logging
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import DetectorConfig
from ..models.resnet import build_resnet, normalize_imagenet
from ..models.weights import load_resnet_checkpoint, load_yolo_checkpoint
from ..models.yolo import build_yolo, size_from_model_path
from ..ops.boxes import unletterbox_boxes
from ..ops.nms import batched_nms
from ..ops.preprocess import letterbox_spec, preprocess_batch
from ..types import BatchResult, Detection, FramePacket

logger = logging.getLogger(__name__)


class BaseDetector(abc.ABC):
    """Single-packet predict interface (reference detector.py:43-51)."""

    config: DetectorConfig
    mesh = None  # set by _init_mesh when detector.mesh_shape is configured

    @abc.abstractmethod
    def predict(self, packet: FramePacket) -> List[Detection]:
        raise NotImplementedError

    def close(self) -> None:  # pragma: no cover - optional override
        pass

    # -- multi-chip helpers (every engine family shares these) --------------

    def _init_mesh(self, params):
        """``detector.mesh_shape = [dp, tp]`` -> build the mesh, shard the
        params over channels (tp) and place them; else single-device
        placement. Graph-backed models (foreign ONNX graphs) allow dp-only
        meshes (tp == 1): batch shards over dp with replicated weights —
        channel-sharding a foreign graph's weights would hand GSPMD layout
        decisions the graph's author never validated."""
        cfg = self.config
        self.mesh = None
        if cfg.mesh_shape:
            from ..parallel.mesh import make_mesh, shard_params

            shape = tuple(int(v) for v in cfg.mesh_shape)
            if getattr(self.model, "graph_backed", False) and (
                len(shape) > 1 and shape[1] != 1
            ):
                from ..config import ConfigError

                raise ConfigError(
                    "generic ONNX graph models support dp-only meshes — "
                    f"use mesh_shape: [{int(np.prod(shape))}, 1] (batch "
                    "sharding), or shard streams across chips with "
                    "`--shards`"
                )
            self.mesh = make_mesh(int(np.prod(shape)), shape=shape)
            self.params = shard_params(params, self.mesh)
        else:
            self.params = jax.device_put(params, self.device)

    def _round_mesh(self, bucket: int) -> int:
        """In mesh mode the batch dim shards over dp, so buckets round up
        to a dp multiple (device_put requires divisibility)."""
        if self.mesh is not None:
            dp = self.mesh.shape.get("dp", 1)
            bucket = ((bucket + dp - 1) // dp) * dp
        return bucket

    def _mesh_call(self, step, arr):
        """Run a jitted step on batch-leading input ``arr`` — batch-sharded
        over dp under the mesh when one is configured, plain device call
        otherwise."""
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding

            a = np.asarray(arr)
            arr_dev = jax.device_put(a, batch_sharding(self.mesh, a.ndim))
            with self.mesh:
                return step(self.params, arr_dev)
        return step(self.params, jnp.asarray(arr))


def _maybe_enable_compile_cache(config: DetectorConfig) -> None:
    """Persistent jit cache — the analog of the reference's TensorRT
    ``.engine`` files (compile once, reuse across restarts; the reference
    warms before serving, detector.py:588-593 — here a warm restart skips
    the compile entirely). Default ON at ``auto`` so deploy restarts never
    pay first-compile inside the serving window; ``off``/"" disables."""
    cache = config.compile_cache_dir
    if cache == "auto":
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "realtime-analytics-tpu", "xla"
        )
    if cache and cache.lower() not in ("off", "none"):
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # noqa: BLE001 — older jax flags / unwritable dir
            logger.warning("could not enable the persistent compile cache")


def _pick_device(config: DetectorConfig):
    if config.device.lower() == "cpu":
        try:
            return jax.devices("cpu")[0]
        except RuntimeError:  # no cpu backend registered (unusual)
            logger.warning("device: cpu requested but unavailable; using default")
    return jax.local_devices()[0]


def _calibration_frames(input_hw: Tuple[int, int], n: int = 4) -> List[np.ndarray]:
    """Model-ready calibration inputs: letterboxed frames from the synthetic
    video source (moving boxes over a structured background) at two
    resolutions, normalized exactly like serving preprocess."""
    from ..ingest.synthetic import SyntheticSource
    from ..ops.preprocess import letterbox_numpy

    out: List[np.ndarray] = []
    for seed, (h, w) in enumerate(((1080, 1920), (480, 854))):
        src = SyntheticSource(width=w, height=h, boxes=5, seed=seed)
        for _ in range(max(1, n // 2)):
            ok, frame = src.read()
            if not ok:
                break
            tensor, _meta = letterbox_numpy(frame, input_hw)  # [1,3,H,W] RGB
            out.append(tensor.transpose(0, 2, 3, 1).astype(np.float32))
    return out


def _bucket_for(buckets: Sequence[int], n: int) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _cheapest_bucket(buckets: Sequence[int], n: int, costs: Dict[int, float]) -> int:
    """The cheapest bucket >= n by measured step cost, else the smallest.
    Bucket cost is non-monotonic on TPU (batch rides the lane dim), so
    padding further can be strictly faster — see ``_effective_bucket``."""
    bucket = _bucket_for(buckets, n)
    if costs:
        cands = [b for b in buckets if b >= n and b in costs]
        if cands:
            bucket = min(cands, key=lambda b: (costs[b], b))
    return bucket


class JaxYoloEngine(BaseDetector):
    """YOLOv5/v8 engine with batched fused inference."""

    def __init__(self, config: DetectorConfig, params: Optional[Dict] = None):
        config.validate()
        self.config = config
        _maybe_enable_compile_cache(config)
        self.device = _pick_device(config)
        size = size_from_model_path(config.model_path)
        nc = config.num_classes
        model_type = config.model_type if config.model_type in ("yolov5", "yolov8") \
            else "yolov8"
        self.model = build_yolo(model_type, size, nc)
        self.input_hw: Tuple[int, int] = config.resolved_input_size
        # reference `half: true` means fp16 on GPU; on TPU the half
        # precision is bf16 — so half overrides an fp32 precision setting
        self.compute_dtype = (
            jnp.float32
            if config.precision == "fp32" and not config.half
            else jnp.bfloat16
        )
        if params is None:
            params = load_yolo_checkpoint(self.model, config.model_path)
        if params is None:
            # generic-graph fallback: the reference's ONNX backend serves
            # ARBITRARY user graphs (reference detector.py:484-609); when
            # the file matches no known checkpoint layout but carries a
            # full graph, compile the graph itself (models/onnx_jax.py)
            from ..models.onnx_graph_model import (
                graph_dtype,
                load_graph_fallback,
            )

            loaded = load_graph_fallback(
                config.model_path, "yolo",
                model_type=model_type, input_hw=tuple(self.input_hw),
                compute_dtype=graph_dtype(config.graph_precision),
            )
            if loaded is not None:
                self.model, params = loaded
        if params is None:
            logger.warning(
                "No loadable weights at '%s' — using random init. Detections "
                "will be meaningless until a checkpoint is provided.",
                config.model_path,
            )
            params = self.model.init_params(jax.random.PRNGKey(0))
        graph_backed = getattr(self.model, "graph_backed", False)
        # consulted by host_prepare and the exported-artifact meta (the
        # stem-folding host paths need the native YOLO param tree)
        self._graph_backed = graph_backed
        if graph_backed:
            # fp32 end to end by default — params AND the device preprocess
            # feeding the graph: a foreign graph's numerics are the user's
            # contract (bf16 pixel rounding would diverge from their ORT
            # baseline). `graph_precision: bf16` opts into the mixed policy
            # (onnx_jax.graph_compute_dtype), ~2x MXU rate.
            self.compute_dtype = self.model.compute_dtype
        if graph_backed and config.precision == "int8":
            logger.warning(
                "precision: int8 is not supported for generic ONNX graph "
                "models — serving the graph at graph_precision (%s)",
                config.graph_precision,
            )
        if config.precision == "int8" and not graph_backed:
            from ..models.weights import (
                calibrate_int8_activations,
                quantize_params_int8,
            )

            params = quantize_params_int8(params)
            # full int8: int8 weights AND int8 activations (RKNN-path analog).
            # Static activation scales are calibrated eagerly on CPU so the
            # compiled graph quantizes with constants (no per-conv dynamic
            # max pass). Calibration inputs are letterboxed video-like
            # frames (moving objects over a structured background), not
            # uniform noise — activation ranges track natural-image
            # statistics much more closely.
            self.model.act_int8 = True
            try:
                samples = [
                    jnp.asarray(s) for s in _calibration_frames(self.input_hw)
                ]
                with jax.default_device(jax.devices("cpu")[0]):
                    calibrate_int8_activations(self.model, params, samples)
                logger.info("int8 mode: static calibrated activation scales")
            except Exception:  # noqa: BLE001 — fall back to dynamic scales
                logger.exception(
                    "int8 calibration failed; using dynamic activation scales"
                )
        elif self.compute_dtype != jnp.float32:
            # (graph-backed reaches here only under graph_precision: bf16 —
            # params then ride HBM at half width like native engines';
            # quantization scales are exempt: they are the model's
            # numerics, and a bf16-truncated scale shifts the grid)
            from ..models.onnx_graph_model import cast_params_for_compute

            params = cast_params_for_compute(
                params, self.compute_dtype,
                getattr(self.model, "fp32_param_names", frozenset()),
            )
        # multi-chip: detector.mesh_shape = [dp, tp] shards the params over
        # channels (tp) and every batch over dp; XLA inserts the collectives
        # (graph-backed models: dp-only — see BaseDetector._init_mesh)
        self._init_mesh(params)
        # s2d early backbone (models/s2d.py): batch-dependent win, so
        # "auto" decides PER COMPILE BUCKET in _s2d_for_bucket (config.py
        # knob comment). model.s2d_backbone stays False — every step
        # closure passes its own decision explicitly (trace-safe).
        self.model.s2d_backbone = False
        # fused v8 head decode kernel (ops/pallas_decode.py): off by
        # default — its operand layout constraint breaks the head region's
        # batch-minor layout domain on v5e (config.py knob comment)
        if config.pallas_decode == "on":
            self.model.pallas_decode = (
                "on" if self.device.platform == "tpu" else "interpret"
            )
        self._class_mask = None
        if config.classes:
            mask = np.zeros((nc,), dtype=bool)
            mask[np.asarray(config.classes, dtype=np.int64)] = True
            self._class_mask = jnp.asarray(mask)
        self._steps: Dict[Tuple[int, int, int], object] = {}  # (B, H, W) -> jitted
        # warmup-measured step ms, keyed src_hw -> {bucket: ms} (cost is
        # resolution-dependent; selection must not mix resolutions)
        self._bucket_cost_ms: Dict[Tuple[int, int], Dict[int, float]] = {}
        self.class_agnostic_nms = True  # reference NMS is class-agnostic
        self.last_infer_ms: float = 0.0

    # -- compiled step ------------------------------------------------------

    @staticmethod
    def _select_geometry(spec) -> Optional[Tuple[int, int, int, int]]:
        """(hr, hoff, wr, woff) when both axis ratios are odd integers —
        the resize is then an exact pixel pick (1080p->640 letterbox is
        exactly 3x on both axes; geometry rule:
        ``ops.preprocess.integer_axis_reduction``). Ratio 1 is the
        degenerate pick (identity): input-sized sources — and every TILE
        crop of the tiled path — then ride the same lean stem-folded
        selected step instead of paying a separate device normalize pass
        (measured b=128: 21.2 -> 15.7 ms). None otherwise."""
        from ..ops.preprocess import integer_axis_reduction

        def axis(src: int, new: int):
            if src == new:
                return ("select", 1, 0)
            return integer_axis_reduction(src, new)

        h = axis(spec.src_h, spec.new_h)
        w = axis(spec.src_w, spec.new_w)
        if h is not None and w is not None and h[0] == w[0] == "select":
            return (h[1], h[2], w[1], w[2])
        return None

    def host_prepare(self, frames: np.ndarray, src_hw: Tuple[int, int]):
        """The production host->device contract for ``src_hw`` frames:
        returns (prepared uint8 array to upload, selected: bool). When the
        letterbox geometry is an exact pixel pick and ``host_select`` is on,
        the pick happens here — the full frame never crosses the PCIe link
        (6 MB -> 0.7 MB per 1080p frame). For FRACTIONAL ratios,
        ``host_resize`` does the cv2 bilinear letterbox resize on the host
        (exactly the reference's preprocess, detector.py:198-264) so the
        device runs the same lean pad+cast selected step — measured 19.2 ->
        ~15.8 ms/step at b=128 for 854x480 sources vs the device-resize
        (Pallas bilinear) path, with a smaller upload too."""
        spec = letterbox_spec(src_hw, self.input_hw)
        if getattr(self, "_graph_backed", False):
            # the selected step folds BGR/255 into the YOLO stem conv —
            # a foreign graph has no known stem; the device letterbox
            # path serves it generically (exported artifacts carry the
            # flag in meta so serve-time agrees with export-time)
            return frames, False
        if self.config.host_select != "off":
            geom = self._select_geometry(spec)
            if geom is not None:
                from ..native import pick_u8

                hr, hoff, wr, woff = geom
                return pick_u8(frames, hr, hoff, wr, woff), True
        if self._host_resize_active():
            resized = self._host_resize_packets(frames, spec)
            if resized is not None:
                return resized, True
        return frames, False

    def _host_resize_active(self) -> bool:
        return self.config.host_resize == "on" or (
            self.config.host_resize == "auto"
            and self.device.platform == "tpu"
        )

    @staticmethod
    def _host_resize_packets(frames, spec) -> Optional[np.ndarray]:
        """cv2 INTER_LINEAR resize of each frame to the letterbox content
        size (the reference contract), straight into one batch buffer.
        ``frames``: a [N, H, W, 3] array or a sequence of [H, W, 3] frames.
        None when cv2 is unavailable or it's a no-op geometry (the device
        path handles those)."""
        if (spec.new_h, spec.new_w) == (spec.src_h, spec.src_w):
            return None
        try:
            import cv2
        except ImportError:
            return None
        out = np.empty(
            (len(frames), spec.new_h, spec.new_w, 3), dtype=np.uint8
        )
        for i, frame in enumerate(frames):
            cv2.resize(
                frame, (spec.new_w, spec.new_h),
                dst=out[i], interpolation=cv2.INTER_LINEAR,
            )
        return out

    def _build_step_selected(self, src_hw: Tuple[int, int], batch: int = 0):
        """Fused step over host-picked input [N, new_h, new_w, 3] uint8 BGR
        (see host_prepare): pad + forward + NMS + un-letterbox. Geometry
        (unletterbox scale/pad) is that of the ORIGINAL src_hw.

        BGR->RGB and the /255 normalization are LINEAR in the input, so they
        fold into the stem conv's weights (input-channel flip + scale):
        the device-side preprocess is just a pad + dtype cast that XLA fuses
        into the stem — no shuffles, no f32 intermediate."""
        spec = letterbox_spec(src_hw, self.input_hw)
        cfg = self.config

        def fold_stem(params):
            layers = dict(params["layers"])
            stem = dict(layers["0"])
            if "w" in stem:
                stem["w"] = stem["w"][:, :, ::-1, :] * jnp.asarray(
                    1.0 / 255.0, stem["w"].dtype
                )
            else:  # int8 weight-quantized stem: flip channels, scale dequant
                stem["w_q"] = stem["w_q"][:, :, ::-1, :]
                stem["w_scale"] = stem["w_scale"] * (1.0 / 255.0)
                if "a_scale" in stem:
                    # activation scales were calibrated on [0, 1] inputs;
                    # this step feeds raw 0-255 pixels, so the quantization
                    # scale must grow by the same 255 the weights absorbed —
                    # otherwise every pixel saturates the int8 range
                    stem["a_scale"] = stem["a_scale"] * 255.0
            layers["0"] = stem
            return {**params, "layers": layers}

        nms_gather = self._nms_gather_impl()
        use_s2d = self._s2d_for_bucket(batch)
        use_pstem = self._pstem_for_bucket(batch)

        def step(params, sel_u8):
            pad_bottom = spec.dst_h - spec.new_h - spec.pad_top
            pad_right = spec.dst_w - spec.new_w - spec.pad_left
            x = jnp.pad(
                sel_u8,
                ((0, 0), (spec.pad_top, pad_bottom),
                 (spec.pad_left, pad_right), (0, 0)),
                constant_values=114,
            ).astype(self.compute_dtype)
            out = self.model.apply(
                fold_stem(params), x, reduce_scores=True, s2d=use_s2d,
                pallas_stem=use_pstem,
            )
            b, s, c, n = self._final_select(out, cfg, nms_gather)
            b = unletterbox_boxes(
                b, spec.scale, spec.pad_left, spec.pad_top, spec.src_h,
                spec.src_w,
            )
            return b, s, c, n

        if self.mesh is not None:
            return jax.jit(step)  # sharded in/out: no single-device pin
        return jax.jit(step, device=self.device)

    def _s2d_for_bucket(self, batch: int) -> bool:
        """Space-to-depth early backbone per compile bucket — measured on
        v5e per batch size, and NON-MONOTONE: b=16 10.5 -> 6.1 ms (-42%),
        b=32 15.9 -> 10.6 (-33%), b=64 21.0 -> 27.3 (WORSE), b=128
        15.75 -> 17.8 (worse: batch-minor layouts already fill lanes and
        the tap-scatter FLOP dilution dominates). auto therefore enables
        s2d only for buckets <= 32 — see config.py `s2d_backbone` and
        docs/performance.md."""
        mode = self.config.s2d_backbone
        if mode == "on":
            return True
        return (
            mode == "auto"
            and self.device.platform == "tpu"
            and self.mesh is None
            and self.config.precision != "int8"
            and batch <= 32
        )

    def _pstem_for_bucket(self, batch: int) -> str:
        """Fused P1/P2 stem Pallas kernel per compile bucket
        (ops/pallas_stem.py). MEASURED at b=128/640 on v5e: the kernel
        loses to XLA's own stem fusion (docs/performance.md "fused-stem
        kernel" table), so "auto" resolves to off everywhere — the knob
        stays for "on" (pod-hardware re-evaluation) and "interpret"
        (tests), same pattern as pallas_decode."""
        mode = self.config.pallas_stem
        if mode in ("on", "interpret"):
            if self.mesh is not None:
                logger.warning(
                    "pallas_stem: %s ignored under mesh serving — the "
                    "kernel has no shard_map path (unlike "
                    "pallas_letterbox); serving stays on the XLA stem",
                    mode,
                )
                return "off"
            return mode
        return "off"

    def _final_select(self, out, cfg, nms_gather):
        """Model output -> padded per-image (boxes, scores, classes,
        num_valid). Native models and raw-matrix graph exports go through
        the engine's batched NMS; end-to-end graph exports (graph-embedded
        NonMaxSuppression) are NEW capability beyond the reference's ORT
        backend (detector.py:484-609), which reads only outputs[0] as a
        raw YOLO matrix and reruns its own NMS — it would mis-serve an
        embedded-NMS export. Such exports here
        already selected their boxes with the export's own per-class NMS —
        re-running the engine's class-agnostic NMS would cross-suppress
        boxes the export keeps, so those take a pure confidence top-k."""
        boxes = out["boxes_xyxy"].astype(jnp.float32)
        conf = out["conf"]
        cls = out["cls"]
        if self._class_mask is not None:
            conf = jnp.where(self._class_mask[cls], conf, 0.0)
        conf = jnp.where(conf >= cfg.confidence_threshold, conf, 0.0)
        if getattr(self.model, "end2end", False):
            k = min(cfg.max_detections, conf.shape[1])
            s, idx = jax.lax.top_k(conf, k)
            b = jnp.take_along_axis(boxes, idx[..., None], axis=1)
            c = jnp.take_along_axis(cls, idx, axis=1)
            n = jnp.sum(s > 0, axis=1).astype(jnp.int32)
            if k < cfg.max_detections:  # keep the engine's fixed width
                pad = cfg.max_detections - k
                b = jnp.pad(b, ((0, 0), (0, pad), (0, 0)))
                s = jnp.pad(s, ((0, 0), (0, pad)))
                c = jnp.pad(c, ((0, 0), (0, pad)))
            return b, s, c, n
        return batched_nms(
            boxes, conf, cls,
            iou_threshold=cfg.iou_threshold,
            max_det=cfg.max_detections,
            pre_topk=min(cfg.pre_nms_topk, boxes.shape[1]),
            class_agnostic=self.class_agnostic_nms,
            gather_impl=nms_gather,
            mesh=self.mesh,
        )

    def _nms_gather_impl(self) -> str:
        """NMS payload gather impl: the bit-exact Pallas MXU one-hot gather
        on TPU (take_along_axis is element-serial there — ~1.9 ms of the
        round-2 step); XLA gathers on CPU. Under a mesh the gather is
        shard_map'd over dp (each chip gathers its local batch shard —
        ops/pallas_gather.py), so mesh serving keeps the MXU gather too."""
        if self.config.pallas_gather == "on":
            # off-TPU, "on" means the interpreter (tests/dev boxes): the
            # Mosaic kernel itself only compiles for TPU
            return "pallas" if self.device.platform == "tpu" else "pallas_interpret"
        if (
            self.config.pallas_gather == "auto"
            and self.device.platform == "tpu"
        ):
            return "pallas"
        return "xla"

    def _get_step_selected(self, batch: int, src_hw: Tuple[int, int]):
        key = (batch, *src_hw, "sel")
        step = self._steps.get(key)
        if step is None:
            logger.info(
                "compiling fused detect step (host-select) for batch=%d "
                "src=%s", batch, src_hw,
            )
            step = self._build_step_selected(src_hw, batch)
            self._steps[key] = step
        return step

    def _get_step(self, batch: int, src_hw: Tuple[int, int]):
        key = (batch, *src_hw)
        step = self._steps.get(key)
        if step is None:
            logger.info(
                "compiling fused detect step for batch=%d src=%s (first batch "
                "stalls until XLA finishes; set detector.compile_cache_dir to "
                "persist compilations across restarts)",
                batch, src_hw,
            )
            step = self._build_step(src_hw, batch)
            self._steps[key] = step
        return step

    def _build_step(self, src_hw: Tuple[int, int], batch: int = 0):
        spec = letterbox_spec(src_hw, self.input_hw)
        cfg = self.config
        # The Pallas MXU kernel beats the XLA paths for every resize on TPU
        # (measured at 32x1080p->640: 3.7 ms vs 10.5 ms even for the
        # integer-ratio strided-slice case); identity resizes skip it.
        needs_resize = (spec.new_h, spec.new_w) != (spec.src_h, spec.src_w)
        use_pallas = cfg.pallas_preprocess == "on" or (
            cfg.pallas_preprocess == "auto"
            and self.device.platform == "tpu"
            and needs_resize
        )
        nms_gather = self._nms_gather_impl()
        use_s2d = self._s2d_for_bucket(batch)
        use_pstem = self._pstem_for_bucket(batch)

        def step(params, frames_u8):
            if use_pallas:
                from ..ops.pallas_preprocess import pallas_letterbox

                x = pallas_letterbox(
                    frames_u8, spec=spec, out_dtype=self.compute_dtype,
                    interpret=self.device.platform != "tpu",
                    mesh=self.mesh,
                )
            else:
                x = preprocess_batch(
                    frames_u8,
                    spec=spec,
                    out_dtype=self.compute_dtype,
                    layout="NHWC",
                )
            out = self.model.apply(params, x, reduce_scores=True, s2d=use_s2d, pallas_stem=use_pstem)
            b, s, c, n = self._final_select(out, cfg, nms_gather)
            b = unletterbox_boxes(
                b, spec.scale, spec.pad_left, spec.pad_top, spec.src_h, spec.src_w
            )
            return b, s, c, n

        # Note: the uint8 input never aliases an output (different shape and
        # dtype), so donation buys nothing here; double-buffering happens at
        # the batcher level instead.
        if self.mesh is not None:
            return jax.jit(step)  # sharded in/out: no single-device pin
        return jax.jit(step, device=self.device)

    def _effective_bucket(self, n: int, src_hw: Tuple[int, int]) -> int:
        """Compile bucket for an n-frame batch: the CHEAPEST bucket that
        fits, by warmup-measured step cost for THIS source resolution when
        available, else the smallest. Bucket cost is non-monotonic on TPU —
        XLA lays the early backbone out batch-minor, so the batch dim rides
        the 128-wide lane dim: b=128 fills lanes exactly while b=64 pads
        half of every tile AND thrashes between batch-minor/channel-minor
        layouts (measured 21.5 ms vs 16.5 ms for the b=128 step on v5e —
        padding 40 frames to 128 beats running them at 64). Costs are
        per-resolution: the selected bucket must have been warmed for this
        src_hw, or selection could route to an uncompiled executable."""
        bucket = _cheapest_bucket(
            self.config.resolved_buckets, n,
            self._bucket_cost_ms.get(tuple(src_hw), {}),
        )
        return self._round_mesh(bucket)

    def warmup(self, src_hw: Tuple[int, int], buckets: Optional[Sequence[int]] = None):
        """Pre-compile buckets (the analog of TensorRT engine build +
        dummy-tensor warmup, reference detector.py:131-140). Warms the exact
        executable predict will use — the host-select variant when the
        geometry allows, and the mesh-sharded input layout when a mesh is
        configured (an unsharded warmup input would compile a different
        cache entry and the first live batch would recompile).

        After compiling, each bucket's step is timed (min of 3 calls,
        direct ``_run_bucket`` calls so cost-aware selection cannot
        redirect mid-warmup) and recorded per source resolution under the
        PRE-mesh-rounding bucket key — the key ``_cheapest_bucket``
        compares against. The constant per-dispatch overhead cancels in
        the cost comparison."""
        buckets = buckets or self.config.resolved_buckets
        probe = np.zeros((1, *src_hw, 3), dtype=np.uint8)
        _, selected = self.host_prepare(probe, src_hw)
        costs = self._bucket_cost_ms.setdefault(tuple(src_hw), {})
        for b in buckets:
            b0 = _bucket_for(self.config.resolved_buckets, b)
            rb = self._round_mesh(b0)
            prepared, _ = self.host_prepare(
                np.zeros((rb, *src_hw, 3), dtype=np.uint8), src_hw
            )
            cost = float("inf")
            for _ in range(3):
                self._run_bucket(rb, prepared, src_hw, selected)
                cost = min(cost, self.last_infer_ms)
            costs[b0] = cost
            logger.info(
                "warmup: compiled bucket B=%d src=%s (host_select=%s) "
                "step=%.1fms", rb, src_hw, selected, cost,
            )
        dominated = [
            b for b in costs
            if any(o > b and costs[o] < costs[b] for o in costs)
        ]
        if dominated:
            logger.info(
                "bucket costs %s (src=%s): bucket(s) %s are dominated by a "
                "larger cheaper bucket and will be skipped by selection",
                {k: round(v, 1) for k, v in sorted(costs.items())},
                src_hw, sorted(dominated),
            )
        if self._tiling_active(src_hw) and tuple(src_hw) != self.input_hw:
            # tiled serving runs the INPUT-sized step on the tile crops —
            # pre-compile it too or the first tiled batch stalls on a jit
            self.warmup(self.input_hw, buckets)

    # -- prediction ---------------------------------------------------------

    def predict_arrays(self, frames: np.ndarray) -> BatchResult:
        """frames: [N, H, W, 3] uint8 BGR (all same resolution)."""
        src_hw = tuple(frames.shape[1:3])
        # host-select BEFORE the bucket padding so padding copies the small
        # tensor, and before upload so the link moves only the kept pixels
        frames, selected = self.host_prepare(frames, src_hw)
        return self._predict_prepared(frames, src_hw, selected)

    def _predict_prepared(
        self, frames: np.ndarray, src_hw: Tuple[int, int], selected: bool
    ) -> BatchResult:
        n = frames.shape[0]
        bucket = self._effective_bucket(n, src_hw)
        if n > bucket:
            raise ValueError(f"batch {n} exceeds max bucket {bucket}")
        return self._run_bucket(bucket, frames, src_hw, selected)

    def _run_bucket(
        self, bucket: int, frames: np.ndarray, src_hw: Tuple[int, int],
        selected: bool,
    ) -> BatchResult:
        """Pad to exactly ``bucket`` and run its step — no bucket
        selection (warmup uses this directly to compile/time a specific
        bucket)."""
        n = frames.shape[0]
        if n < bucket:
            pad = np.zeros((bucket - n, *frames.shape[1:]), dtype=frames.dtype)
            frames = np.concatenate([frames, pad], axis=0)
        step = (
            self._get_step_selected(bucket, src_hw)
            if selected
            else self._get_step(bucket, src_hw)
        )
        t0 = time.perf_counter()
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding

            frames_dev = jax.device_put(frames, batch_sharding(self.mesh, 4))
            with self.mesh:
                b, s, c, nv = step(self.params, frames_dev)
        else:
            b, s, c, nv = step(self.params, jnp.asarray(frames))
        b, s, c, nv = jax.device_get((b, s, c, nv))
        self.last_infer_ms = (time.perf_counter() - t0) * 1e3
        return BatchResult(
            boxes_xyxy=np.asarray(b[:n]),
            scores=np.asarray(s[:n]),
            class_ids=np.asarray(c[:n]),
            num_valid=np.asarray(nv[:n]),
        )

    def _predict_group(
        self, frames_list: Sequence[np.ndarray], shape: Tuple[int, int]
    ) -> BatchResult:
        """Batch-predict same-resolution frames through the cheapest path
        (host pixel-pick > host letterbox resize > device letterbox)."""
        spec = letterbox_spec(shape, self.input_hw)
        if getattr(self, "_graph_backed", False):
            # no stem to fold BGR/255 into (host_prepare rationale)
            return self._predict_prepared(np.stack(frames_list), shape, False)
        geom = None
        if self.config.host_select != "off":
            geom = self._select_geometry(spec)
        if geom is not None:
            from ..native import pick_u8, picked_shape

            hr, hoff, wr, woff = geom
            h, w = shape
            oh, ow = picked_shape(h, w, hr, hoff, wr, woff)
            # pick each frame straight into the batch buffer: one copy
            # total (pick-then-stack would copy the picked data twice)
            frames = np.empty((len(frames_list), oh, ow, 3), np.uint8)
            for j, f in enumerate(frames_list):
                pick_u8(f, hr, hoff, wr, woff, out=frames[j])
            return self._predict_prepared(frames, shape, True)
        if self._host_resize_active():
            # fractional ratio: host cv2 letterbox resize straight into the
            # batch buffer (same lean selected step as the pick path;
            # host_prepare docstring)
            frames = self._host_resize_packets(list(frames_list), spec)
            if frames is not None:
                return self._predict_prepared(frames, shape, True)
        frames = np.stack(frames_list)
        return self._predict_prepared(frames, shape, False)

    def _tiling_active(self, shape: Tuple[int, int]) -> bool:
        return bool(self.config.tiling) and (
            shape[0] > self.input_hw[0] or shape[1] > self.input_hw[1]
        )

    def _predict_tiled_group(
        self, frames_list: Sequence[np.ndarray], shape: Tuple[int, int]
    ) -> BatchResult:
        """SAHI-style sliced inference (ops/tiling.py): input-sized tile
        crops (pure memcpy — detection at NATIVE resolution) ride the same
        compiled 640² step; optional whole-frame pass merges back in so
        objects larger than a tile are still seen whole."""
        from ..ops.tiling import crop_tile, merge_frame, tile_grid

        th, tw = self.input_hw
        grid = tile_grid(shape, self.input_hw, self.config.tiling_overlap)
        T = len(grid)
        nf = len(frames_list)
        # tiles are already model-input-sized: the identity pixel-pick
        # geometry means the lean selected step applies with no host copy
        spec = letterbox_spec((th, tw), self.input_hw)
        geom = (
            self._select_geometry(spec)
            if self.config.host_select != "off"
            and not getattr(self, "_graph_backed", False) else None
        )
        selected = geom == (1, 0, 1, 0)
        # crop + predict in compile-bucket-sized chunks: materializing all
        # nf*T tiles up front would transiently hold ~315 MB for a 32-frame
        # 1080p group (32 x 8 tiles x 1.23 MB) — one cap-sized buffer
        # bounds the host transient to cap tiles per chunk
        cap = max(self.config.resolved_buckets)
        tiles = np.empty((min(cap, nf * T), th, tw, 3), np.uint8)
        parts = []
        filled = 0
        for j, f in enumerate(frames_list):
            for t, (y0, x0) in enumerate(grid):
                crop_tile(f, y0, x0, (th, tw), out=tiles[filled])
                filled += 1
                if filled == tiles.shape[0]:
                    parts.append(
                        self._predict_prepared(
                            tiles[:filled], (th, tw), selected
                        )
                    )
                    filled = 0
        if filled:
            parts.append(
                self._predict_prepared(tiles[:filled], (th, tw), selected)
            )
        tb = np.concatenate([p.boxes_xyxy for p in parts])
        ts = np.concatenate([p.scores for p in parts])
        tc = np.concatenate([p.class_ids for p in parts])
        tn = np.concatenate([p.num_valid for p in parts])
        full = (
            self._predict_group(frames_list, shape)
            if self.config.tiling_full_frame else None
        )
        md = self.config.max_detections
        ob = np.zeros((nf, md, 4), np.float32)
        osc = np.zeros((nf, md), np.float32)
        oc = np.zeros((nf, md), np.int32)
        on = np.zeros((nf,), np.int32)
        for j in range(nf):
            per_tile = [
                (tb[j * T + t], ts[j * T + t], tc[j * T + t],
                 int(tn[j * T + t]))
                for t in range(T)
            ]
            if full is not None:
                # appended past len(grid): already in frame coordinates
                per_tile.append(
                    (full.boxes_xyxy[j], full.scores[j], full.class_ids[j],
                     int(full.num_valid[j]))
                )
            b, s, c, n = merge_frame(
                per_tile, grid, shape, self.config.iou_threshold, md,
                self.class_agnostic_nms,
            )
            ob[j], osc[j], oc[j], on[j] = b, s, c, n
        return BatchResult(
            boxes_xyxy=ob, scores=osc, class_ids=oc, num_valid=on
        )

    def predict_packets(self, packets: Sequence[FramePacket]) -> List[List[Detection]]:
        """Batch-predict frame packets; groups by source resolution. With
        host_select the pixel pick happens per frame BEFORE stacking, so the
        full frames are never copied into a batch buffer."""
        by_shape: Dict[Tuple[int, int], List[int]] = {}
        for i, p in enumerate(packets):
            by_shape.setdefault(tuple(p.frame.shape[:2]), []).append(i)
        results: List[List[Detection]] = [[] for _ in packets]
        for shape, idxs in by_shape.items():
            frames_list = [packets[i].frame for i in idxs]
            if self._tiling_active(shape):
                br = self._predict_tiled_group(frames_list, shape)
            else:
                br = self._predict_group(frames_list, shape)
            dets = br.to_detections(
                [packets[i].stream.name for i in idxs],
                [packets[i].frame_id for i in idxs],
            )
            for j, i in enumerate(idxs):
                results[i] = dets[j]
        return results

    def predict(self, packet: FramePacket) -> List[Detection]:
        return self.predict_packets([packet])[0]


class JaxResNetEngine(BaseDetector):
    """ResNet classification engine (reference detector.py:872-1134).

    Resizes without letterbox, ImageNet-normalizes, and emits the top-K
    classes as full-frame Detections — the reference's contract.

    Host pixel path parity with the YOLO engine: with ``host_resize``
    active (the default on TPU) the stretch resize to ``input_size`` runs
    on the HOST with cv2 INTER_LINEAR — exactly where the reference
    classifier resizes (detector.py:980-1001) — so a 1080p classification
    stream uploads 224*224*3 = 0.15 MB/frame instead of the 6 MB full
    frame (the YOLO pick path uploads 0.69 MB). The device step is then
    just cast + BGR->RGB + normalize + forward.
    """

    def __init__(self, config: DetectorConfig, params: Optional[Dict] = None):
        config.validate()
        self.config = config
        self.device = _pick_device(config)
        variant = "resnet50" if "50" in config.model_path else (
            "resnet34" if "34" in config.model_path else (
                "resnet18" if "18" in config.model_path else "resnet50"))
        self.model = build_resnet(variant, config.resnet_num_classes)
        self.input_hw = config.resolved_input_size
        # reference `half: true` means fp16 on GPU; on TPU the half
        # precision is bf16 — so half overrides an fp32 precision setting
        self.compute_dtype = (
            jnp.float32
            if config.precision == "fp32" and not config.half
            else jnp.bfloat16
        )
        if params is None:
            params = load_resnet_checkpoint(self.model, config.model_path)
        if params is None:
            # generic-graph fallback (reference serves arbitrary classifier
            # graphs through ONNX Runtime, detector.py:1004-1134)
            from ..models.onnx_graph_model import (
                graph_dtype,
                load_graph_fallback,
            )

            loaded = load_graph_fallback(
                config.model_path, "classifier",
                input_hw=tuple(self.input_hw),
                compute_dtype=graph_dtype(config.graph_precision),
            )
            if loaded is not None:
                self.model, params = loaded
        if params is None:
            logger.warning(
                "No loadable ResNet weights at '%s' — using random init.",
                config.model_path,
            )
            params = self.model.init_params(jax.random.PRNGKey(0))
        if getattr(self.model, "graph_backed", False):
            # foreign graph numerics are the user's contract — fp32 end to
            # end by default, including the normalize feeding it;
            # graph_precision: bf16 opts into the mixed policy (detector.py
            # YOLO engine carries the rationale)
            self.compute_dtype = self.model.compute_dtype
        if self.compute_dtype != jnp.float32:
            from ..models.onnx_graph_model import cast_params_for_compute

            params = cast_params_for_compute(
                params, self.compute_dtype,
                getattr(self.model, "fp32_param_names", frozenset()),
            )
        # multi-chip: [dp, tp] shards conv channels over tp, batches over dp
        # (graph-backed classifier graphs: dp-only — BaseDetector._init_mesh)
        self._init_mesh(params)
        self._steps: Dict[Tuple[int, int, int], object] = {}
        # warmup-measured step ms, keyed src_hw -> {bucket: ms}
        self._bucket_cost_ms: Dict[Tuple[int, int], Dict[int, float]] = {}
        self.last_infer_ms = 0.0

    def _host_resize_active(self) -> bool:
        return self.config.host_resize == "on" or (
            self.config.host_resize == "auto"
            and self.device.platform == "tpu"
        )

    def host_prepare(self, frames, src_hw: Tuple[int, int]):
        """(prepared uint8 array to upload, resized: bool). With
        ``host_resize`` active, the stretch resize to ``input_size`` runs
        here on the host (cv2 INTER_LINEAR — the reference classifier's own
        preprocess) so only input-sized pixels cross the PCIe link."""
        th, tw = self.input_hw
        if tuple(src_hw) != (th, tw) and self._host_resize_active():
            try:
                import cv2
            except ImportError:
                return frames, False
            out = np.empty((len(frames), th, tw, 3), dtype=np.uint8)
            for i, frame in enumerate(frames):
                cv2.resize(frame, (tw, th), dst=out[i],
                           interpolation=cv2.INTER_LINEAR)
            return out, True
        return frames, False

    def warmup(self, src_hw: Tuple[int, int], buckets: Optional[Sequence[int]] = None):
        """Pre-compile classification steps (reference warms every backend,
        detector.py:938-943) and time each bucket for cost-aware selection
        (same non-monotonic-cost rationale as the YOLO engine). Warms the
        exact executable predict will use — the host-resized variant when
        active."""
        buckets = buckets or self.config.resolved_buckets
        probe, resized = self.host_prepare(
            np.zeros((1, *src_hw, 3), np.uint8), src_hw
        )
        costs = self._bucket_cost_ms.setdefault(tuple(src_hw), {})
        for b in buckets:
            rb = self._round_mesh(b)
            step = (
                self._get_step_resized(rb) if resized
                else self._get_step(rb, src_hw)
            )
            frames = np.zeros((rb, *probe.shape[1:]), np.uint8)
            jax.block_until_ready(self._mesh_call(step, frames))
            cost = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(self._mesh_call(step, frames))
                cost = min(cost, (time.perf_counter() - t0) * 1e3)
            costs[b] = cost
            logger.info(
                "resnet warmup: compiled bucket B=%d src=%s "
                "(host_resize=%s) step=%.1fms", rb, src_hw, resized, cost,
            )

    def _classify_head(self, params, x):
        """Shared tail: x is [B, th, tw, 3] float32 RGB in [0, 1]."""
        x = normalize_imagenet(x).astype(self.compute_dtype)
        logits = self.model.apply(params, x).astype(jnp.float32)
        k = min(self.config.resnet_top_k, logits.shape[-1])
        # reference parity: threshold/report the raw head output
        # (reference detector.py:954-978); softmax is opt-in via
        # resnet_scores: softmax
        scores = (
            jax.nn.softmax(logits)
            if self.config.resnet_scores == "softmax"
            else logits
        )
        return jax.lax.top_k(scores, k)

    def _get_step(self, batch: int, src_hw: Tuple[int, int]):
        key = (batch, *src_hw)
        step = self._steps.get(key)
        if step is None:
            th, tw = self.input_hw

            use_pallas = (
                self.config.pallas_preprocess != "off"
                and self.device.platform == "tpu"
            )

            def run(params, frames_u8):
                if use_pallas:
                    from ..ops.pallas_preprocess import pallas_stretch_resize

                    x = pallas_stretch_resize(
                        frames_u8, (th, tw), out_dtype=jnp.float32,
                        mesh=self.mesh,
                    )
                else:
                    x = frames_u8.astype(jnp.float32)
                    n = x.shape[0]
                    x = jax.image.resize(
                        x, (n, th, tw, 3), "linear", antialias=False
                    )
                    x = x[..., ::-1] * (1.0 / 255.0)  # BGR -> RGB, [0,1]
                return self._classify_head(params, x)

            step = (
                jax.jit(run) if self.mesh is not None  # sharded in/out
                else jax.jit(run, device=self.device)
            )
            self._steps[key] = step
        return step

    def _get_step_resized(self, batch: int):
        """Step over HOST-resized input [B, th, tw, 3] uint8 BGR (see
        host_prepare): the device does only cast + BGR->RGB + /255 +
        normalize + forward — all of which XLA fuses into the stem."""
        key = (batch, "rsz")
        step = self._steps.get(key)
        if step is None:

            def run(params, frames_u8):
                x = frames_u8.astype(jnp.float32)
                x = x[..., ::-1] * (1.0 / 255.0)  # BGR -> RGB, [0,1]
                return self._classify_head(params, x)

            step = (
                jax.jit(run) if self.mesh is not None  # sharded in/out
                else jax.jit(run, device=self.device)
            )
            self._steps[key] = step
        return step

    def predict_packets(self, packets: Sequence[FramePacket]) -> List[List[Detection]]:
        by_shape: Dict[Tuple[int, int], List[int]] = {}
        for i, p in enumerate(packets):
            by_shape.setdefault(tuple(p.frame.shape[:2]), []).append(i)
        results: List[List[Detection]] = [[] for _ in packets]
        for shape, idxs in by_shape.items():
            frames, resized = self.host_prepare(
                [packets[i].frame for i in idxs], shape
            )
            if not resized:
                frames = np.stack(frames)
            n = frames.shape[0]
            buckets = self.config.resolved_buckets
            bucket = self._round_mesh(_cheapest_bucket(
                buckets, n, self._bucket_cost_ms.get(shape, {})
            ))
            if n < bucket:
                frames = np.concatenate(
                    [frames, np.zeros((bucket - n, *frames.shape[1:]), frames.dtype)]
                )
            step = (
                self._get_step_resized(bucket) if resized
                else self._get_step(bucket, shape)
            )
            t0 = time.perf_counter()
            scores, classes = jax.device_get(self._mesh_call(step, frames))
            self.last_infer_ms = (time.perf_counter() - t0) * 1e3
            for j, i in enumerate(idxs):
                p = packets[i]
                h, w = p.frame.shape[:2]
                dets = [
                    Detection(
                        stream_name=p.stream.name,
                        frame_id=p.frame_id,
                        class_id=int(classes[j, r]),
                        confidence=float(scores[j, r]),
                        bbox_xyxy=(0.0, 0.0, float(w), float(h)),
                    )
                    for r in range(scores.shape[1])
                    if scores[j, r] >= self.config.confidence_threshold
                ]
                results[i] = dets
        return results

    def predict(self, packet: FramePacket) -> List[Detection]:
        return self.predict_packets([packet])[0]


def create_detector(config: DetectorConfig) -> BaseDetector:
    """Factory with the reference's routing semantics (detector.py:54-96):
    temporal model types -> temporal engines, resnet -> classifier, anything
    else -> YOLO detection. All backend labels resolve to the JAX engine."""
    from .temporal import create_temporal_detector  # local: avoid cycle

    if str(config.model_path).endswith(".rvae"):
        # AOT-exported serving artifact (engine/export.py) — the TensorRT
        # .engine analog: programs + weights in one file, no model tracing
        from .export import (  # local: avoid cycle
            ExportedResNetEngine,
            ExportedTemporalEngine,
            ExportedYoloEngine,
        )

        if config.model_type in ("cnn_lstm", "3d_cnn", "conv_gru", "slow_fast"):
            return ExportedTemporalEngine(config)
        if config.model_type == "resnet":
            return ExportedResNetEngine(config)
        return ExportedYoloEngine(config)
    if config.model_type in ("cnn_lstm", "3d_cnn", "conv_gru", "slow_fast"):
        return create_temporal_detector(config)
    if config.model_type == "resnet":
        return JaxResNetEngine(config)
    if config.backend not in ("jax", "tpu"):
        logger.info(
            "backend '%s' requested — serving it with the JAX engine", config.backend
        )
    return JaxYoloEngine(config)

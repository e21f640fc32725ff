"""AOT-exported serving artifacts — the TPU-native analog of TensorRT
``.engine`` files (reference detector.py:382-466 deserializes prebuilt
engines at startup; the same applies to its OpenVINO/RKNN compiled model
files).

``export_serving_artifact`` AOT-lowers an engine's PRODUCTION serving
step for an explicit set of (source resolution x batch bucket) programs
via ``jax.export`` and packs them — together with the weights — into a
single self-contained ``.rvae`` zip. Every engine family exports:

* YOLO (``JaxYoloEngine``): host-prep contract -> pad/letterbox ->
  forward -> NMS -> un-letterbox, per (resolution x bucket), in the
  host-select ("sel") or device-letterbox ("full") variant;
* ResNet classification (``JaxResNetEngine``): host-resized ("rsz") or
  device-resize ("full") classify step -> top-K;
* temporal clip models (``JaxTemporalEngine``): the clip step over
  [B, T, H, W, 3] windows ("rsz"/"full").

The ``Exported*Engine`` classes serve from the artifact alone: no
torch/ONNX checkpoint parsing, no model-graph construction, no Python
model code in the serve path — deserialized StableHLO goes straight to
XLA. Each inherits the corresponding live engine's ENTIRE host path
(pixel pick, host resize, grouping, bucket selection, tiling merge, clip
buffering), overriding only where compiled steps come from.

What this buys over the persistent jit cache (the other TensorRT analog,
``compile_cache_dir``):

* a deployable single-file unit: weights + every serving program, pinned
  to exact shapes — what you ship to the fleet, like an ``.engine`` file;
* startup does zero Python tracing (tracing a 200-layer YOLO graph is
  seconds of host time per bucket; deserialization is milliseconds) —
  XLA compilation still runs per program but hits the persistent cache;
* version safety: jax.export refuses artifacts whose calling convention
  it cannot honor, instead of silently recompiling something different.

Artifact layout (zip):

    meta.json                      format/engine/config echo + program index
    params/<flat-key>.bin          raw little-endian weight bytes
    programs/<H>x<W>_b<B>_<kind>   serialized jax.export.Exported

Wire-in: ``detector.model_path: something.rvae`` routes
``create_detector`` to the Exported engine matching ``model_type``;
export with the ``realtime-analytics-export`` CLI
(scripts/export_engine.py).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import tempfile
import zipfile
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ConfigError, DetectorConfig
from .detector import JaxResNetEngine, JaxYoloEngine, _pick_device
from .temporal import JaxTemporalEngine

logger = logging.getLogger(__name__)

FORMAT_VERSION = 1
ARTIFACT_SUFFIX = ".rvae"


# -- params (de)hydration -----------------------------------------------------


def _esc_key(k: str) -> str:
    """Percent-escape the segment separators in a dict key. Native
    checkpoint trees never need this, but graph-backed engines carry raw
    ONNX initializer names — torch 2.x constant-folded exports produce
    '/'-scoped names like '/model.22/Constant_output_0'."""
    return k.replace("%", "%25").replace("/", "%2F").replace("#", "%23")


def _unesc_key(k: str) -> str:
    return k.replace("%2F", "/").replace("%23", "#").replace("%25", "%")


def _flatten_params(params, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict/list-of-arrays -> {'a/b/#0/c': array}. List nodes use
    '#<i>' segment keys so unflatten can rebuild them as lists (dict keys
    in YOLO param trees are layer-index strings, which would collide with
    bare integer segments). Dict keys containing '/', '#', or '%' are
    percent-escaped (ONNX initializer names in graph-backed engines)."""
    flat: Dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten_params(v, f"{prefix}{_esc_key(str(k))}/"))
        return flat
    if isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten_params(v, f"{prefix}#{i}/"))
        return flat
    arr = np.asarray(params)
    if arr.dtype == object:
        raise ValueError(f"param leaf {prefix[:-1]!r} is not an array")
    flat[prefix[:-1]] = arr
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for key, arr in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        # raw '#<i>' segments only come from the list encoding: escaped
        # dict keys never start with '#' ('#' -> '%23'); unescape AFTER
        # the list test so a literal '#foo' dict key cannot masquerade
        if node and all(k.startswith("#") for k in node):
            return [
                rebuild(node[k])
                for k in sorted(node, key=lambda s: int(s[1:]))
            ]
        return {_unesc_key(k): rebuild(v) for k, v in node.items()}

    return rebuild(out)


# -- export -------------------------------------------------------------------


def _program_name(src_hw: Tuple[int, int], batch: int, kind: str) -> str:
    return f"{src_hw[0]}x{src_hw[1]}_b{batch}_{kind}"


def _engine_kind(engine) -> str:
    # isinstance order matters: Exported engines subclass the live ones
    # (re-export of an exported engine is blocked — it has no model code)
    if isinstance(engine, _ArtifactMixin):
        raise ValueError("cannot re-export an artifact-served engine")
    if isinstance(engine, JaxYoloEngine):
        return "yolo"
    if isinstance(engine, JaxResNetEngine):
        return "resnet"
    if isinstance(engine, JaxTemporalEngine):
        return "temporal"
    raise ValueError(f"unsupported engine type {type(engine).__name__}")


def _programs_for(engine, kind: str, src_hw: Tuple[int, int], batch: int):
    """(step fn, input ShapeDtypeStruct, kind tag) for one program."""
    if kind == "yolo":
        probe, selected = engine.host_prepare(
            np.zeros((1, *src_hw, 3), np.uint8), src_hw
        )
        in_hw = tuple(int(d) for d in probe.shape[1:3])
        step = (
            engine._build_step_selected(src_hw, batch)
            if selected
            else engine._build_step(src_hw, batch)
        )
        shape = (batch, *in_hw, 3)
        return step, jax.ShapeDtypeStruct(shape, jnp.uint8), (
            "sel" if selected else "full"
        )
    if kind == "resnet":
        probe, resized = engine.host_prepare(
            np.zeros((1, *src_hw, 3), np.uint8), src_hw
        )
        in_hw = tuple(int(d) for d in probe.shape[1:3])
        step = (
            engine._get_step_resized(batch)
            if resized
            else engine._get_step(batch, src_hw)
        )
        shape = (batch, *in_hw, 3)
        return step, jax.ShapeDtypeStruct(shape, jnp.uint8), (
            "rsz" if resized else "full"
        )
    # temporal: clip step over [B, T, H, W, 3]. _host_resize_active
    # includes the cv2 probe, so this is exactly the serve-time decision
    # (a cv2-less host must not export 'rsz' programs it can never run)
    th, tw = engine.input_hw
    t_len = engine.config.sequence_length
    resized = engine._host_resize_active() and tuple(src_hw) != (th, tw)
    step = (
        engine._get_step_resized(batch)
        if resized
        else engine._get_step(batch, src_hw)
    )
    hw = (th, tw) if resized else tuple(src_hw)
    shape = (batch, t_len, *hw, 3)
    return step, jax.ShapeDtypeStruct(shape, jnp.uint8), (
        "rsz" if resized else "full"
    )


def export_serving_artifact(
    engine,
    path: str,
    src_hws: Sequence[Tuple[int, int]],
    buckets: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> Dict:
    """AOT-export ``engine``'s serving step for every (src_hw x bucket)
    and write the self-contained artifact to ``path``. Returns the meta
    dict (also embedded in the artifact). Works for all three engine
    families (module docstring).

    ``platforms`` defaults to the engine's current device platform — the
    artifact then serves only on that platform family (exactly like a
    TensorRT engine is bound to its GPU architecture). Multi-platform
    export works only for programs without TPU-only Pallas kernels.
    """
    kind = _engine_kind(engine)
    if getattr(engine, "mesh", None) is not None:
        raise ValueError(
            "export_serving_artifact supports single-device engines; "
            "mesh serving compiles per-topology and should keep using the "
            "persistent compile cache"
        )
    if not str(path).endswith(ARTIFACT_SUFFIX):
        raise ValueError(f"artifact path must end with {ARTIFACT_SUFFIX}")
    # dedupe after normalization (order-preserving): repeated --src values
    # must not produce duplicate zip entries / duplicate index rows
    src_hws = list(dict.fromkeys((int(h), int(w)) for h, w in src_hws))
    if not src_hws:
        raise ValueError("src_hws must name at least one source resolution")
    # tiled YOLO serving runs the INPUT-sized step on the tile crops (the
    # live warmup recurses into input_hw for the same reason,
    # detector.py warmup) — the artifact must carry those programs too
    if kind == "yolo" and engine.config.tiling:
        if tuple(engine.input_hw) not in src_hws:
            src_hws.append(tuple(engine.input_hw))
    buckets = sorted(set(buckets or engine.config.resolved_buckets))
    platforms = list(platforms or [engine.device.platform])

    params = jax.device_get(engine.params)
    flat = _flatten_params(params)
    cfg = engine.config
    programs: List[Dict] = []

    # write to a temp file and rename on success: a failed export must
    # not leave a structurally-valid-looking partial zip at the target
    fd, tmp_path = tempfile.mkstemp(
        dir=os.path.dirname(os.path.abspath(path)) or ".",
        suffix=ARTIFACT_SUFFIX + ".tmp",
    )
    os.close(fd)
    try:
        _write_artifact_zip(
            tmp_path, engine, kind, src_hws, buckets, platforms, params,
            flat, cfg, programs,
        )
        os.replace(tmp_path, path)
    except BaseException:
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        raise
    meta = json.loads(zipfile.ZipFile(path).read("meta.json"))
    logger.info(
        "wrote %s: %d program(s), %d weight tensors", path, len(programs),
        len(flat),
    )
    return meta


def _write_artifact_zip(
    path, engine, kind, src_hws, buckets, platforms, params, flat, cfg,
    programs,
) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for key, arr in flat.items():
            zf.writestr(f"params/{key}.bin", np.ascontiguousarray(arr).tobytes())
        # 'rsz' steps take input_hw-shaped batches regardless of the source
        # resolution, so one serialized program per bucket serves every
        # source: serialize it once and alias later index rows to it
        # (StableHLO programs are MBs; N sources would multiply that)
        shared_rsz: Dict[int, Tuple[str, List[int]]] = {}
        for src_hw in src_hws:
            for b in buckets:
                step, in_spec, tag = _programs_for(engine, kind, src_hw, b)
                if tag == "rsz" and b in shared_rsz:
                    name, in_shape = shared_rsz[b]
                else:
                    args = (
                        jax.tree_util.tree_map(
                            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                            params,
                        ),
                        in_spec,
                    )
                    exported = jax.export.export(step, platforms=platforms)(
                        *args
                    )
                    name = _program_name(src_hw, b, tag)
                    in_shape = list(in_spec.shape)
                    zf.writestr(f"programs/{name}", exported.serialize())
                    if tag == "rsz":
                        shared_rsz[b] = (name, in_shape)
                programs.append(
                    {
                        "src_h": src_hw[0],
                        "src_w": src_hw[1],
                        "batch": b,
                        "kind": tag,
                        "in_shape": in_shape,
                        "name": name,
                    }
                )
                logger.info("exported %s (platforms=%s)", name, platforms)
        meta = {
            "format_version": FORMAT_VERSION,
            "engine": kind,
            "jax_version": jax.__version__,
            "platforms": platforms,
            "model_type": cfg.model_type,
            "input_size": list(engine.input_hw),
            "precision": cfg.precision,
            "confidence_threshold": cfg.confidence_threshold,
            "iou_threshold": cfg.iou_threshold,
            "max_detections": cfg.max_detections,
            "host_select": cfg.host_select,
            "host_resize": cfg.host_resize,
            # graph-backed engines exported only 'full' programs (no stem
            # to fold) — serve-time host_prepare must agree. Only the YOLO
            # engine caches _graph_backed; ResNet/temporal engines consult
            # their model's flag, so check both
            "graph_backed": bool(
                getattr(engine, "_graph_backed", False)
                or getattr(getattr(engine, "model", None), "graph_backed",
                           False)
            ),
            # graph-backed serve-time compute dtype (fp32 default, bf16
            # under graph_precision: bf16) — baked into the exported
            # programs' input specs, so reload must agree
            "graph_precision": cfg.graph_precision,
            "classes": list(cfg.classes) if cfg.classes else None,
            "sequence_length": cfg.sequence_length,
            "resnet_top_k": cfg.resnet_top_k,
            "resnet_scores": cfg.resnet_scores,
            "params": {
                k: {"dtype": str(jnp.dtype(a.dtype)), "shape": list(a.shape)}
                for k, a in flat.items()
            },
            "programs": programs,
        }
        zf.writestr("meta.json", json.dumps(meta, indent=1))


# -- serving ------------------------------------------------------------------


class _ArtifactMixin:
    """Shared .rvae loading/program plumbing for the Exported engines."""

    def _init_artifact(self, config: DetectorConfig, expected_engine: str):
        from .detector import _maybe_enable_compile_cache

        self.config = config
        if config.mesh_shape:
            raise ConfigError(
                "mesh_shape cannot be served from a .rvae artifact: its "
                "programs are compiled single-device at export time. For "
                "mesh serving point model_path at the checkpoint and use "
                "compile_cache_dir."
            )
        # same restart-speed story as the live engine: deserialized
        # programs still XLA-compile once, and the persistent cache is
        # what makes the second start fast
        _maybe_enable_compile_cache(config)
        self.device = _pick_device(config)
        self.mesh = None
        with zipfile.ZipFile(config.model_path) as zf:
            meta = json.loads(zf.read("meta.json"))
            if meta.get("format_version") != FORMAT_VERSION:
                raise ConfigError(
                    f"{config.model_path}: unsupported artifact format "
                    f"{meta.get('format_version')!r} (expected {FORMAT_VERSION})"
                )
            if meta.get("engine") != expected_engine:
                raise ConfigError(
                    f"{config.model_path}: artifact serves a "
                    f"'{meta.get('engine')}' engine, but model_type "
                    f"'{config.model_type}' needs '{expected_engine}'"
                )
            if self.device.platform not in meta["platforms"]:
                raise ConfigError(
                    f"{config.model_path}: exported for platforms "
                    f"{meta['platforms']}, current device is "
                    f"'{self.device.platform}' — re-export on this platform"
                )
            flat = {
                key: np.frombuffer(
                    zf.read(f"params/{key}.bin"), dtype=jnp.dtype(spec["dtype"])
                ).reshape(spec["shape"])
                for key, spec in meta["params"].items()
            }
            # program bytes stay in the zip and are read lazily in
            # _load_program: StableHLO for a full YOLO is MBs per program
            # and each is needed exactly once (the jitted step is cached)
        if not meta["programs"]:
            raise ConfigError(
                f"{config.model_path}: artifact contains no serving "
                "programs — re-export with at least one source resolution"
            )
        self.meta = meta
        self._programs = {
            (p["src_h"], p["src_w"], p["batch"], p["kind"]): p
            for p in meta["programs"]
        }
        self.input_hw = (int(meta["input_size"][0]), int(meta["input_size"][1]))
        # graph-backed artifacts carry no 'sel'/'rsz' programs; host_prepare
        # must make the same decision it made at export time
        self._graph_backed = bool(meta.get("graph_backed", False))
        if list(config.resolved_input_size) != list(self.input_hw):
            logger.warning(
                "detector.input_size %s != artifact input_size %s — the "
                "artifact wins (its geometry is baked into the programs)",
                list(config.resolved_input_size), list(self.input_hw),
            )
        # which knobs are BAKED into the compiled program differs per
        # family: YOLO bakes thresholds/NMS/class-mask; ResNet bakes
        # top-K and the score head; temporal bakes nothing beyond the
        # clip geometry (confidence is applied host-side there)
        baked = {
            "yolo": ("confidence_threshold", "iou_threshold",
                     "max_detections", "classes"),
            "resnet": ("resnet_top_k", "resnet_scores"),
            "temporal": (),
        }[expected_engine]
        for knob in baked:
            mine = getattr(config, knob)
            theirs = meta.get(knob)
            if knob == "classes":
                mine = sorted(mine) if mine else None
                theirs = sorted(theirs) if theirs else None
            if mine != theirs:
                logger.warning(
                    "detector.%s=%s differs from the artifact's baked-in %s "
                    "— these are part of the compiled program; "
                    "re-export to change them", knob, getattr(config, knob),
                    meta.get(knob),
                )
        self.params = jax.device_put(_unflatten_params(flat), self.device)
        if self._graph_backed:
            # fp32 unless the artifact was exported under the opt-in
            # graph_precision: bf16 mixed policy (dtype is baked into the
            # serialized programs' input specs)
            self.compute_dtype = (
                jnp.bfloat16
                if meta.get("graph_precision") == "bf16" else jnp.float32
            )
        else:
            self.compute_dtype = (
                jnp.float32 if meta["precision"] == "fp32" else jnp.bfloat16
            )
        self._steps: Dict[Tuple, object] = {}
        self._bucket_cost_ms: Dict[Tuple[int, int], Dict[int, float]] = {}
        self.last_infer_ms = 0.0
        # bucket machinery everywhere (batcher max_batch, clip flush
        # target, warmup) must track the ARTIFACT's buckets, not whatever
        # the config says — align a private config copy. host_select /
        # host_resize likewise: the host-prep decision is baked into each
        # program's input shape, so serve-time config must not diverge
        # from what export recorded.
        arr_buckets = sorted({p["batch"] for p in meta["programs"]})
        self.config = dataclasses.replace(
            config,
            batch_buckets=arr_buckets,
            max_batch_size=arr_buckets[-1],
            host_select=meta["host_select"],
            host_resize=meta["host_resize"],
        )

    def _artifact_buckets(self, src_hw: Tuple[int, int]) -> List[int]:
        return sorted(
            {
                b
                for (h, w, b, _kind) in self._programs
                if (h, w) == tuple(src_hw)
            }
        )

    def _missing(self, src_hw, batch=None, kind=None) -> str:
        have = ", ".join(sorted(p["name"] for p in self.meta["programs"]))
        want = (
            _program_name(tuple(src_hw), batch, kind)
            if batch is not None
            else f"{src_hw[0]}x{src_hw[1]}"
        )
        return (
            f"{self.config.model_path} has no program for {want} "
            f"(exported: {have}) — re-export with this resolution/bucket"
        )

    def _load_program(self, src_hw: Tuple[int, int], batch: int, kind: str):
        key = (int(src_hw[0]), int(src_hw[1]), int(batch), kind)
        if key not in self._programs:
            raise ConfigError(self._missing(src_hw, batch, kind))
        name = self._programs[key]["name"]
        with zipfile.ZipFile(self.config.model_path) as zf:
            exported = jax.export.deserialize(zf.read(f"programs/{name}"))
        return jax.jit(exported.call, device=self.device)

    def _cached_program(self, cache_key: Tuple, src_hw, batch: int,
                        kind: str):
        """One cache-or-load for every _get_step* variant. 'rsz' programs
        are shared across source resolutions (their input is already
        input_hw), so any exported one of this bucket serves."""
        step = self._steps.get(cache_key)
        if step is None:
            if kind == "rsz":
                src_hw = self._rsz_program_src(batch)
            step = self._load_program(src_hw, batch, kind)
            self._steps[cache_key] = step
        return step

    def _guard_groups(self, shapes) -> None:
        """Reject any same-resolution group larger than the biggest
        exported bucket (iterable of per-item (h, w) shapes)."""
        for _shape, n in Counter(tuple(s) for s in shapes).items():
            self._guard_group_size(n)

    def _rsz_program_src(self, batch: int) -> Tuple[int, int]:
        """Source resolution of any exported 'rsz' program of this bucket
        — the resized step's input is already input_hw, so it is shared
        across source resolutions."""
        for (h, w, b, kind) in sorted(self._programs):
            if b == batch and kind == "rsz":
                return (h, w)
        raise ConfigError(self._missing(("any", "any"), batch, "rsz"))

    def _guard_group_size(self, n: int) -> None:
        """The live engines trace a fresh graph for an oversized batch;
        an artifact cannot — fail with the designed message instead of a
        jax.export calling-convention error."""
        cap = self.config.max_batch_size  # aligned to the artifact
        if n > cap:
            raise ValueError(
                f"batch {n} exceeds the largest exported bucket {cap} "
                f"in {self.config.model_path}"
            )

    def _effective_bucket(self, n: int, src_hw: Tuple[int, int]) -> int:
        from .detector import _cheapest_bucket

        avail = self._artifact_buckets(src_hw)
        if not avail:
            raise ConfigError(self._missing(src_hw))
        if n > avail[-1]:
            raise ValueError(
                f"batch {n} exceeds the largest exported bucket {avail[-1]} "
                f"for {src_hw} in {self.config.model_path}"
            )
        return _cheapest_bucket(
            avail, n, self._bucket_cost_ms.get(tuple(src_hw), {})
        )


class ExportedYoloEngine(_ArtifactMixin, JaxYoloEngine):
    """Serve YOLO detection from an ``.rvae`` artifact: the host path
    (pixel pick / host resize / grouping / bucket selection / tiling
    merge) is inherited from ``JaxYoloEngine`` unchanged; the device step
    comes from the artifact's serialized programs instead of tracing
    model code.

    Only the (resolution x bucket) programs present in the artifact can
    run — an unexported shape raises with the available list (a TensorRT
    engine has the same contract: shapes are pinned at build time).
    """

    def __init__(self, config: DetectorConfig):
        config.validate()
        self._init_artifact(config, "yolo")
        self._class_mask = None  # baked into the programs at export time
        self.class_agnostic_nms = True

    def _get_step_selected(self, batch: int, src_hw: Tuple[int, int]):
        return self._cached_program((batch, *src_hw, "sel"), src_hw, batch,
                                    "sel")

    def _get_step(self, batch: int, src_hw: Tuple[int, int]):
        return self._cached_program((batch, *src_hw), src_hw, batch, "full")

    def _build_step(self, src_hw, batch: int = 0):  # pragma: no cover
        raise ConfigError(self._missing(src_hw, batch, "full"))

    def _build_step_selected(self, src_hw, batch: int = 0):  # pragma: no cover
        raise ConfigError(self._missing(src_hw, batch, "sel"))

    def warmup(self, src_hw: Tuple[int, int],
               buckets: Optional[Sequence[int]] = None) -> None:
        """Compile (cache-warm) every exported bucket for ``src_hw`` and
        time it for cost-aware selection — same contract as the live
        engine's warmup, restricted to the artifact's programs.

        The program kind comes from the SAME serve-time ``host_prepare``
        decision prediction will make (not from the artifact's recorded
        tag): if the host path drifted since export (cv2 missing,
        host_select/host_resize overridden), the mismatch surfaces as the
        designed missing-program ConfigError, never as a shape crash
        inside the exported program."""
        src_hw = (int(src_hw[0]), int(src_hw[1]))
        avail = self._artifact_buckets(src_hw)
        if not avail:
            raise ConfigError(self._missing(src_hw))
        costs = self._bucket_cost_ms.setdefault(src_hw, {})
        wanted = set(buckets) if buckets else None
        for b in avail:
            if wanted is not None and b not in wanted:
                continue
            prepared, selected = self.host_prepare(
                np.zeros((b, *src_hw, 3), dtype=np.uint8), src_hw
            )
            kind = "sel" if selected else "full"
            if (src_hw[0], src_hw[1], b, kind) not in self._programs:
                raise ConfigError(self._missing(src_hw, b, kind))
            cost = float("inf")
            for _ in range(3):
                self._run_bucket(b, prepared, src_hw, selected)
                cost = min(cost, self.last_infer_ms)
            costs[b] = cost
            logger.info(
                "exported warmup: bucket B=%d src=%s (%s) step=%.1fms",
                b, src_hw, kind, cost,
            )
        if self._tiling_active(src_hw) and tuple(src_hw) != self.input_hw:
            # tiled serving runs the INPUT-sized step on the tile crops —
            # warm those programs too (the live engine recurses the same
            # way), or the first tiled batch stalls on inline deserialize
            # + compile and cost-aware selection has no input_hw entry
            self.warmup(self.input_hw, buckets)


class ExportedResNetEngine(_ArtifactMixin, JaxResNetEngine):
    """Serve ResNet classification from an ``.rvae`` artifact (host
    resize, grouping and bucket selection inherited from the live
    engine)."""

    def __init__(self, config: DetectorConfig):
        config.validate()
        self._init_artifact(config, "resnet")

    def predict_packets(self, packets):
        self._guard_groups(p.frame.shape[:2] for p in packets)
        return super().predict_packets(packets)

    def _get_step_resized(self, batch: int):
        return self._cached_program((batch, "rsz"), None, batch, "rsz")

    def _get_step(self, batch: int, src_hw: Tuple[int, int]):
        return self._cached_program((batch, *src_hw), src_hw, batch, "full")


class ExportedTemporalEngine(_ArtifactMixin, JaxTemporalEngine):
    """Serve temporal clip models from an ``.rvae`` artifact — the clip
    buffering / stride / overlap contract is inherited from
    ``JaxTemporalEngine`` verbatim; only the compiled clip step comes from
    the artifact."""

    def __init__(self, config: DetectorConfig):
        config.validate()
        self._init_artifact(config, "temporal")
        if self.meta["sequence_length"] != self.config.sequence_length:
            logger.warning(
                "detector.sequence_length=%s differs from the artifact's "
                "%s — the artifact wins (clip length is baked into the "
                "programs)", self.config.sequence_length,
                self.meta["sequence_length"],
            )
            self.config = dataclasses.replace(
                self.config, sequence_length=self.meta["sequence_length"]
            )
        self.sequence_step = max(
            1,
            int(
                self.config.sequence_length
                * (1.0 - self.config.temporal_overlap)
            ),
        )
        self._buffers = {}

    def predict_clips(self, sequences):
        self._guard_groups(seq[0].frame.shape[:2] for seq in sequences)
        return super().predict_clips(sequences)

    def _get_step_resized(self, batch: int):
        return self._cached_program((batch, "rsz"), None, batch, "rsz")

    def _get_step(self, batch: int, src_hw):
        return self._cached_program((batch, *src_hw), src_hw, batch, "full")

"""AOT-exported serving artifacts — the TPU-native analog of TensorRT
``.engine`` files (reference detector.py:382-466 deserializes prebuilt
engines at startup).

``export_serving_artifact`` AOT-lowers the engine's PRODUCTION fused
serving step (host-prep contract -> pad/letterbox -> forward -> NMS ->
un-letterbox) for an explicit set of (source resolution x batch bucket)
programs via ``jax.export`` and packs them — together with the weights —
into a single self-contained ``.rvae`` zip. ``ExportedYoloEngine`` serves
from that artifact alone: no torch/ONNX checkpoint parsing, no flax graph
construction, no Python model code in the serve path — the deserialized
StableHLO programs are handed straight to XLA.

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

    meta.json                      format/version/config echo + program index
    params/<flat-key>.bin          raw little-endian weight bytes
    programs/<H>x<W>_b<B>_<kind>   serialized jax.export.Exported

Wire-in: ``detector.model_path: something.rvae`` routes ``create_detector``
to ``ExportedYoloEngine``; export with the ``realtime-analytics-export``
CLI (scripts/export_engine.py).
"""

from __future__ import annotations

import json
import logging
import zipfile
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ConfigError, DetectorConfig
from .detector import JaxYoloEngine, _pick_device

logger = logging.getLogger(__name__)

FORMAT_VERSION = 1
ARTIFACT_SUFFIX = ".rvae"


# -- params (de)hydration -----------------------------------------------------


def _flatten_params(params, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict/list-of-arrays -> {'a/b/0/c': array}. List nodes use
    '#<i>' segment keys so unflatten can rebuild them as lists (dict keys
    in YOLO param trees are layer-index strings, which would collide with
    bare integer segments). '/' and '#' never appear in checkpoint keys."""
    flat: Dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            if "/" in str(k) or str(k).startswith("#"):
                raise ValueError(f"unsupported param key {k!r}")
            flat.update(_flatten_params(v, f"{prefix}{k}/"))
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
        if node and all(k.startswith("#") for k in node):
            return [
                rebuild(node[k])
                for k in sorted(node, key=lambda s: int(s[1:]))
            ]
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(out)


# -- export -------------------------------------------------------------------


def _program_name(src_hw: Tuple[int, int], batch: int, selected: bool) -> str:
    kind = "sel" if selected else "full"
    return f"{src_hw[0]}x{src_hw[1]}_b{batch}_{kind}"


def export_serving_artifact(
    engine: JaxYoloEngine,
    path: str,
    src_hws: Sequence[Tuple[int, int]],
    buckets: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> Dict:
    """AOT-export ``engine``'s serving step for every (src_hw x bucket)
    and write the self-contained artifact to ``path``. Returns the meta
    dict (also embedded in the artifact).

    ``platforms`` defaults to the engine's current device platform — the
    artifact then serves only on that platform family (exactly like a
    TensorRT engine is bound to its GPU architecture). Multi-platform
    export works only for programs without TPU-only Pallas kernels.
    """
    if engine.mesh is not None:
        raise ValueError(
            "export_serving_artifact supports single-device engines; "
            "mesh serving compiles per-topology and should keep using the "
            "persistent compile cache"
        )
    if not str(path).endswith(ARTIFACT_SUFFIX):
        raise ValueError(f"artifact path must end with {ARTIFACT_SUFFIX}")
    buckets = sorted(set(buckets or engine.config.resolved_buckets))
    platforms = list(platforms or [engine.device.platform])

    params = jax.device_get(engine.params)
    flat = _flatten_params(params)
    cfg = engine.config
    programs: List[Dict] = []

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for key, arr in flat.items():
            zf.writestr(f"params/{key}.bin", np.ascontiguousarray(arr).tobytes())
        for src_hw in src_hws:
            src_hw = (int(src_hw[0]), int(src_hw[1]))
            # the SAME host-prep decision serving will make (pick/resize
            # geometry is a pure function of resolution + config)
            probe, selected = engine.host_prepare(
                np.zeros((1, *src_hw, 3), np.uint8), src_hw
            )
            in_hw = tuple(int(d) for d in probe.shape[1:3])
            for b in buckets:
                step = (
                    engine._build_step_selected(src_hw, b)
                    if selected
                    else engine._build_step(src_hw, b)
                )
                args = (
                    jax.tree_util.tree_map(
                        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
                    ),
                    jax.ShapeDtypeStruct((b, *in_hw, 3), jnp.uint8),
                )
                exported = jax.export.export(step, platforms=platforms)(*args)
                name = _program_name(src_hw, b, selected)
                zf.writestr(f"programs/{name}", exported.serialize())
                programs.append(
                    {
                        "src_h": src_hw[0],
                        "src_w": src_hw[1],
                        "batch": b,
                        "selected": bool(selected),
                        "in_h": in_hw[0],
                        "in_w": in_hw[1],
                        "name": name,
                    }
                )
                logger.info("exported %s (platforms=%s)", name, platforms)
        meta = {
            "format_version": FORMAT_VERSION,
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
            "classes": list(cfg.classes) if cfg.classes else None,
            "params": {
                k: {"dtype": str(jnp.dtype(a.dtype)), "shape": list(a.shape)}
                for k, a in flat.items()
            },
            "programs": programs,
        }
        zf.writestr("meta.json", json.dumps(meta, indent=1))
    logger.info(
        "wrote %s: %d program(s), %d weight tensors", path, len(programs),
        len(flat),
    )
    return meta


# -- serving ------------------------------------------------------------------


class ExportedYoloEngine(JaxYoloEngine):
    """Serve from an ``.rvae`` artifact: the host path (pixel pick / host
    resize / grouping / bucket selection / tiling merge) is inherited from
    ``JaxYoloEngine`` unchanged; the device step comes from the artifact's
    serialized programs instead of tracing model code.

    Only the (resolution x bucket) programs present in the artifact can
    run — an unexported shape raises with the available list (a TensorRT
    engine has the same contract: shapes are pinned at build time).
    """

    def __init__(self, config: DetectorConfig):
        config.validate()
        self.config = config
        self.device = _pick_device(config)
        self.mesh = None

        with zipfile.ZipFile(config.model_path) as zf:
            meta = json.loads(zf.read("meta.json"))
            if meta.get("format_version") != FORMAT_VERSION:
                raise ConfigError(
                    f"{config.model_path}: unsupported artifact format "
                    f"{meta.get('format_version')!r} (expected {FORMAT_VERSION})"
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
            self._exported_bytes = {
                p["name"]: zf.read(f"programs/{p['name']}")
                for p in meta["programs"]
            }
        self.meta = meta
        self._programs = {
            (p["src_h"], p["src_w"], p["batch"], bool(p["selected"])): p
            for p in meta["programs"]
        }
        self.input_hw = (int(meta["input_size"][0]), int(meta["input_size"][1]))
        if list(config.resolved_input_size) != list(self.input_hw):
            logger.warning(
                "detector.input_size %s != artifact input_size %s — the "
                "artifact wins (its geometry is baked into the programs)",
                list(config.resolved_input_size), list(self.input_hw),
            )
        for knob in ("confidence_threshold", "iou_threshold", "max_detections"):
            if getattr(config, knob) != meta[knob]:
                logger.warning(
                    "detector.%s=%s differs from the artifact's baked-in %s "
                    "— thresholds are part of the compiled program; "
                    "re-export to change them", knob, getattr(config, knob),
                    meta[knob],
                )
        self.params = jax.device_put(_unflatten_params(flat), self.device)
        self.compute_dtype = (
            jnp.float32 if meta["precision"] == "fp32" else jnp.bfloat16
        )
        self._class_mask = None  # baked into the programs at export time
        self._steps: Dict[Tuple, object] = {}
        self._bucket_cost_ms: Dict[Tuple[int, int], Dict[int, float]] = {}
        self.class_agnostic_nms = True
        self.last_infer_ms = 0.0

    # the exported bucket set for a resolution replaces config buckets:
    # selection must never route to a program that is not in the artifact
    def _effective_bucket(self, n: int, src_hw: Tuple[int, int]) -> int:
        from .detector import _cheapest_bucket

        avail = sorted(
            {
                b
                for (h, w, b, _sel) in self._programs
                if (h, w) == tuple(src_hw)
            }
        )
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

    def _missing(self, src_hw, batch=None, selected=None) -> str:
        have = ", ".join(sorted(p["name"] for p in self.meta["programs"]))
        want = (
            _program_name(tuple(src_hw), batch, selected)
            if batch is not None
            else f"{src_hw[0]}x{src_hw[1]}"
        )
        return (
            f"{self.config.model_path} has no program for {want} "
            f"(exported: {have}) — re-export with this resolution/bucket"
        )

    def _load_program(self, src_hw: Tuple[int, int], batch: int,
                      selected: bool):
        key = (int(src_hw[0]), int(src_hw[1]), int(batch), bool(selected))
        if key not in self._programs:
            raise ConfigError(self._missing(src_hw, batch, selected))
        exported = jax.export.deserialize(
            self._exported_bytes[self._programs[key]["name"]]
        )
        return jax.jit(exported.call, device=self.device)

    def _get_step_selected(self, batch: int, src_hw: Tuple[int, int]):
        key = (batch, *src_hw, "sel")
        step = self._steps.get(key)
        if step is None:
            step = self._load_program(src_hw, batch, True)
            self._steps[key] = step
        return step

    def _get_step(self, batch: int, src_hw: Tuple[int, int]):
        key = (batch, *src_hw)
        step = self._steps.get(key)
        if step is None:
            step = self._load_program(src_hw, batch, False)
            self._steps[key] = step
        return step

    def _build_step(self, src_hw, batch: int = 0):  # pragma: no cover
        raise ConfigError(self._missing(src_hw, batch, False))

    def _build_step_selected(self, src_hw, batch: int = 0):  # pragma: no cover
        raise ConfigError(self._missing(src_hw, batch, True))

    def warmup(self, src_hw: Tuple[int, int],
               buckets: Optional[Sequence[int]] = None) -> None:
        """Compile (cache-warm) every exported bucket for ``src_hw`` and
        time it for cost-aware selection — same contract as the live
        engine's warmup, restricted to the artifact's programs."""
        src_hw = (int(src_hw[0]), int(src_hw[1]))
        rows = [
            (b, sel) for (h, w, b, sel) in sorted(self._programs)
            if (h, w) == src_hw
        ]
        if not rows:
            raise ConfigError(self._missing(src_hw))
        costs = self._bucket_cost_ms.setdefault(src_hw, {})
        wanted = set(buckets) if buckets else None
        for b, selected in rows:
            if wanted is not None and b not in wanted:
                continue
            prepared, _ = self.host_prepare(
                np.zeros((b, *src_hw, 3), dtype=np.uint8), src_hw
            )
            cost = float("inf")
            for _ in range(3):
                self._run_bucket(b, prepared, src_hw, selected)
                cost = min(cost, self.last_infer_ms)
            costs[b] = cost
            logger.info(
                "exported warmup: bucket B=%d src=%s (selected=%s) "
                "step=%.1fms", b, src_hw, selected, cost,
            )

"""Checkpoint loading: torch state dicts -> JAX pytrees, BN folded.

Replaces the reference's strategy of shipping one model file format per
backend (.pt / .onnx / .engine / .xml / .rknn — reference models/README.md).
Here a single loader maps Ultralytics-layout torch ``state_dict``s (the
format inside ``yolov8*.pt`` / ``yolov5*.pt``) onto the ``YoloModel`` params
pytree by layer index, folding every BatchNorm into its conv:

    w' = w * gamma / sqrt(var + eps)        (per output channel)
    b' = beta - gamma * mean / sqrt(var + eps)

Accepted inputs for ``load_yolo_checkpoint``:
  * a ``.pt``/``.pth`` file containing a raw ``state_dict`` (plain tensors),
  * an Ultralytics checkpoint dict (``{"model": <nn.Module>}``) when the
    unpickling environment allows it,
  * a ``.npz`` with the same key names (portable, no torch needed),
  * anything else -> ``None`` (caller falls back to random init with a loud
    warning; the pipeline stays runnable without weights).

TorchVision ResNet state dicts are supported by ``load_resnet_state_dict``.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .resnet import ResNetModel
from .yolo import YoloModel

logger = logging.getLogger(__name__)

BN_EPS = 1e-3  # Ultralytics BatchNorm2d eps
BN_EPS_TORCHVISION = 1e-5


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _fold_conv_bn(
    sd: Mapping[str, np.ndarray], conv_prefix: str, bn_prefix: Optional[str],
    eps: float = BN_EPS,
) -> Dict[str, jnp.ndarray]:
    """OIHW conv (+BN) -> fused {"w": HWIO, "b": [O]}."""
    w = _np(sd[f"{conv_prefix}.weight"]).astype(np.float32)  # [O, I, kh, kw]
    b = (
        _np(sd[f"{conv_prefix}.bias"]).astype(np.float32)
        if f"{conv_prefix}.bias" in sd
        else np.zeros(w.shape[0], np.float32)
    )
    if bn_prefix is not None and f"{bn_prefix}.weight" in sd:
        gamma = _np(sd[f"{bn_prefix}.weight"]).astype(np.float32)
        beta = _np(sd[f"{bn_prefix}.bias"]).astype(np.float32)
        mean = _np(sd[f"{bn_prefix}.running_mean"]).astype(np.float32)
        var = _np(sd[f"{bn_prefix}.running_var"]).astype(np.float32)
        scale = gamma / np.sqrt(var + eps)
        w = w * scale[:, None, None, None]
        b = beta + (b - mean) * scale
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
        "b": jnp.asarray(b),
    }


def _conv_block(sd, prefix: str) -> Dict:
    """Ultralytics "Conv" module: <prefix>.conv + <prefix>.bn."""
    return _fold_conv_bn(sd, f"{prefix}.conv", f"{prefix}.bn")


def _bottleneck(sd, prefix: str) -> Dict:
    return {"cv1": _conv_block(sd, f"{prefix}.cv1"),
            "cv2": _conv_block(sd, f"{prefix}.cv2")}


def yolo_params_from_state_dict(
    model: YoloModel, sd: Mapping[str, np.ndarray], prefix: str = "model."
) -> Dict:
    """Map an Ultralytics-layout state dict onto the params pytree."""
    layers: Dict[str, Dict] = {}
    for i, node in enumerate(model.nodes):
        base = f"{prefix}{i}"
        if node.kind == "conv":
            layers[str(i)] = _conv_block(sd, base)
        elif node.kind in ("c2f", "c3"):
            p = {
                "cv1": _conv_block(sd, f"{base}.cv1"),
                "cv2": _conv_block(sd, f"{base}.cv2"),
                "m": [_bottleneck(sd, f"{base}.m.{j}") for j in range(node.n)],
            }
            if node.kind == "c3":
                p["cv3"] = _conv_block(sd, f"{base}.cv3")
            layers[str(i)] = p
        elif node.kind == "sppf":
            layers[str(i)] = {
                "cv1": _conv_block(sd, f"{base}.cv1"),
                "cv2": _conv_block(sd, f"{base}.cv2"),
            }
        elif node.kind == "detect_v8":
            cv2, cv3 = [], []
            for lvl in range(3):
                cv2.append([
                    _conv_block(sd, f"{base}.cv2.{lvl}.0"),
                    _conv_block(sd, f"{base}.cv2.{lvl}.1"),
                    _fold_conv_bn(sd, f"{base}.cv2.{lvl}.2", None),
                ])
                cv3.append([
                    _conv_block(sd, f"{base}.cv3.{lvl}.0"),
                    _conv_block(sd, f"{base}.cv3.{lvl}.1"),
                    _fold_conv_bn(sd, f"{base}.cv3.{lvl}.2", None),
                ])
            layers[str(i)] = {"cv2": cv2, "cv3": cv3}
        elif node.kind == "detect_v5":
            p = {
                "m": [_fold_conv_bn(sd, f"{base}.m.{lvl}", None) for lvl in range(3)]
            }
            # the published .pt registers `anchors` divided by stride
            # (yolov5 Detect.__init__); multiply back to input pixels so
            # custom-trained anchor sets decode correctly
            if f"{base}.anchors" in sd:
                a = _np(sd[f"{base}.anchors"]).astype(np.float32)  # [3, na, 2]
                strides = np.asarray([8.0, 16.0, 32.0], np.float32)
                p["anchors"] = jnp.asarray(a * strides[:, None, None])
            else:
                from .yolo import V5_ANCHORS

                p["anchors"] = jnp.asarray(np.asarray(V5_ANCHORS, np.float32))
            layers[str(i)] = p
    return {"layers": layers}


def _shape_key():
    return jax.random.PRNGKey(0)


def load_yolo_checkpoint(model: YoloModel, path: str) -> Optional[Dict]:
    """Best-effort load of a YOLO checkpoint file. Returns None on failure."""
    try:
        sd = _read_state_dict(path)
    except Exception as exc:  # noqa: BLE001
        logger.warning("Could not read checkpoint %s: %s", path, exc)
        return None
    if sd is None:
        return None
    if "__pytree__" in sd:
        params = sd["__pytree__"].item()
        want = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)),
                                      model.init_params(_shape_key()))
        got = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), params)
        if want != got:
            logger.warning("pytree checkpoint %s does not match the model", path)
            return None
        return jax.tree_util.tree_map(jnp.asarray, params)
    # Ultralytics full-model state dicts prefix everything with "model.".
    prefix = "model." if any(k.startswith("model.0.") for k in sd) else ""
    try:
        return yolo_params_from_state_dict(model, sd, prefix=prefix)
    except KeyError as exc:
        logger.warning(
            "Checkpoint %s does not match %s%s layout (missing %s)",
            path, "yolov" + str(model.version), model.size, exc,
        )
        return None


def _read_state_dict(path: str) -> Optional[Mapping[str, np.ndarray]]:
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=True))
        if "__pytree__" in flat:
            # native params pytree (e.g. saved by scripts/train.py) — the
            # caller's name-mapping is bypassed via _PYTREE marker
            return {"__pytree__": flat["__pytree__"]}
        return {k: v for k, v in flat.items()}
    if path.endswith(".onnx"):
        # torch-exported ONNX preserves state-dict parameter names in the
        # initializers (BN usually pre-fused); no onnx package needed
        from .onnx_lite import read_onnx_initializers

        sd = read_onnx_initializers(path)
        return {
            k: v.astype(np.float32) if v.dtype == np.float16 else v
            for k, v in sd.items()
        }
    import torch  # local import: torch is host-side only

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model"):
            if key in obj:
                inner = obj[key]
                if hasattr(inner, "state_dict"):
                    inner = inner.float().state_dict()
                if isinstance(inner, dict):
                    return {k: _np(v) for k, v in inner.items()}
        if all(hasattr(v, "detach") or isinstance(v, np.ndarray) for v in obj.values()):
            return {k: _np(v) for k, v in obj.items()}
    if hasattr(obj, "state_dict"):
        return {k: _np(v) for k, v in obj.float().state_dict().items()}
    return None


# ---------------------------------------------------------------------------
# Temporal models: torch-named state dicts -> params pytrees
#
# The reference ingests user temporal checkpoints as torch->ONNX exports
# (temporal_detector.py:179-319, convert_temporal_model_to_onnx.py:34-121).
# Here the contract is a torch state dict with the module names below
# (produced by scripts/export_temporal_model.py or any torch model with the
# same architecture), carried as .pt, flat .npz, or a weights-.onnx.
# ---------------------------------------------------------------------------


def _t_conv(sd, name: str) -> Dict[str, jnp.ndarray]:
    """torch Conv2d (OIHW) -> {"w": HWIO, "b"}."""
    w = _np(sd[f"{name}.weight"]).astype(np.float32)
    b = (
        _np(sd[f"{name}.bias"]).astype(np.float32)
        if f"{name}.bias" in sd
        else np.zeros(w.shape[0], np.float32)
    )
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}


def _t_conv3d(sd, name: str) -> Dict[str, jnp.ndarray]:
    """torch Conv3d (OIDHW) -> {"w": DHWIO, "b"}."""
    w = _np(sd[f"{name}.weight"]).astype(np.float32)
    b = (
        _np(sd[f"{name}.bias"]).astype(np.float32)
        if f"{name}.bias" in sd
        else np.zeros(w.shape[0], np.float32)
    )
    return {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0)), "b": jnp.asarray(b)}


def _t_dense(sd, name: str) -> Dict[str, jnp.ndarray]:
    """torch Linear ([out, in]) -> {"w": [in, out], "b"}."""
    return {
        "w": jnp.asarray(_np(sd[f"{name}.weight"]).astype(np.float32).T),
        "b": jnp.asarray(_np(sd[f"{name}.bias"]).astype(np.float32)),
    }


def temporal_params_from_state_dict(model, sd: Mapping[str, np.ndarray]) -> Dict:
    """Map a torch-named temporal state dict onto the model's params pytree.

    torch nn.LSTM packs gates (i, f, g, o) along dim 0 of weight_ih_l0 /
    weight_hh_l0 — the same order our scan cell splits — so the mapping is
    a transpose plus summing the two bias vectors.
    """
    kind = type(model).__name__
    if kind == "CNNLSTM":
        return {
            "encoder": {
                "c1": _t_conv(sd, "c1"),
                "c2": _t_conv(sd, "c2"),
                "c3": _t_conv(sd, "c3"),
                "proj": _t_dense(sd, "proj"),
            },
            "lstm": {
                "wx": jnp.asarray(_np(sd["lstm.weight_ih_l0"]).astype(np.float32).T),
                "wh": jnp.asarray(_np(sd["lstm.weight_hh_l0"]).astype(np.float32).T),
                "b": jnp.asarray(
                    _np(sd["lstm.bias_ih_l0"]).astype(np.float32)
                    + _np(sd["lstm.bias_hh_l0"]).astype(np.float32)
                ),
            },
            "fc": _t_dense(sd, "fc"),
        }
    if kind == "ConvGRU":
        return {
            "stem": _t_conv(sd, "stem"),
            "zr": _t_conv(sd, "zr"),
            "hcand": _t_conv(sd, "hcand"),
            "head": _t_conv(sd, "head"),
            "fc": _t_dense(sd, "fc"),
        }
    if kind == "CNN3D":
        return {
            "c1": _t_conv3d(sd, "c1"),
            "c2": _t_conv3d(sd, "c2"),
            "c3": _t_conv3d(sd, "c3"),
            "c4": _t_conv3d(sd, "c4"),
            "fc": _t_dense(sd, "fc"),
        }
    if kind == "SlowFast":
        return {
            "slow": {f"c{j}": _t_conv3d(sd, f"slow.c{j}") for j in (1, 2, 3)},
            "fast": {f"c{j}": _t_conv3d(sd, f"fast.c{j}") for j in (1, 2, 3)},
            "fc": _t_dense(sd, "fc"),
        }
    raise ValueError(f"unsupported temporal model class: {kind}")


def temporal_state_dict_from_params(model, params) -> Dict[str, np.ndarray]:
    """Inverse of ``temporal_params_from_state_dict``: params pytree ->
    torch-named arrays (OIHW / [out, in]), for .onnx / .npz export."""

    def conv(p):
        return {"weight": np.asarray(p["w"]).transpose(3, 2, 0, 1),
                "bias": np.asarray(p["b"])}

    def conv3d(p):
        return {"weight": np.asarray(p["w"]).transpose(4, 3, 0, 1, 2),
                "bias": np.asarray(p["b"])}

    def dense(p):
        return {"weight": np.asarray(p["w"]).T, "bias": np.asarray(p["b"])}

    def flat(prefix, d):
        return {f"{prefix}.{k}": v for k, v in d.items()}

    kind = type(model).__name__
    out: Dict[str, np.ndarray] = {}
    if kind == "CNNLSTM":
        enc = params["encoder"]
        for n in ("c1", "c2", "c3"):
            out.update(flat(n, conv(enc[n])))
        out.update(flat("proj", dense(enc["proj"])))
        lstm = params["lstm"]
        out["lstm.weight_ih_l0"] = np.asarray(lstm["wx"]).T
        out["lstm.weight_hh_l0"] = np.asarray(lstm["wh"]).T
        out["lstm.bias_ih_l0"] = np.asarray(lstm["b"])
        out["lstm.bias_hh_l0"] = np.zeros_like(np.asarray(lstm["b"]))
        out.update(flat("fc", dense(params["fc"])))
    elif kind == "ConvGRU":
        for n in ("stem", "zr", "hcand", "head"):
            out.update(flat(n, conv(params[n])))
        out.update(flat("fc", dense(params["fc"])))
    elif kind == "CNN3D":
        for n in ("c1", "c2", "c3", "c4"):
            out.update(flat(n, conv3d(params[n])))
        out.update(flat("fc", dense(params["fc"])))
    elif kind == "SlowFast":
        for path in ("slow", "fast"):
            for j in (1, 2, 3):
                out.update(flat(f"{path}.c{j}", conv3d(params[path][f"c{j}"])))
        out.update(flat("fc", dense(params["fc"])))
    else:
        raise ValueError(f"unsupported temporal model class: {kind}")
    return out


def load_temporal_checkpoint(model, path: str) -> Optional[Dict]:
    """Load a temporal checkpoint: .npz pytree (native), torch-named flat
    .npz, weights-.onnx (torch-exported initializers), or .pt state dict.
    Returns None on failure (caller falls back to random init)."""
    try:
        if path.endswith(".npz"):
            flat = dict(np.load(path, allow_pickle=True))
            if "__pytree__" in flat:
                return flat["__pytree__"].item()
            return temporal_params_from_state_dict(model, flat)
        sd = _read_state_dict(path)
        if sd is None:
            return None
        return temporal_params_from_state_dict(model, sd)
    except Exception as exc:  # noqa: BLE001
        logger.warning("Could not load temporal checkpoint %s: %s", path, exc)
        return None


# ---------------------------------------------------------------------------
# Weight-only int8 quantization (the analog of the reference's RKNN uint8
# path, detector.py:705-869 — weights stored int8, dequant fused into convs)
# ---------------------------------------------------------------------------


def quantize_params_int8(params) -> Dict:
    """Per-output-channel symmetric int8 for every conv weight leaf.

    Each {"w": [..., O], "b": ...} becomes {"w_q": int8, "w_scale": [O] f32,
    "b": ...}. Non-conv leaves (biases, dense 'w' in recurrent heads) are
    left untouched; ``layers.get_weight`` dequantizes lazily so the fused
    graph reads int8 from HBM.
    """

    def q(node):
        if not isinstance(node, dict) or "w" not in node:
            return node
        w = np.asarray(node["w"], dtype=np.float32)
        if w.ndim < 4:  # only conv kernels (HWIO); keep dense weights fp
            return node
        scale = np.max(np.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
        scale = np.maximum(scale, 1e-12)
        wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        out = {k: v for k, v in node.items() if k != "w"}
        out["w_q"] = jnp.asarray(wq)
        out["w_scale"] = jnp.asarray(scale.astype(np.float32))
        return out

    def walk(node):
        if isinstance(node, dict):
            if "w" in node:
                return q(node)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def calibrate_int8_activations(model, params, sample_inputs) -> Dict:
    """Bake static per-tensor activation scales into a quantized params tree.

    Runs the model *eagerly* (no jit) over ``sample_inputs`` with a
    calibration sink enabled, recording each conv's max |input|, then writes
    ``a_scale = max / 127`` into the matching param nodes. The compiled int8
    graph then quantizes activations with a constant — no per-conv dynamic
    max pass (which otherwise costs more than int8 saves).

    ``sample_inputs``: iterable of model-ready arrays [N, H, W, 3].
    Returns the same tree (mutated in place) for convenience.
    """
    from . import layers as _layers

    sink: Dict[int, float] = {}
    _layers._calibration_sink = sink
    try:
        for x in sample_inputs:
            model.apply(params, x)
    finally:
        _layers._calibration_sink = None

    def walk(node):
        if isinstance(node, dict):
            if "w_q" in node and id(node) in sink:
                node["a_scale"] = jnp.asarray(
                    max(sink[id(node)], 1e-8) / 127.0, dtype=jnp.float32
                )
            else:
                for v in node.values():
                    walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    baked = sum(1 for k in sink)
    logger.info("int8 calibration: baked %d activation scales", baked)
    return params


# ---------------------------------------------------------------------------
# ResNet (torchvision layout)
# ---------------------------------------------------------------------------


def resnet_params_from_state_dict(
    model: ResNetModel, sd: Mapping[str, np.ndarray]
) -> Dict:
    eps = BN_EPS_TORCHVISION
    params: Dict = {"stem": _fold_conv_bn(sd, "conv1", "bn1", eps=eps)}
    layers: List[List[Dict]] = []
    for stage_idx, n_blocks in enumerate(model.stages):
        blocks = []
        for b in range(n_blocks):
            base = f"layer{stage_idx + 1}.{b}"
            blk = {
                "conv1": _fold_conv_bn(sd, f"{base}.conv1", f"{base}.bn1", eps=eps),
                "conv2": _fold_conv_bn(sd, f"{base}.conv2", f"{base}.bn2", eps=eps),
            }
            if model.bottleneck:
                blk["conv3"] = _fold_conv_bn(sd, f"{base}.conv3", f"{base}.bn3", eps=eps)
            if f"{base}.downsample.0.weight" in sd:
                blk["down"] = _fold_conv_bn(
                    sd, f"{base}.downsample.0", f"{base}.downsample.1", eps=eps
                )
            blocks.append(blk)
        layers.append(blocks)
    params["layers"] = layers
    params["fc"] = {
        "w": jnp.asarray(_np(sd["fc.weight"]).astype(np.float32).T),
        "b": jnp.asarray(_np(sd["fc.bias"]).astype(np.float32)),
    }
    return params


def load_resnet_checkpoint(model: ResNetModel, path: str) -> Optional[Dict]:
    """torchvision-named state dict (.pt / flat .npz / weights-.onnx) or a
    native params-pytree .npz (e.g. saved from model.init_params or a
    training run) — same checkpoint families as the YOLO loader."""
    try:
        sd = _read_state_dict(path)
        if sd is None:
            return None
        if "__pytree__" in sd:
            params = sd["__pytree__"].item()
            want = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)),
                                          model.init_params(_shape_key()))
            got = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), params)
            if want != got:
                logger.warning(
                    "pytree checkpoint %s does not match the model", path
                )
                return None
            return jax.tree_util.tree_map(jnp.asarray, params)
        return resnet_params_from_state_dict(model, sd)
    except Exception as exc:  # noqa: BLE001
        logger.warning("Could not load ResNet checkpoint %s: %s", path, exc)
        return None

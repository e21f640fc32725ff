"""Graph-backed model adapters: serve an arbitrary user ONNX file.

The reference's ONNX Runtime / OpenVINO backends execute whatever graph the
user exported (reference detector.py:484-609 builds a session straight from
the file; temporal_detector.py:179-319 likewise) — the architecture never
has to match anything the framework knows. The named loaders in
``models/weights.py`` cover the documented checkpoint layouts; these
adapters cover the rest: when a ``.onnx`` matches no known layout, the
engines fall back to compiling the **graph itself** with
``models/onnx_jax.py`` and serving it inside the same fused jit steps
(device preprocess + forward + NMS stay one XLA program).

Batch handling. torch exports come in two shapes:

* **dynamic-batch** exports (the reference's own temporal converter uses
  ``dynamic_axes``): batch-dependent reshape targets arrive as Shape->
  Gather->Concat subgraphs, which ``onnx_jax`` folds against the *serving*
  shape at trace time — every bucket compiles correctly.
* **static-batch** exports (e.g. stock Ultralytics ``yolov8n.onnx``,
  batch 1 baked into every Reshape constant): the adapter detects this
  with an abstract probe at a batch the export can't have used, and
  serves through ``jax.vmap`` over a per-example call — XLA still emits
  batched convolutions, so the MXU sees the full bucket.

Weights device residency: float initializers are fed as runtime params
(device-put by the engines like any checkpoint pytree) rather than baked
into the executable as constants; shape-machinery tensors (int tensors,
Resize scales, Range bounds) stay compile-time constants so the folding
above works. Graphs serve in fp32 by default — a foreign graph's numerics
are the user's contract, so the engines skip their bf16 param cast for
these (``graph_backed`` attribute). ``detector.graph_precision: bf16``
opts into the mixed-precision policy (``onnx_jax.graph_compute_dtype``):
bf16 MXU operands with fp32 accumulation and fp32 islands for the
numerically sensitive ops — the TPU analog of the reference building an
FP16 TensorRT engine from a user's fp32 ONNX (detector.py:382-466).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .onnx_exec import UnsupportedOnnxOp, _eval_node
from .onnx_jax import compile_graph, graph_compute_dtype
from .onnx_lite import OnnxGraph, read_onnx_model

logger = logging.getLogger(__name__)

# a batch size no sane export was traced at — used to probe batch dynamism
_PROBE_BATCH = 3


def graph_dtype(graph_precision: str):
    """Map the ``detector.graph_precision`` knob to the adapters'
    ``compute_dtype`` (config validation already rejects other values)."""
    return jnp.bfloat16 if graph_precision == "bf16" else jnp.float32


def _abstract(params: Dict[str, np.ndarray]) -> Dict[str, jax.ShapeDtypeStruct]:
    """Param tree as ShapeDtypeStructs. Probes MUST trace with abstract
    params — live serving jits with params as traced arguments, so a graph
    whose float initializer feeds a static-shape position (e.g. float ->
    Cast(int64) -> Reshape target) must fail the probe the same way it
    would fail the first live batch."""
    return {
        k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
        for k, v in params.items()
    }


def fold_constants(g: OnnxGraph) -> OnnxGraph:
    """Load-time partial evaluation: every node computable purely from
    initializers (no graph-input dependency) collapses into an
    initializer via the numpy executor.

    The payoff is quantized exports: torch's fake-quant QDQ exporter
    leaves weights fp32 with a runtime ``QuantizeLinear`` pair
    (``w_f32 -> Q -> DQ -> Conv``); folding the ``Q`` leaves
    ``w_int8 -> DQ -> Conv`` — the int8-weight-resident artifact shape
    onnxruntime's static quantizer emits, which ``serving_params`` then
    keeps device-resident at one byte per element. Also sweeps Constant
    nodes and attribute-math chains out of the serving graph."""
    values: dict = dict(g.initializers)
    graph_inputs = set(g.inputs)
    remaining = []
    for node in g.nodes:
        foldable = all((not i) or (i in values) for i in node.inputs) and \
            not any(i in graph_inputs for i in node.inputs)
        if foldable and node.op_type == "DequantizeLinear" and np.asarray(
            values[node.inputs[0]]
        ).dtype in (np.dtype(np.int8), np.dtype(np.uint8)):
            # the int8 -> fp32 barrier: folding this would re-materialize
            # the fp32 weight; keeping it live leaves the weight quantized
            # in device memory and the dequant inside the XLA program
            foldable = False
        if foldable:
            try:
                tmp = {"": None}
                tmp.update({i: values[i] for i in node.inputs if i})
                _eval_node(node, tmp)
            except Exception:  # noqa: BLE001 — leave it to the live path
                remaining.append(node)
                continue
            for o in node.outputs:
                if o and o in tmp:
                    values[o] = np.asarray(tmp[o])
        else:
            remaining.append(node)
    used = set(g.outputs)
    for n in remaining:
        used.update(n.inputs)
    n_folded = len(g.nodes) - len(remaining)
    if n_folded:
        logger.info("ONNX load: folded %d constant node(s)", n_folded)
    return OnnxGraph(
        nodes=remaining,
        initializers={k: v for k, v in values.items() if k in used},
        inputs=g.inputs,
        outputs=g.outputs,
    )


# quantized-op operand positions where an int8/uint8 initializer is a
# WEIGHT (big tensor worth keeping device-resident at 1 byte/element —
# the RKNN-analog HBM win); zero points sit at other positions and stay
# compile-time constants
_QUANT_WEIGHT_POSITIONS = {
    "DequantizeLinear": (0,),
    "ConvInteger": (0, 1),
    "MatMulInteger": (0, 1),
    "QLinearConv": (0, 3),
    "QLinearMatMul": (0, 3),
}

# float operand positions that are quantization SCALES: the model's
# numerics, never a precision knob — they must survive any engine-level
# bf16 param cast at full fp32 (truncating a scale to bf16 shifts the
# quantization grid itself)
_QUANT_SCALE_POSITIONS = {
    "QuantizeLinear": (1,),
    "DequantizeLinear": (1,),
    "QLinearConv": (1, 4, 6),
    "QLinearMatMul": (1, 4, 6),
}


def quant_scale_param_names(g: OnnxGraph) -> frozenset:
    """Initializer names consumed at quantization-scale positions."""
    names = set()
    for node in g.nodes:
        for pos in _QUANT_SCALE_POSITIONS.get(node.op_type, ()):
            if pos < len(node.inputs) and node.inputs[pos] in g.initializers:
                names.add(node.inputs[pos])
    return frozenset(names)


def cast_params_for_compute(params, compute_dtype, fp32_names=frozenset()):
    """Engine-side param cast to the compute dtype, exempting quantization
    scales (``fp32_names``) and non-float tensors. Works on the flat
    name->array dicts graph models use and on arbitrary pytrees when no
    exemptions apply."""
    import jax

    if fp32_names and isinstance(params, dict):
        return {
            k: (
                jnp.asarray(v).astype(compute_dtype)
                if k not in fp32_names
                and jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)
                else jnp.asarray(v)
            )
            for k, v in params.items()
        }
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a).astype(compute_dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
        params,
    )


def serving_params(g: OnnxGraph) -> Dict[str, np.ndarray]:
    """Initializers that are safe to feed as runtime params: float tensors
    (weights), except anything consumed as a shape/scale argument (Resize
    scales/sizes, Range bounds, ConstantOfShape shape) — those must stay
    compile-time constants for the static-shape folding in onnx_jax to
    work; plus int8/uint8 quantized weights consumed ONLY at quantized-op
    weight positions (so the executable carries them at one byte per
    element instead of a folded fp32 constant). Other int tensors stay
    constant (Reshape/Slice/Split arguments, zero points)."""
    static_names = set()
    for node in g.nodes:
        if node.op_type == "Resize":
            static_names.update(node.inputs[1:])
        elif node.op_type in ("Range", "ConstantOfShape"):
            static_names.update(node.inputs)
        elif node.op_type == "Pad":
            # constant_value (3rd input) is a float scalar the executor
            # needs static (jnp.pad constant); pads/axes are ints and
            # stay constant anyway
            static_names.update(node.inputs[2:3])
    qweights = set()
    for node in g.nodes:  # every use must be a quantized-weight position
        allowed = _QUANT_WEIGHT_POSITIONS.get(node.op_type, ())
        for pos, name in enumerate(node.inputs):
            if name in g.initializers and g.initializers[name].dtype in (
                np.dtype(np.int8), np.dtype(np.uint8),
            ):
                if pos in allowed:
                    qweights.add(name)
                else:
                    static_names.add(name)
    return {
        k: v
        for k, v in g.initializers.items()
        if k not in static_names
        and (np.issubdtype(v.dtype, np.floating) or k in qweights)
    }


class OnnxGraphModel:
    """Base adapter: compiled graph + batch-mode probe + param handling.

    Exposes the same ``init_params`` / ``apply``-style surface the native
    models do, so the engines' fused steps close over it unchanged."""

    graph_backed = True

    def __init__(self, graph: OnnxGraph, example_shape: Tuple[int, ...],
                 compute_dtype=jnp.float32):
        """``example_shape``: graph-layout input shape WITHOUT the batch
        dim (e.g. (3, 640, 640) for a detector). ``compute_dtype``:
        ``jnp.float32`` (default, exact) or ``jnp.bfloat16`` (the opt-in
        ``graph_precision: bf16`` mixed policy — see module docstring)."""
        if len(graph.inputs) != 1:
            raise UnsupportedOnnxOp(
                f"serving graphs must have exactly one data input, "
                f"found {graph.inputs}"
            )
        graph = fold_constants(graph)
        self.graph = graph
        self.input_name = graph.inputs[0]
        self.compute_dtype = compute_dtype
        self._params = serving_params(graph)
        # quantization scales riding as runtime params must stay fp32
        # under any engine bf16 cast (cast_params_for_compute honors this)
        self.fp32_param_names = frozenset(
            n for n in quant_scale_param_names(graph) if n in self._params
        )
        self._fn = compile_graph(graph)
        self.example_shape = tuple(int(s) for s in example_shape)
        self.dynamic_batch = self._probe_dynamic()
        logger.info(
            "ONNX graph model: %d nodes, %d param tensors, input '%s' %s, "
            "batch mode: %s, compute %s",
            len(graph.nodes), len(self._params), self.input_name,
            self.example_shape,
            "dynamic" if self.dynamic_batch else "vmap (static-batch export)",
            jnp.dtype(compute_dtype).name,
        )

    # -- engine surface -------------------------------------------------

    def init_params(self, key=None) -> Dict[str, np.ndarray]:
        """The graph's own weights — 'init' is a load, never random."""
        return dict(self._params)

    # -- internals --------------------------------------------------------

    def _probe_dynamic(self) -> bool:
        """True when the export is batch-polymorphic: an abstract trace at
        a batch the export wasn't traced at succeeds AND the leading output
        dim follows the batch (a batch-1-baked Reshape would either throw
        or collapse the batch)."""
        shape = (_PROBE_BATCH, *self.example_shape)
        try:
            outs = jax.eval_shape(
                self._run_direct,
                _abstract(self._params),
                jax.ShapeDtypeStruct(shape, jnp.float32),
            )
            return all(
                o.ndim >= 1 and o.shape[0] == _PROBE_BATCH for o in outs
            )
        except Exception:  # noqa: BLE001 — any trace failure = static export
            return False

    def _run_direct(self, params, x) -> List[jnp.ndarray]:
        with graph_compute_dtype(self.compute_dtype):
            return self._fn({self.input_name: x, **params})

    def run(self, params, x: jnp.ndarray) -> List[jnp.ndarray]:
        """Run the graph on a batched graph-layout input [B, ...]."""
        if self.dynamic_batch:
            return self._run_direct(params, x)

        def per_example(xi):
            return self._run_direct(params, xi[None])

        outs = jax.vmap(per_example)(x)
        # each out is [B, 1, ...] (the export's baked batch-1 dim)
        return [
            jnp.squeeze(o, axis=1) if o.ndim >= 2 and o.shape[1] == 1 else o
            for o in outs
        ]


class OnnxGraphYolo(OnnxGraphModel):
    """Detection adapter: graph emits the reference's prediction matrix
    (v8: ``[N, 4+nc, A]`` xywh + per-class scores; v5: ``[N, A, 5+nc]``
    with objectness). Decode follows reference detector.py:266-338 —
    with its v8 mis-decode fixed the same way models/yolo.py does (the
    reference multiplies class 0 in as objectness whenever cols > 5)."""

    def __init__(self, graph: OnnxGraph, model_type: str,
                 input_hw: Tuple[int, int], compute_dtype=jnp.float32):
        self.model_type = model_type
        self.input_hw = tuple(int(v) for v in input_hw)
        super().__init__(graph, (3, *input_hw), compute_dtype=compute_dtype)
        self._init_end2end()

    def _init_end2end(self) -> None:
        """End-to-end exports embed NMS in the graph (torch detection
        models exported with their postprocessing; the reference's ORT
        backend executes such files as-is). Supported shape: the NMS
        node's ``selected_indices`` is a graph output — the adapter then
        gathers final boxes/scores from the NMS node's own inputs on
        device and the engine skips its internal NMS (``end2end``
        attribute). Gather glue AFTER the NMS node would consume the
        padded static rows (onnx_jax._nms_padded_j) as if they were
        dense — rejected loudly instead of mis-serving."""
        self.end2end = False
        nms_nodes = [n for n in self.graph.nodes
                     if n.op_type == "NonMaxSuppression"]
        if not nms_nodes:
            return
        # ANY NMS output consumed by another node means post-NMS glue —
        # on TPU that glue would read _nms_padded_j's padded [-1,-1,-1]
        # rows as dense rows and mis-serve silently. Reject even when a
        # different NMS node in the same graph happens to be terminal.
        consumed = {i for n in self.graph.nodes for i in n.inputs if i}
        fed = [n for n in nms_nodes
               if any(o and o in consumed for o in n.outputs)]
        if fed:
            raise UnsupportedOnnxOp(
                "NonMaxSuppression output feeds further graph nodes — on "
                "TPU its output is statically padded, so post-NMS gather "
                "glue would read pad rows; re-export with "
                "selected_indices as a graph output (torchvision-style) "
                "to serve this file"
            )
        terminal = [n for n in nms_nodes
                    if n.outputs[0] in self.graph.outputs]
        if not terminal:
            raise UnsupportedOnnxOp(
                "NonMaxSuppression node is dead (output neither a graph "
                "output nor consumed) — re-export with selected_indices "
                "as a graph output (torchvision-style) to serve this file"
            )
        if len(terminal) > 1:
            raise UnsupportedOnnxOp(
                f"{len(terminal)} terminal NonMaxSuppression nodes — the "
                "adapter can serve exactly one detection head; re-export "
                "with a single NMS whose selected_indices is the graph "
                "output"
            )
        nms = terminal[0]
        self.end2end = True
        self._nms_center = int(nms.attrs.get("center_point_box", 0))
        # boxes / scores as the NMS node saw them — the export's own
        # decoded, pixel-space tensors
        self._fn_e2e = compile_graph(
            self.graph,
            outputs=[nms.outputs[0], nms.inputs[0], nms.inputs[1]],
        )
        logger.info(
            "ONNX graph model: end-to-end export (graph-embedded NMS, "
            "center_point_box=%d) — engine NMS will be skipped",
            self._nms_center,
        )

    def _apply_end2end(self, params, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """x: [N, H, W, 3] -> final per-image detections, padded to the
        graph's static NMS bound; pad rows carry conf 0. Boxes follow the
        torch export convention for center_point_box=0 (xyxy corners,
        either diagonal order — normalized here); center_point_box=1
        converts from [x_c, y_c, w, h]."""
        xg = jnp.transpose(x.astype(self.compute_dtype), (0, 3, 1, 2))

        def per_example(xi):
            with graph_compute_dtype(self.compute_dtype):
                sel, bxs, scs = self._fn_e2e(
                    {self.input_name: xi[None], **params}
                )
            box_i, cls_i = sel[:, 2], sel[:, 1]
            valid = box_i >= 0
            bi = jnp.maximum(box_i, 0)
            ci = jnp.maximum(cls_i, 0)
            b = jnp.asarray(bxs)[0].astype(jnp.float32)[bi]
            if self._nms_center:
                half = b[:, 2:] * 0.5
                b = jnp.concatenate([b[:, :2] - half, b[:, :2] + half],
                                    axis=-1)
            else:
                lo = jnp.minimum(b[:, :2], b[:, 2:])
                hi = jnp.maximum(b[:, :2], b[:, 2:])
                b = jnp.concatenate([lo, hi], axis=-1)
            s = jnp.asarray(scs)[0].astype(jnp.float32)[ci, bi]
            return (
                b * valid[:, None],
                s * valid,
                ci.astype(jnp.int32),
            )

        b, s, c = jax.vmap(per_example)(xg)
        return {"boxes_xyxy": b, "conf": s, "cls": c}

    def _expected_anchors(self) -> int:
        """Anchor count of a standard 3-level (stride 8/16/32) head at this
        input size — v5 predicts 3 anchors per cell, v8 one. Used to pick
        the [N, C, A] vs [N, A, C] orientation deterministically."""
        h, w = self.input_hw
        cells = sum((h // s) * (w // s) for s in (8, 16, 32))
        return 3 * cells if self.model_type == "yolov5" else cells

    def apply(self, params, x: jnp.ndarray, reduce_scores: bool = False,
              s2d: bool = False, pallas_stem: str = "off",
              ) -> Dict[str, jnp.ndarray]:
        """x: [N, H, W, 3] RGB in [0, 1] (the engines' device preprocess
        output). ``s2d`` / ``pallas_stem`` are native-backbone layout
        transforms — a foreign graph defines its own layout, so both are
        accepted and ignored."""
        if self.end2end:
            return self._apply_end2end(params, x)
        pred = self.run(params, jnp.transpose(
            x.astype(self.compute_dtype), (0, 3, 1, 2)
        ))[0].astype(jnp.float32)
        if pred.ndim != 3:
            raise UnsupportedOnnxOp(
                f"detection graph output must be [N, C, A] or [N, A, C], "
                f"got shape {pred.shape}"
            )
        # orientation: match the dim that equals the standard head's anchor
        # count at this input size (deterministic even when 4+nc exceeds A,
        # e.g. many-class models at small inputs); fall back to the
        # smaller-dim-is-channels heuristic for non-standard heads
        a_exp = self._expected_anchors()
        d1, d2 = pred.shape[1], pred.shape[2]
        if d2 == a_exp and d1 != a_exp:
            pred = jnp.transpose(pred, (0, 2, 1))  # [N, C, A] -> [N, A, C]
        elif d1 == a_exp and d2 != a_exp:
            pass  # already [N, A, C]
        elif d1 < d2:
            pred = jnp.transpose(pred, (0, 2, 1))
        xywh = pred[..., :4]
        if self.model_type == "yolov5":
            scores = pred[..., 4:5] * pred[..., 5:]
        else:
            scores = pred[..., 4:]
        half = xywh[..., 2:] * 0.5
        boxes = jnp.concatenate(
            [xywh[..., :2] - half, xywh[..., :2] + half], axis=-1
        )
        if reduce_scores:
            return {
                "boxes_xyxy": boxes,
                "conf": scores.max(axis=-1),
                "cls": scores.argmax(axis=-1).astype(jnp.int32),
            }
        return {"boxes_xyxy": boxes, "scores": scores}


class OnnxGraphTemporal(OnnxGraphModel):
    """Temporal adapter. Input layout per family follows the reference:
    CNN-LSTM / ConvGRU take ``[N, T, C, H, W]`` (temporal_detector.py:
    330-373), 3D-CNN / SlowFast take ``[N, C, T, H, W]`` (:554-593).
    Output: action logits ``[N, num_classes]``."""

    def __init__(self, graph: OnnxGraph, model_type: str, t_len: int,
                 input_hw: Tuple[int, int], compute_dtype=jnp.float32):
        self.channels_first_time = model_type in ("3d_cnn", "slow_fast")
        shape = (3, t_len, *input_hw) if self.channels_first_time \
            else (t_len, 3, *input_hw)
        super().__init__(graph, shape, compute_dtype=compute_dtype)

    def apply(self, params, clips: jnp.ndarray) -> jnp.ndarray:
        """clips: [N, T, H, W, 3] normalized RGB (the temporal engine's
        clip-head output layout)."""
        perm = (0, 4, 1, 2, 3) if self.channels_first_time \
            else (0, 1, 4, 2, 3)
        logits = self.run(
            params, jnp.transpose(clips.astype(self.compute_dtype), perm)
        )[0]
        return logits.astype(jnp.float32)


class OnnxGraphClassifier(OnnxGraphModel):
    """Classification adapter: ``[N, 3, H, W]`` ImageNet-normalized in,
    logits out (reference ResNet-ONNX contract, detector.py:1004-1134)."""

    def __init__(self, graph: OnnxGraph, input_hw: Tuple[int, int],
                 compute_dtype=jnp.float32):
        super().__init__(graph, (3, *input_hw), compute_dtype=compute_dtype)

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, H, W, 3] normalized RGB (the engine's classify head)."""
        logits = self.run(params, jnp.transpose(
            x.astype(self.compute_dtype), (0, 3, 1, 2)
        ))[0]
        return logits.astype(jnp.float32)


def try_load_graph_model(path: str, kind: str, **kwargs):
    """Factory the engines call AFTER the named-layout loaders fail:
    parse ``path``, build the ``kind`` adapter ('yolo' / 'temporal' /
    'classifier'), and abstractly probe it. Returns None (with the reason
    logged) when the file isn't a usable full graph — the engines then
    fall through to their existing random-init warning."""
    if not str(path).endswith(".onnx"):
        return None
    try:
        graph = read_onnx_model(str(path))
    except Exception as exc:  # noqa: BLE001 — unreadable/foreign file
        logger.warning("'%s' did not parse as ONNX: %s", path, exc)
        return None
    if not graph.nodes:
        return None  # weights-only container, nothing to execute
    cls = {
        "yolo": OnnxGraphYolo,
        "temporal": OnnxGraphTemporal,
        "classifier": OnnxGraphClassifier,
    }[kind]
    try:
        model = cls(graph, **kwargs)
        # probe the REAL serving call once (eval_shape: no FLOPs) so an
        # unsupported op surfaces here, not at the first live batch
        if kind == "temporal":
            t_len = kwargs["t_len"]
            hw = kwargs["input_hw"]
            probe = jax.ShapeDtypeStruct((1, t_len, *hw, 3), jnp.float32)
        else:
            hw = kwargs["input_hw"]
            probe = jax.ShapeDtypeStruct((1, *hw, 3), jnp.float32)
        jax.eval_shape(model.apply, _abstract(model.init_params()), probe)
        return model
    except UnsupportedOnnxOp as exc:
        logger.warning(
            "'%s' has a full ONNX graph but it is not servable: %s — "
            "falling back", path, exc,
        )
        return None
    except Exception:  # noqa: BLE001
        logger.exception(
            "'%s': ONNX graph compilation failed — falling back", path
        )
        return None


def load_graph_fallback(path: str, kind: str, **kwargs):
    """The engines' shared last-resort loader: when no named checkpoint
    layout matched, compile the file's own graph and serve it. Returns
    ``(model, params)`` or None (engines then fall through to their
    random-init warning). The log line is the documented serve-path
    marker — keep it stable."""
    gm = try_load_graph_model(path, kind, **kwargs)
    if gm is None:
        return None
    logger.info(
        "'%s' matches no known checkpoint layout — serving its ONNX "
        "graph directly (generic ONNX->JAX path)", path,
    )
    return gm, gm.init_params()

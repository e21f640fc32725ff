"""NumPy evaluator for torch-exported ONNX graphs — the fidelity oracle.

Round-3 verdict: the repo's checkpoint-fidelity gates compared the JAX
models against a torch *mirror* written by the same author — a shared
architectural misunderstanding would pass every gate. This executor breaks
that circularity: it topologically evaluates an ONNX **graph** (parsed by
``onnx_lite.read_onnx_model``) with plain numpy, so the reference output of
a fidelity test is torch's own export of the architecture (torch's
tracer + torch's operational semantics), with no code from this repo's model
definitions (``models/yolo.py``/``models/temporal.py``) or the test mirror
in the output path. The same executor runs *published* exports (e.g. an
Ultralytics ``yolov8n.onnx``) the moment one lands in the tree — the
backend-neutral interchange the reference itself trusts
(reference detector.py:484-609, its ONNX Runtime backend).

Scope: inference-mode CNN graphs as torch's TorchScript exporter emits them
(opset 10-17): explicit pads, static shapes after constant folding. This is
an oracle, not a serving path — clarity over speed; the JAX engines serve.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from .onnx_lite import OnnxGraph, OnnxNode, read_onnx_model

logger = logging.getLogger(__name__)

# ONNX TensorProto.DataType codes used by Cast / ConstantOfShape
_CAST_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 5: np.int16, 6: np.int32,
    7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


class UnsupportedOnnxOp(NotImplementedError):
    pass


def _conv2d(x, w, b, strides, pads, dilations, groups):
    """[N, C, H, W] x [M, C/g, kh, kw] -> [N, M, Ho, Wo] via windowed
    matmul. Explicit pads [h_begin, w_begin, h_end, w_end]."""
    n, c, _h, _w = x.shape
    m, cg, kh, kw = w.shape
    sh, sw = strides
    dh, dw = dilations
    pt, pl, pb, pr = pads
    if pt or pl or pb or pr:
        x = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    # effective receptive field with dilation, then subsample the taps
    ekh, ekw = (kh - 1) * dh + 1, (kw - 1) * dw + 1
    v = sliding_window_view(x, (ekh, ekw), axis=(2, 3))  # [N,C,Ho',Wo',ekh,ekw]
    v = v[:, :, ::sh, ::sw, ::dh, ::dw]  # stride + dilation taps
    ho, wo = v.shape[2], v.shape[3]
    out = np.empty((n, m, ho, wo), dtype=np.float32)
    mg = m // groups
    for g in range(groups):
        vg = v[:, g * cg : (g + 1) * cg]  # [N,cg,Ho,Wo,kh,kw]
        # [N,Ho,Wo,cg*kh*kw] @ [cg*kh*kw, mg]
        cols = vg.transpose(0, 2, 3, 1, 4, 5).reshape(n, ho, wo, cg * kh * kw)
        wg = w[g * mg : (g + 1) * mg].reshape(mg, cg * kh * kw).T
        out[:, g * mg : (g + 1) * mg] = (
            cols.astype(np.float32) @ wg.astype(np.float32)
        ).transpose(0, 3, 1, 2)
    if b is not None:
        out += b.reshape(1, m, 1, 1)
    return out


def _pool2d(x, kernel, strides, pads, ceil_mode, op):
    kh, kw = kernel
    sh, sw = strides
    pt, pl, pb, pr = pads
    ih, iw = x.shape[2], x.shape[3]
    eb = er = 0  # ceil-mode extension (beyond the explicit pads)
    if ceil_mode:
        # extend padding so the last partial window is included
        h, w = ih + pt + pb, iw + pl + pr
        eb = (-(h - kh) % sh) if (h - kh) % sh else 0
        er = (-(w - kw) % sw) if (w - kw) % sw else 0
    fill = -np.inf if op == "max" else 0.0
    if pt or pl or pb + eb or pr + er:
        x = np.pad(x, ((0, 0), (0, 0), (pt, pb + eb), (pl, pr + er)),
                   constant_values=fill)
    v = sliding_window_view(x, (kh, kw), axis=(2, 3))[:, :, ::sh, ::sw]
    if ceil_mode:
        # torch/ONNX-runtime drop rule: a ceil-extended window whose START
        # lies entirely in the end padding is not emitted — the last
        # window must start before in + pad_begin
        oh = sum(1 for i in range(v.shape[2]) if i * sh < ih + pt)
        ow = sum(1 for j in range(v.shape[3]) if j * sw < iw + pl)
        v = v[:, :, :oh, :ow]
    if op == "max":
        return v.max(axis=(-2, -1))
    # Average divisor (torch semantics, count_include_pad=True): the
    # EXPLICIT pads count toward the divisor, the ceil-mode extension does
    # NOT — torch divides each window by its count of positions inside the
    # explicitly-padded extent. A plain mean() over-counts the ceil
    # extension's zeros (verified vs torch AvgPool2d(ceil_mode=True)).
    if eb or er:
        ones = np.ones((1, 1, x.shape[2] - eb, x.shape[3] - er), x.dtype)
        ones = np.pad(ones, ((0, 0), (0, 0), (0, eb), (0, er)))
        cnt = sliding_window_view(ones, (kh, kw), axis=(2, 3))[:, :, ::sh, ::sw]
        cnt = cnt[:, :, : v.shape[2], : v.shape[3]]
        return v.sum(axis=(-2, -1)) / cnt.sum(axis=(-2, -1))
    return v.mean(axis=(-2, -1))


def _resize(x, scales, sizes, mode, coord_mode, nearest_mode):
    n, c, h, w = x.shape
    if sizes is not None and len(sizes):
        oh, ow = int(sizes[-2]), int(sizes[-1])
        sc_h, sc_w = oh / h, ow / w
    else:
        sc_h, sc_w = float(scales[-2]), float(scales[-1])
        oh, ow = int(np.floor(h * sc_h)), int(np.floor(w * sc_w))

    def src_coord(i, scale, in_len, out_len):
        i = i.astype(np.float64)
        if coord_mode == "asymmetric":
            return i / scale
        if coord_mode in ("pytorch_half_pixel", "half_pixel"):
            xs = (i + 0.5) / scale - 0.5
            if coord_mode == "pytorch_half_pixel" and out_len <= 1:
                return np.zeros_like(xs)
            return xs
        if coord_mode == "align_corners":
            if out_len == 1:
                return np.zeros_like(i)
            return i * (in_len - 1) / (out_len - 1)
        raise UnsupportedOnnxOp(f"Resize coord mode '{coord_mode}'")

    ys = src_coord(np.arange(oh), sc_h, h, oh)
    xs = src_coord(np.arange(ow), sc_w, w, ow)
    if mode == "nearest":
        if nearest_mode == "floor":
            yi, xi = np.floor(ys), np.floor(xs)
        elif nearest_mode == "ceil":
            yi, xi = np.ceil(ys), np.ceil(xs)
        elif nearest_mode == "round_prefer_ceil":
            yi, xi = np.floor(ys + 0.5), np.floor(xs + 0.5)
        else:  # round_prefer_floor (default)
            yi, xi = np.ceil(ys - 0.5), np.ceil(xs - 0.5)
        yi = np.clip(yi, 0, h - 1).astype(np.int64)
        xi = np.clip(xi, 0, w - 1).astype(np.int64)
        return x[:, :, yi][:, :, :, xi]
    if mode == "linear":
        y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)
        wx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)
        top = x[:, :, y0][:, :, :, x0] * (1 - wx) + x[:, :, y0][:, :, :, x1] * wx
        bot = x[:, :, y1][:, :, :, x0] * (1 - wx) + x[:, :, y1][:, :, :, x1] * wx
        return top * (1 - wy[:, None]) + bot * wy[:, None]
    raise UnsupportedOnnxOp(f"Resize mode '{mode}'")


def _slice_op(data, starts, ends, axes, steps):
    idx = [slice(None)] * data.ndim
    if axes is None:
        axes = list(range(len(starts)))
    if steps is None:
        steps = [1] * len(starts)
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = int(ax) % data.ndim
        idx[ax] = slice(int(st), int(en), int(sp))
    return data[tuple(idx)]


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def run_graph(
    graph_or_path,
    feeds: Dict[str, np.ndarray],
    outputs: Optional[Sequence[str]] = None,
) -> List[np.ndarray]:
    """Evaluate the graph on ``feeds`` ({input name: array}); returns the
    requested ``outputs`` (default: the graph's declared outputs) in order.

    Nodes are evaluated in dependency order (file order when already
    topological — the ONNX requirement; re-scheduled otherwise). Raises
    UnsupportedOnnxOp naming the first op outside the supported set.
    """
    g: OnnxGraph = (
        read_onnx_model(graph_or_path)
        if isinstance(graph_or_path, str) else graph_or_path
    )
    values: Dict[str, np.ndarray] = {"": None}  # "" = absent optional input
    values.update(g.initializers)
    for name, arr in feeds.items():
        values[name] = np.asarray(arr)
    missing = [i for i in g.inputs if i not in values]
    if missing:
        raise ValueError(f"missing graph inputs: {missing}")

    pending: List[OnnxNode] = list(g.nodes)
    while pending:
        progressed = False
        deferred: List[OnnxNode] = []
        for node in pending:
            if any(i and i not in values for i in node.inputs):
                deferred.append(node)
                continue
            _eval_node(node, values)
            progressed = True
        if not progressed:
            blocked = [n.op_type for n in deferred[:5]]
            raise ValueError(
                f"graph is not schedulable (cycle or missing producer); "
                f"blocked at {blocked}"
            )
        pending = deferred

    out_names = list(outputs) if outputs is not None else g.outputs
    missing = [o for o in out_names if o not in values]
    if missing:
        raise ValueError(f"graph did not produce outputs: {missing}")
    return [values[o] for o in out_names]


def _attr(node, name, default=None):
    return node.attrs.get(name, default)


def _eval_node(node: OnnxNode, values: Dict[str, np.ndarray]) -> None:
    op = node.op_type
    ins = [values[i] for i in node.inputs]

    def put(*results):
        for name, r in zip(node.outputs, results):
            values[name] = r

    if op == "Constant":
        v = _attr(node, "value")
        if v is None:
            for key, cast in (("value_float", np.float32),
                              ("value_int", np.int64)):
                if _attr(node, key) is not None:
                    v = np.asarray(_attr(node, key), dtype=cast)
                    break
            for key, cast in (("value_floats", np.float32),
                              ("value_ints", np.int64)):
                if _attr(node, key) is not None:
                    v = np.asarray(_attr(node, key), dtype=cast)
                    break
        put(np.asarray(v))
    elif op == "Conv":
        x, w = ins[0], ins[1]
        b = ins[2] if len(ins) > 2 else None
        if x.ndim != 4:
            raise UnsupportedOnnxOp(f"Conv over {x.ndim - 2}D input")
        if _attr(node, "auto_pad", "NOTSET") not in ("NOTSET", ""):
            raise UnsupportedOnnxOp("Conv auto_pad")
        put(_conv2d(
            x, w, b,
            _attr(node, "strides", [1, 1]),
            _attr(node, "pads", [0, 0, 0, 0]),
            _attr(node, "dilations", [1, 1]),
            int(_attr(node, "group", 1)),
        ))
    elif op == "Gemm":
        a, b = ins[0].astype(np.float32), ins[1].astype(np.float32)
        if int(_attr(node, "transA", 0)):
            a = a.T
        if int(_attr(node, "transB", 0)):
            b = b.T
        y = float(_attr(node, "alpha", 1.0)) * (a @ b)
        if len(ins) > 2 and ins[2] is not None:
            y = y + float(_attr(node, "beta", 1.0)) * ins[2]
        put(y)
    elif op == "MatMul":
        put(np.matmul(ins[0].astype(np.float32), ins[1].astype(np.float32)))
    elif op == "BatchNormalization":
        x, scale, bias, mean, var = ins[:5]
        eps = float(_attr(node, "epsilon", 1e-5))
        shape = (1, -1) + (1,) * (x.ndim - 2)
        put((x - mean.reshape(shape))
            / np.sqrt(var.reshape(shape) + eps)
            * scale.reshape(shape) + bias.reshape(shape))
    elif op in ("Relu", "LeakyRelu"):
        alpha = float(_attr(node, "alpha", 0.01)) if op == "LeakyRelu" else 0.0
        put(np.where(ins[0] > 0, ins[0], alpha * ins[0]))
    elif op == "Sigmoid":
        put(1.0 / (1.0 + np.exp(-ins[0].astype(np.float32))))
    elif op == "Tanh":
        put(np.tanh(ins[0].astype(np.float32)))
    elif op == "Softmax":
        put(_softmax(ins[0].astype(np.float32),
                     int(_attr(node, "axis", -1))))
    elif op == "Exp":
        put(np.exp(ins[0].astype(np.float32)))
    elif op == "Sqrt":
        put(np.sqrt(ins[0].astype(np.float32)))
    elif op == "Pow":
        put(np.power(ins[0].astype(np.float32), ins[1]))
    elif op == "Neg":
        put(-ins[0])
    elif op == "Clip":
        lo = ins[1] if len(ins) > 1 and ins[1] is not None else -np.inf
        hi = ins[2] if len(ins) > 2 and ins[2] is not None else np.inf
        lo = _attr(node, "min", lo)
        hi = _attr(node, "max", hi)
        put(np.clip(ins[0], lo, hi))
    elif op in ("Add", "Sub", "Mul", "Div", "Max", "Min"):
        a, b = ins[0], ins[1]
        if op == "Add":
            put(a + b)
        elif op == "Sub":
            put(a - b)
        elif op == "Mul":
            put(a * b)
        elif op == "Div":
            r = a / b
            if np.issubdtype(np.asarray(a).dtype, np.integer) and \
                    np.issubdtype(np.asarray(b).dtype, np.integer):
                r = (np.asarray(a) // np.asarray(b))
            put(r)
        elif op == "Max":
            put(np.maximum(a, b))
        else:
            put(np.minimum(a, b))
    elif op == "MaxPool":
        put(_pool2d(
            ins[0], _attr(node, "kernel_shape"),
            _attr(node, "strides", [1, 1]),
            _attr(node, "pads", [0, 0, 0, 0]),
            int(_attr(node, "ceil_mode", 0)), "max",
        ))
    elif op == "AveragePool":
        if int(_attr(node, "count_include_pad", 0)) == 0 and any(
            _attr(node, "pads", [0, 0, 0, 0])
        ):
            raise UnsupportedOnnxOp("AveragePool count_include_pad=0 w/ pads")
        put(_pool2d(
            ins[0], _attr(node, "kernel_shape"),
            _attr(node, "strides", [1, 1]),
            _attr(node, "pads", [0, 0, 0, 0]),
            int(_attr(node, "ceil_mode", 0)), "avg",
        ))
    elif op == "GlobalAveragePool":
        put(ins[0].mean(axis=tuple(range(2, ins[0].ndim)), keepdims=True))
    elif op == "Concat":
        put(np.concatenate(ins, axis=int(_attr(node, "axis"))))
    elif op == "Split":
        axis = int(_attr(node, "axis", 0))
        split = _attr(node, "split")
        if split is None and len(ins) > 1 and ins[1] is not None:
            split = [int(s) for s in ins[1]]
        if split is None:
            # ONNX uneven-split rule: ceil-sized chunks, last one smaller
            k = int(_attr(node, "num_outputs", len(node.outputs)))
            length = ins[0].shape[axis]
            base = -(-length // k)
            split = [base] * (k - 1) + [length - base * (k - 1)]
        offs = np.cumsum([0] + list(split))
        put(*[
            np.take(ins[0], range(int(offs[i]), int(offs[i + 1])), axis=axis)
            for i in range(len(split))
        ])
    elif op == "Slice":
        if "starts" in node.attrs:  # opset < 10
            put(_slice_op(ins[0], _attr(node, "starts"),
                          _attr(node, "ends"), _attr(node, "axes"), None))
        else:
            starts, ends = ins[1], ins[2]
            axes = ins[3] if len(ins) > 3 and ins[3] is not None else None
            steps = ins[4] if len(ins) > 4 and ins[4] is not None else None
            put(_slice_op(ins[0], starts, ends, axes, steps))
    elif op == "Reshape":
        shape = [int(s) for s in ins[1]]
        if int(_attr(node, "allowzero", 0)) == 0:
            shape = [
                ins[0].shape[i] if s == 0 else s for i, s in enumerate(shape)
            ]
        put(ins[0].reshape(shape))
    elif op == "Transpose":
        perm = _attr(node, "perm")
        put(np.transpose(ins[0], perm))
    elif op == "Flatten":
        ax = int(_attr(node, "axis", 1))
        put(ins[0].reshape(int(np.prod(ins[0].shape[:ax], initial=1)), -1))
    elif op == "Squeeze":
        axes = _attr(node, "axes")
        if axes is None and len(ins) > 1 and ins[1] is not None:
            axes = [int(a) for a in ins[1]]
        put(np.squeeze(ins[0], axis=tuple(int(a) for a in axes))
            if axes else np.squeeze(ins[0]))
    elif op == "Unsqueeze":
        axes = _attr(node, "axes")
        if axes is None:
            axes = [int(a) for a in ins[1]]
        out = np.asarray(ins[0])
        out_rank = out.ndim + len(axes)  # axes index the OUTPUT rank
        for a in sorted(int(a) % out_rank for a in axes):
            out = np.expand_dims(out, a)
        put(out)
    elif op == "Expand":
        put(np.broadcast_to(
            ins[0], np.broadcast_shapes(ins[0].shape,
                                        tuple(int(s) for s in ins[1]))
        ).copy())
    elif op == "Tile":
        put(np.tile(ins[0], [int(r) for r in ins[1]]))
    elif op == "Gather":
        put(np.take(ins[0], ins[1].astype(np.int64),
                    axis=int(_attr(node, "axis", 0))))
    elif op == "Shape":
        put(np.asarray(ins[0].shape, dtype=np.int64))
    elif op == "Cast":
        to = int(_attr(node, "to"))
        if to not in _CAST_DTYPES:
            raise UnsupportedOnnxOp(f"Cast to TensorProto dtype code {to}")
        put(ins[0].astype(_CAST_DTYPES[to]))
    elif op == "ConstantOfShape":
        v = _attr(node, "value")
        fill = v.reshape(-1)[0] if v is not None else np.float32(0)
        put(np.full([int(s) for s in ins[0]], fill))
    elif op == "Range":
        put(np.arange(ins[0].item(), ins[1].item(), ins[2].item(),
                      dtype=np.result_type(ins[0], ins[1], ins[2])))
    elif op == "Resize":
        roi = ins[1] if len(ins) > 1 else None  # noqa: F841 — tf_crop only
        scales = ins[2] if len(ins) > 2 and ins[2] is not None and np.size(ins[2]) else None
        sizes = ins[3] if len(ins) > 3 and ins[3] is not None else None
        put(_resize(
            ins[0], scales, sizes,
            _attr(node, "mode", "nearest"),
            _attr(node, "coordinate_transformation_mode", "half_pixel"),
            _attr(node, "nearest_mode", "round_prefer_floor"),
        ))
    elif op in ("ReduceMean", "ReduceSum", "ReduceMax"):
        axes = _attr(node, "axes")
        if axes is None and len(ins) > 1 and ins[1] is not None:
            axes = [int(a) for a in ins[1]]
        axes = tuple(axes) if axes else None
        keep = bool(int(_attr(node, "keepdims", 1)))
        fn = {"ReduceMean": np.mean, "ReduceSum": np.sum,
              "ReduceMax": np.max}[op]
        put(fn(ins[0], axis=axes, keepdims=keep))
    elif op in ("Identity", "Dropout"):
        put(ins[0])
    elif op == "Where":
        put(np.where(ins[0], ins[1], ins[2]))
    elif op == "Equal":
        put(ins[0] == ins[1])
    elif op == "Erf":
        # GELU building block; vectorized via math.erf (no scipy in image)
        import math

        put(np.vectorize(math.erf, otypes=[np.float32])(
            ins[0].astype(np.float32)))
    else:
        raise UnsupportedOnnxOp(
            f"op '{op}' (node '{node.name}') is outside the supported set"
        )

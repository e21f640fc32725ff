"""YOLOv8 (anchor-free, DFL) and YOLOv5 (anchor-based) in functional JAX.

Capability parity with the reference's YOLO paths across its five backends
(reference detector.py:106-869), built TPU-first:

  * NHWC activations / HWIO weights, bf16-friendly, BN folded at load;
  * the network is described by a declarative node graph whose indices match
    the published Ultralytics YAML layouts, so real checkpoints map onto the
    params pytree mechanically by layer index (see ``weights.py``);
  * ``apply`` returns *decoded* outputs — boxes in input-pixel xyxy plus
    per-class scores — so preprocess + forward + NMS fuse into one jit graph.

Decode semantics:
  * v8: DFL expectation over 16 bins -> ltrb cell distances -> xyxy * stride;
    scores = sigmoid(cls logits)  [the reference mis-decodes v8 by treating
    class 0 as objectness, detector.py:294-307 — deliberately fixed here].
  * v5: sigmoid everything; xy = (2p-0.5+grid)*stride, wh = (2p)^2*anchor;
    scores = objectness * class probs (reference contract).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    conv_act,
    conv2d,
    get_weight,
    init_conv,
    make_divisible,
    max_pool,
    upsample2x,
)

# ---------------------------------------------------------------------------
# Graph spec
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Node:
    kind: str  # conv | c2f | c3 | sppf | upsample | concat | detect_v8 | detect_v5
    src: Tuple[int, ...]  # input node indices; -1 = previous node
    c2: int = 0  # output channels (filled during build)
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    n: int = 1  # block repeats
    shortcut: bool = True


V8_SCALES = {  # depth, width, max_channels
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}

V5_SCALES = {  # depth, width
    "n": (0.33, 0.25),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.00, 1.00),
    "x": (1.33, 1.25),
}

V5_ANCHORS = (  # per level (P3, P4, P5), (w, h) pairs at input scale
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)

STRIDES = (8, 16, 32)
REG_MAX = 16


@dataclass
class YoloModel:
    """Static model description + pure apply function."""

    version: int  # 5 or 8
    size: str  # n/s/m/l/x
    nc: int
    nodes: List[Node]
    channels: List[int]  # output channels per node
    detect_ch: List[int] = field(default_factory=list)
    head_idx: int = -1
    act_int8: bool = False  # full int8 conv path (requires quantized params)
    # Fuse upsample->concat->block neck junctions: the block's leading 1x1
    # conv(s) commute with nearest-neighbour upsample, so
    # cv1(concat(up(x), y)) == silu(up(cv1_a(x)) + cv1_b(y) + bias) with the
    # weights split by input channel. The 2x-upsampled high-channel tensor
    # and the concat buffer never materialize in HBM (profiled 0.5+ ms/step
    # of pure broadcast/copy traffic at batch 128). Exact up to f32
    # accumulation order; disabled on the int8 path (per-conv activation
    # scales are calibrated on the unsplit input).
    fuse_neck: bool = True
    _fusions: Optional[Dict[int, str]] = None
    # Run the P1/P2 stage (nodes 0..3: stem conv, P2 conv, first block,
    # P3 conv) in space-to-depth layout so the 16/32-channel activations
    # fill TPU lanes (see models/s2d.py). Exact up to accumulation order;
    # engine enables it on single-chip TPU (config knob ``s2d_backbone``).
    s2d_backbone: bool = False
    _s2d_ok: Optional[bool] = None
    # Fused Pallas head decode (ops/pallas_decode.py): DFL softmax +
    # expectation + class max/argmax in one kernel instead of ~2 ms of
    # HBM-level XLA passes. "off" | "on" | "interpret" (tests); engine
    # enables on single-chip TPU. v8 reduce_scores path only.
    pallas_decode: str = "off"
    # Fused P1/P2 stem kernel (ops/pallas_stem.py): nodes 0+1 in one
    # Pallas call, P1 VMEM-resident. "off" | "on" | "interpret"; the
    # engine decides per compile bucket (config knob ``pallas_stem``).
    pallas_stem: str = "off"
    _pstem_ok: Optional[bool] = None

    # -- construction ------------------------------------------------------

    def init_params(self, key: jax.Array) -> Dict:
        keys = jax.random.split(key, len(self.nodes))
        layers = {}
        for i, node in enumerate(self.nodes):
            p = self._init_node(keys[i], i, node)
            if p:
                layers[str(i)] = p
        return {"layers": layers}

    def _cin(self, i: int, node: Node) -> List[int]:
        srcs = [s if s >= 0 else i - 1 for s in node.src]
        return [self.channels[s] if s >= 0 else 3 for s in srcs]

    def _init_node(self, key: jax.Array, i: int, node: Node) -> Dict:
        cins = self._cin(i, node)
        if node.kind == "conv":
            return init_conv(key, cins[0], node.c2, node.k)
        if node.kind == "c2f":
            return _init_c2f(key, cins[0], node.c2, node.n)
        if node.kind == "c3":
            return _init_c3(key, cins[0], node.c2, node.n)
        if node.kind == "sppf":
            return _init_sppf(key, cins[0], node.c2)
        if node.kind == "detect_v8":
            return _init_detect_v8(key, cins, self.nc)
        if node.kind == "detect_v5":
            return _init_detect_v5(key, cins, self.nc)
        return {}

    # -- forward -----------------------------------------------------------

    def apply(
        self, params: Dict, x: jnp.ndarray, reduce_scores: bool = False,
        s2d: Optional[bool] = None, pallas_stem: Optional[str] = None,
    ) -> Dict[str, jnp.ndarray]:
        """x: [N, H, W, 3] normalized RGB (NHWC). Returns decoded outputs:
        {"boxes_xyxy": [N, A, 4] input-pixel xyxy, "scores": [N, A, nc]}.

        ``reduce_scores=True`` returns {"boxes_xyxy", "conf": [N, A],
        "cls": [N, A]} instead: the per-anchor max/argmax is taken on the
        raw logits per level (sigmoid is monotonic, so
        max(sigmoid(l)) == sigmoid(max(l))), which keeps the full
        [N, A, nc] f32 score matrix out of HBM — the serving NMS only needs
        (conf, cls) anyway (engine detector.py; ~1 ms/step at batch 128).
        """
        layers = params["layers"]
        outs: List[Optional[jnp.ndarray]] = [None] * len(self.nodes)
        fus = self._neck_fusions() if self.fuse_neck and not self.act_int8 else {}
        start = 0
        use_s2d = self.s2d_backbone if s2d is None else s2d
        use_pstem = self.pallas_stem if pallas_stem is None else pallas_stem
        if (
            use_s2d
            and not self.act_int8
            and self._s2d_prefix_ok()
            and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0
        ):
            outs[3] = self._apply_s2d_prefix(layers, x)
            prev = outs[3]
            start = 4
        elif use_pstem != "off" and self._pallas_stem_ok(x.shape[1], x.shape[2]):
            from ..ops.pallas_stem import fused_stem_p1p2

            outs[1] = fused_stem_p1p2(
                x, layers["0"], layers["1"],
                interpret=use_pstem == "interpret",
            )
            prev = outs[1]
            start = 2
        else:
            prev = x
        for i, node in enumerate(self.nodes):
            if i < start:
                continue
            srcs = [s if s >= 0 else i - 1 for s in node.src]
            ins = [prev if s == i - 1 and i > 0 else outs[s] for s in srcs]
            if i == 0:
                ins = [x]
            p = layers.get(str(i), {})
            q = self.act_int8
            if node.kind == "conv":
                y = conv_act(p, ins[0], stride=node.s, padding=node.p, act_int8=q)
            elif node.kind == "c2f":
                y = _c2f(p, ins[0], node.n, node.shortcut, q)
            elif node.kind == "c3":
                y = _c3(p, ins[0], node.n, node.shortcut, q)
            elif node.kind == "sppf":
                y = _sppf(p, ins[0], node.k, q)
            elif node.kind == "upsample":
                # fused junction: defer the 2x upsample into the consumer
                # block's split 1x1 (see ``fuse_neck``)
                y = ("lazy_up", ins[0]) if i in fus else upsample2x(ins[0])
            elif node.kind == "concat":
                if i in fus:
                    y = ("lazy_up_concat", ins[0][1], ins[1])
                else:
                    y = jnp.concatenate(ins, axis=-1)
            elif node.kind == "detect_v8":
                return _detect_v8(
                    p, ins, self.nc, q, reduce_scores,
                    pallas_decode=self.pallas_decode,
                )
            elif node.kind == "detect_v5":
                return _detect_v5(p, ins, self.nc, reduce_scores)
            else:  # pragma: no cover
                raise ValueError(f"unknown node kind {node.kind}")
            outs[i] = y
            prev = y
        raise ValueError("graph has no detect head")  # pragma: no cover

    def _neck_fusions(self) -> Dict[int, str]:
        """Indices of fusable upsample->concat(up, skip)->c2f/c3 triples:
        the upsample and concat must each have exactly one consumer (the
        next node) so deferring them cannot change any other path."""
        if self._fusions is None:
            consumers: Dict[int, List[int]] = {}
            for j, nd in enumerate(self.nodes):
                for s in nd.src:
                    consumers.setdefault(s if s >= 0 else j - 1, []).append(j)
            fus: Dict[int, str] = {}
            for i, nd in enumerate(self.nodes):
                if nd.kind != "upsample" or i + 2 >= len(self.nodes):
                    continue
                cat, blk = self.nodes[i + 1], self.nodes[i + 2]
                if cat.kind != "concat" or len(cat.src) != 2:
                    continue
                if (cat.src[0] if cat.src[0] >= 0 else i) != i:
                    continue
                if blk.kind not in ("c2f", "c3"):
                    continue
                if [s if s >= 0 else i + 1 for s in blk.src] != [i + 1]:
                    continue
                if consumers.get(i) != [i + 1] or consumers.get(i + 1) != [i + 2]:
                    continue
                fus[i] = "up"
                fus[i + 1] = "cat"
            self._fusions = fus
        return self._fusions

    def _pallas_stem_ok(self, h: int, w: int) -> bool:
        """Nodes 0 and 1 must be the k3-s2 stem/P2 convs with single
        consumers (true for every published v5/v8 layout), the channel
        counts must tile the 128-lane dim, and the input geometry must
        tile the kernel's column groups / row strips
        (ops/pallas_stem.stem_geometry_ok). int8 params excluded — the
        kernel computes in bf16/f32."""
        if self.act_int8:
            return False
        if self._pstem_ok is None:
            ok = len(self.nodes) > 2
            if ok:
                n0, n1 = self.nodes[:2]
                ok = (
                    n0.kind == "conv" and n0.s == 2 and n0.k == 3
                    and n1.kind == "conv" and n1.s == 2 and n1.k == 3
                )
            if ok:
                consumers: Dict[int, List[int]] = {}
                for j, nd in enumerate(self.nodes):
                    for s in nd.src:
                        consumers.setdefault(s if s >= 0 else j - 1, []).append(j)
                ok = all(consumers.get(i) == [i + 1] for i in range(2))
            self._pstem_ok = ok
        if not self._pstem_ok:
            return False
        from ..ops.pallas_stem import stem_geometry_ok

        c0, c1 = self.channels[0], self.channels[1]
        return stem_geometry_ok(h, w, c0, c1)

    def _s2d_prefix_ok(self) -> bool:
        """The s2d prefix covers nodes 0..3 = conv(s2), conv(s2),
        c2f/c3(s1), conv(s2) with strictly chained single consumers —
        true for every published v5/v8 layout (Ultralytics yolov8.yaml /
        yolov5.yaml backbone rows 0-3)."""
        if self._s2d_ok is None:
            ok = len(self.nodes) > 4
            if ok:
                n0, n1, n2, n3 = self.nodes[:4]
                ok = (
                    n0.kind == "conv" and n0.s == 2
                    and n1.kind == "conv" and n1.s == 2 and n1.k == 3
                    and n2.kind in ("c2f", "c3")
                    and n3.kind == "conv" and n3.s == 2 and n3.k == 3
                )
            if ok:
                consumers: Dict[int, List[int]] = {}
                for j, nd in enumerate(self.nodes):
                    for s in nd.src:
                        consumers.setdefault(s if s >= 0 else j - 1, []).append(j)
                ok = all(consumers.get(i) == [i + 1] for i in range(3))
            self._s2d_ok = ok
        return self._s2d_ok

    def _apply_s2d_prefix(self, layers: Dict, x: jnp.ndarray) -> jnp.ndarray:
        """Nodes 0..3 in space-to-depth layout (see models/s2d.py): the
        sub-128-channel stage runs on full-density HBM tiles. Returns the
        node-3 (P3 conv) output in normal [N, H/8, W/8, C] layout."""
        from .s2d import c2f_s2d, c3_s2d, s2d_conv_act, space_to_depth

        n0, n2 = self.nodes[0], self.nodes[2]
        y = space_to_depth(x, 4)  # [N, H/4, W/4, 48]
        y = s2d_conv_act(layers["0"], y, fi=4, fo=2, stride=2, pad=n0.p)
        y = s2d_conv_act(layers["1"], y, fi=2, fo=2, stride=2)
        block = c2f_s2d if n2.kind == "c2f" else c3_s2d
        y = block(layers["2"], y, n2.n, n2.shortcut, 2)
        return s2d_conv_act(layers["3"], y, fi=2, fo=1, stride=2)

    def num_anchors(self, input_hw: Tuple[int, int]) -> int:
        h, w = input_hw
        total = sum((h // s) * (w // s) for s in STRIDES)
        return total * (3 if self.version == 5 else 1)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _init_bottleneck(key, c1, c2, k1, k2):
    k_a, k_b = jax.random.split(key)
    return {"cv1": init_conv(k_a, c1, c2, k1), "cv2": init_conv(k_b, c2, c2, k2)}


def _bottleneck(p, x, shortcut, q=False):
    y = conv_act(p["cv1"], x, act_int8=q)
    y = conv_act(p["cv2"], y, act_int8=q)
    return x + y if shortcut and x.shape[-1] == y.shape[-1] else y


def _init_c2f(key, c1, c2, n):
    c = int(c2 * 0.5)
    keys = jax.random.split(key, n + 2)
    return {
        "cv1": init_conv(keys[0], c1, 2 * c, 1),
        "cv2": init_conv(keys[1], (2 + n) * c, c2, 1),
        "m": [_init_bottleneck(keys[2 + j], c, c, 3, 3) for j in range(n)],
    }


def _split_up_conv1x1_act(p, x_small, y_skip):
    """silu(conv1x1(concat(up2x(x_small), y_skip))) without materializing
    the upsample or the concat: the 1x1 weights split by input channel and
    the nearest upsample moves past the conv (they commute)."""
    from .layers import conv2d, get_weight, silu, upsample2x

    w = get_weight(p, x_small.dtype)  # [1, 1, c_up + c_skip, cout]
    ch = x_small.shape[-1]
    a = conv2d(x_small, w[:, :, :ch], None)
    b = conv2d(y_skip, w[:, :, ch:], p.get("b"))
    return silu(upsample2x(a) + b)


def _c2f(p, x, n, shortcut, q=False):
    if isinstance(x, tuple):  # ("lazy_up_concat", x_small, y_skip)
        y = _split_up_conv1x1_act(p["cv1"], x[1], x[2])
    else:
        y = conv_act(p["cv1"], x, act_int8=q)
    a, b = jnp.split(y, 2, axis=-1)
    ys = [a, b]
    cur = b
    for j in range(n):
        cur = _bottleneck(p["m"][j], cur, shortcut, q)
        ys.append(cur)
    return conv_act(p["cv2"], jnp.concatenate(ys, axis=-1), act_int8=q)


def _init_c3(key, c1, c2, n):
    c = int(c2 * 0.5)
    keys = jax.random.split(key, n + 3)
    return {
        "cv1": init_conv(keys[0], c1, c, 1),
        "cv2": init_conv(keys[1], c1, c, 1),
        "cv3": init_conv(keys[2], 2 * c, c2, 1),
        "m": [_init_bottleneck(keys[3 + j], c, c, 1, 3) for j in range(n)],
    }


def _c3(p, x, n, shortcut, q=False):
    if isinstance(x, tuple):  # ("lazy_up_concat", x_small, y_skip)
        a = _split_up_conv1x1_act(p["cv1"], x[1], x[2])
        b = _split_up_conv1x1_act(p["cv2"], x[1], x[2])
    else:
        a = conv_act(p["cv1"], x, act_int8=q)
        b = conv_act(p["cv2"], x, act_int8=q)
    for j in range(n):
        a = _bottleneck(p["m"][j], a, shortcut, q)
    return conv_act(p["cv3"], jnp.concatenate([a, b], axis=-1), act_int8=q)


def _init_sppf(key, c1, c2):
    c = c1 // 2
    k_a, k_b = jax.random.split(key)
    return {"cv1": init_conv(k_a, c1, c, 1), "cv2": init_conv(k_b, c * 4, c2, 1)}


def _sppf(p, x, k, q=False):
    y = conv_act(p["cv1"], x, act_int8=q)
    p1 = max_pool(y, k)
    p2 = max_pool(p1, k)
    p3 = max_pool(p2, k)
    return conv_act(p["cv2"], jnp.concatenate([y, p1, p2, p3], axis=-1), act_int8=q)


# ---------------------------------------------------------------------------
# Detect heads
# ---------------------------------------------------------------------------


def _init_detect_v8(key, ch: Sequence[int], nc: int):
    c2 = max(16, ch[0] // 4, REG_MAX * 4)
    c3 = max(ch[0], min(nc, 100))
    keys = jax.random.split(key, 6 * len(ch))
    cv2, cv3 = [], []
    for i, c in enumerate(ch):
        k0, k1, k2, k3, k4, k5 = keys[6 * i : 6 * i + 6]
        box_out = init_conv(k2, c2, 4 * REG_MAX, 1)
        box_out["b"] = jnp.ones_like(box_out["b"])
        cls_out = init_conv(k5, c3, nc, 1)
        # start with ~0.01 class probability so random-init models are quiet
        cls_out["b"] = jnp.full_like(cls_out["b"], float(math.log(0.01 / 0.99)))
        cv2.append([init_conv(k0, c, c2, 3), init_conv(k1, c2, c2, 3), box_out])
        cv3.append([init_conv(k3, c, c3, 3), init_conv(k4, c3, c3, 3), cls_out])
    return {"cv2": cv2, "cv3": cv3}


def _detect_v8(p, feats: Sequence[jnp.ndarray], nc: int, q: bool = False,
               reduce_scores: bool = False,
               pallas_decode: str = "off") -> Dict[str, jnp.ndarray]:
    proj = jnp.arange(REG_MAX, dtype=jnp.float32)
    boxes_all, scores_all, conf_all, cls_all = [], [], [], []
    for lvl, x in enumerate(feats):
        stride = float(STRIDES[lvl])
        n, h, w, _ = x.shape
        box_f = x
        for j, blk in enumerate(p["cv2"][lvl]):
            box_f = conv_act(blk, box_f, act=j < 2, act_int8=q)
        cls_f = x
        for j, blk in enumerate(p["cv3"][lvl]):
            cls_f = conv_act(blk, cls_f, act=j < 2, act_int8=q)
        if reduce_scores and pallas_decode != "off":
            # fused DFL + class-reduce kernel (ops/pallas_decode.py)
            from ..ops.pallas_decode import decode_v8_level

            boxes, conf, cls_ids = decode_v8_level(
                box_f, cls_f, stride=stride,
                interpret=pallas_decode == "interpret",
            )
            boxes_all.append(boxes)
            conf_all.append(conf)
            cls_all.append(cls_ids)
            continue
        # DFL: [N, h, w, 4*16] -> expectation per side. Manual
        # numerator/denominator instead of softmax(x) @ proj: the division
        # happens on the [*, 4] sums, so the NORMALIZED [N, h, w, 4, 16]
        # f32 tensor (26 MB at P3, b=128) is never written and re-read for
        # the projection — XLA fuses exp into both reduces (~0.6 ms/step).
        xd = box_f.astype(jnp.float32).reshape(n, h, w, 4, REG_MAX)
        mx = jnp.max(xd, axis=-1, keepdims=True)
        e = jnp.exp(xd - mx)
        dist = jnp.sum(e * proj, axis=-1) / jnp.sum(e, axis=-1)  # (l, t, r, b)
        ax = jnp.arange(w, dtype=jnp.float32) + 0.5
        ay = jnp.arange(h, dtype=jnp.float32) + 0.5
        gx, gy = jnp.meshgrid(ax, ay)  # [h, w]
        x1 = (gx - dist[..., 0]) * stride
        y1 = (gy - dist[..., 1]) * stride
        x2 = (gx + dist[..., 2]) * stride
        y2 = (gy + dist[..., 3]) * stride
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(n, h * w, 4)
        boxes_all.append(boxes)
        if reduce_scores:
            # max/argmax on the raw (bf16) logits, sigmoid on [N, h*w] only
            conf_all.append(
                jax.nn.sigmoid(
                    jnp.max(cls_f, axis=-1).astype(jnp.float32)
                ).reshape(n, h * w)
            )
            cls_all.append(
                jnp.argmax(cls_f, axis=-1).astype(jnp.int32).reshape(n, h * w)
            )
        else:
            scores_all.append(
                jax.nn.sigmoid(cls_f.astype(jnp.float32)).reshape(n, h * w, nc)
            )
    out = {"boxes_xyxy": jnp.concatenate(boxes_all, axis=1)}
    if reduce_scores:
        out["conf"] = jnp.concatenate(conf_all, axis=1)
        out["cls"] = jnp.concatenate(cls_all, axis=1)
    else:
        out["scores"] = jnp.concatenate(scores_all, axis=1)
    return out


def _init_detect_v5(key, ch: Sequence[int], nc: int):
    na = len(V5_ANCHORS[0])
    keys = jax.random.split(key, len(ch))
    convs = []
    for i, c in enumerate(ch):
        cv = init_conv(keys[i], c, na * (nc + 5), 1)
        # objectness bias per published YOLOv5 init: log(8 / (640/s)^2)
        b = np.zeros((na, nc + 5), dtype=np.float32)
        b[:, 4] = math.log(8.0 / (640.0 / STRIDES[i]) ** 2)
        b[:, 5:] = math.log(0.6 / (nc - 0.999999)) if nc > 1 else 0.0
        cv["b"] = jnp.asarray(b.reshape(-1))
        convs.append(cv)
    # anchors live in the params tree so checkpoint-specific anchors (the
    # published .pt files register an `anchors` buffer) override the defaults
    return {"m": convs,
            "anchors": jnp.asarray(V5_ANCHORS, dtype=jnp.float32)}


def _detect_v5(p, feats: Sequence[jnp.ndarray], nc: int,
               reduce_scores: bool = False) -> Dict[str, jnp.ndarray]:
    na = len(V5_ANCHORS[0])
    anchor_table = p.get("anchors")
    if anchor_table is None:
        anchor_table = jnp.asarray(V5_ANCHORS, dtype=jnp.float32)
    boxes_all, scores_all, conf_all, cls_all = [], [], [], []
    for lvl, x in enumerate(feats):
        stride = float(STRIDES[lvl])
        n, h, w, _ = x.shape
        raw = conv2d(x, get_weight(p["m"][lvl], x.dtype), p["m"][lvl]["b"])
        raw = raw.reshape(n, h, w, na, nc + 5)
        y = jax.nn.sigmoid(raw[..., :5].astype(jnp.float32))
        gx, gy = jnp.meshgrid(
            jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32)
        )
        anchors = anchor_table[lvl].astype(jnp.float32)  # [na, 2] input px
        cx = (y[..., 0] * 2.0 - 0.5 + gx[..., None]) * stride
        cy = (y[..., 1] * 2.0 - 0.5 + gy[..., None]) * stride
        bw = (y[..., 2] * 2.0) ** 2 * anchors[None, None, None, :, 0]
        bh = (y[..., 3] * 2.0) ** 2 * anchors[None, None, None, :, 1]
        boxes = jnp.stack(
            [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
        ).reshape(n, h * w * na, 4)
        boxes_all.append(boxes)
        obj = y[..., 4]
        if reduce_scores:
            # conf = sigmoid(obj) * max(sigmoid(cls)); sigmoid is monotonic
            # so the max runs on the raw logits and the full [*, nc] f32
            # score tensor never materializes
            best = jnp.max(raw[..., 5:], axis=-1).astype(jnp.float32)
            conf_all.append((obj * jax.nn.sigmoid(best)).reshape(n, h * w * na))
            cls_all.append(
                jnp.argmax(raw[..., 5:], axis=-1).astype(jnp.int32)
                .reshape(n, h * w * na)
            )
        else:
            cls_probs = jax.nn.sigmoid(raw[..., 5:].astype(jnp.float32))
            scores_all.append(
                (cls_probs * obj[..., None]).reshape(n, h * w * na, nc)
            )
    out = {"boxes_xyxy": jnp.concatenate(boxes_all, axis=1)}
    if reduce_scores:
        out["conf"] = jnp.concatenate(conf_all, axis=1)
        out["cls"] = jnp.concatenate(cls_all, axis=1)
    else:
        out["scores"] = jnp.concatenate(scores_all, axis=1)
    return out


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


def _v8_graph(size: str, nc: int) -> Tuple[List[Node], List[int], List[int]]:
    d, wmul, maxc = V8_SCALES[size]

    def ch(c):
        return make_divisible(min(c, maxc) * wmul, 8)

    def rep(n):
        return max(round(n * d), 1)

    N = Node
    nodes = [
        N("conv", (-1,), ch(64), k=3, s=2),                      # 0 P1
        N("conv", (-1,), ch(128), k=3, s=2),                     # 1 P2
        N("c2f", (-1,), ch(128), n=rep(3), shortcut=True),       # 2
        N("conv", (-1,), ch(256), k=3, s=2),                     # 3 P3
        N("c2f", (-1,), ch(256), n=rep(6), shortcut=True),       # 4
        N("conv", (-1,), ch(512), k=3, s=2),                     # 5 P4
        N("c2f", (-1,), ch(512), n=rep(6), shortcut=True),       # 6
        N("conv", (-1,), ch(1024), k=3, s=2),                    # 7 P5
        N("c2f", (-1,), ch(1024), n=rep(3), shortcut=True),      # 8
        N("sppf", (-1,), ch(1024), k=5),                         # 9
        N("upsample", (-1,)),                                    # 10
        N("concat", (-1, 6)),                                    # 11
        N("c2f", (-1,), ch(512), n=rep(3), shortcut=False),      # 12
        N("upsample", (-1,)),                                    # 13
        N("concat", (-1, 4)),                                    # 14
        N("c2f", (-1,), ch(256), n=rep(3), shortcut=False),      # 15 P3 out
        N("conv", (-1,), ch(256), k=3, s=2),                     # 16
        N("concat", (-1, 12)),                                   # 17
        N("c2f", (-1,), ch(512), n=rep(3), shortcut=False),      # 18 P4 out
        N("conv", (-1,), ch(512), k=3, s=2),                     # 19
        N("concat", (-1, 9)),                                    # 20
        N("c2f", (-1,), ch(1024), n=rep(3), shortcut=False),     # 21 P5 out
        N("detect_v8", (15, 18, 21), nc),                        # 22
    ]
    return nodes, _infer_channels(nodes), [15, 18, 21]


def _v5_graph(size: str, nc: int) -> Tuple[List[Node], List[int], List[int]]:
    d, wmul = V5_SCALES[size]

    def ch(c):
        return make_divisible(c * wmul, 8)

    def rep(n):
        return max(round(n * d), 1)

    N = Node
    nodes = [
        N("conv", (-1,), ch(64), k=6, s=2, p=2),                 # 0 P1
        N("conv", (-1,), ch(128), k=3, s=2),                     # 1 P2
        N("c3", (-1,), ch(128), n=rep(3), shortcut=True),        # 2
        N("conv", (-1,), ch(256), k=3, s=2),                     # 3 P3
        N("c3", (-1,), ch(256), n=rep(6), shortcut=True),        # 4
        N("conv", (-1,), ch(512), k=3, s=2),                     # 5 P4
        N("c3", (-1,), ch(512), n=rep(9), shortcut=True),        # 6
        N("conv", (-1,), ch(1024), k=3, s=2),                    # 7 P5
        N("c3", (-1,), ch(1024), n=rep(3), shortcut=True),       # 8
        N("sppf", (-1,), ch(1024), k=5),                         # 9
        N("conv", (-1,), ch(512), k=1, s=1),                     # 10
        N("upsample", (-1,)),                                    # 11
        N("concat", (-1, 6)),                                    # 12
        N("c3", (-1,), ch(512), n=rep(3), shortcut=False),       # 13
        N("conv", (-1,), ch(256), k=1, s=1),                     # 14
        N("upsample", (-1,)),                                    # 15
        N("concat", (-1, 4)),                                    # 16
        N("c3", (-1,), ch(256), n=rep(3), shortcut=False),       # 17 P3 out
        N("conv", (-1,), ch(256), k=3, s=2),                     # 18
        N("concat", (-1, 14)),                                   # 19
        N("c3", (-1,), ch(512), n=rep(3), shortcut=False),       # 20 P4 out
        N("conv", (-1,), ch(512), k=3, s=2),                     # 21
        N("concat", (-1, 10)),                                   # 22
        N("c3", (-1,), ch(1024), n=rep(3), shortcut=False),      # 23 P5 out
        N("detect_v5", (17, 20, 23), nc),                        # 24
    ]
    return nodes, _infer_channels(nodes), [17, 20, 23]


def _infer_channels(nodes: List[Node]) -> List[int]:
    channels: List[int] = []
    for i, node in enumerate(nodes):
        srcs = [s if s >= 0 else i - 1 for s in node.src]
        if node.kind == "concat":
            channels.append(sum(channels[s] if s >= 0 else 3 for s in srcs))
        elif node.kind == "upsample":
            channels.append(channels[srcs[0]] if srcs[0] >= 0 else 3)
        elif node.kind.startswith("detect"):
            channels.append(0)
        else:
            channels.append(node.c2)
    return channels


def build_yolo(model_type: str = "yolov8", size: str = "n", nc: int = 80) -> YoloModel:
    """Build a YOLO model description. ``model_type`` in {yolov5, yolov8}."""
    if model_type == "yolov8":
        nodes, channels, head_srcs = _v8_graph(size, nc)
        version = 8
    elif model_type == "yolov5":
        nodes, channels, head_srcs = _v5_graph(size, nc)
        version = 5
    else:
        raise ValueError(f"unsupported YOLO model_type: {model_type}")
    return YoloModel(
        version=version,
        size=size,
        nc=nc,
        nodes=nodes,
        channels=channels,
        detect_ch=[channels[i] for i in head_srcs],
        head_idx=len(nodes) - 1,
    )


def size_from_model_path(model_path: str, default: str = "n") -> str:
    """Infer n/s/m/l/x from names like 'yolov8s.pt' (engine convenience)."""
    stem = model_path.rsplit("/", 1)[-1].lower()
    for tag in ("yolov8", "yolov5"):
        j = stem.find(tag)
        if j >= 0 and len(stem) > j + len(tag):
            c = stem[j + len(tag)]
            if c in "nsmlx":
                return c
    return default

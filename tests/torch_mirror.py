"""Test-only torch mirror of the published YOLO module layout.

Purpose: produce state dicts with *Ultralytics key naming* plus reference
forward outputs, so the JAX models + checkpoint loader can be verified for
output fidelity without real checkpoint files (no network egress in CI).
Randomized BN running stats make the BN-folding path meaningful.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn

REG_MAX = 16
STRIDES = (8, 16, 32)
V5_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


def autopad(k, p=None):
    return k // 2 if p is None else p


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k, p), bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, k=(3, 3)):
        super().__init__()
        self.cv1 = Conv(c1, c2, k[0])
        self.cv2 = Conv(c2, c2, k[1])
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = int(c2 * 0.5)
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            Bottleneck(self.c, self.c, shortcut, k=(3, 3)) for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class C3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        c_ = int(c2 * 0.5)
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c1, c_, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut, k=(1, 3)) for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class DetectV8(nn.Module):
    def __init__(self, nc, ch):
        super().__init__()
        self.nc = nc
        c2 = max(16, ch[0] // 4, REG_MAX * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(c, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * REG_MAX, 1))
            for c in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(Conv(c, c3, 3), Conv(c3, c3, 3), nn.Conv2d(c3, nc, 1))
            for c in ch
        )

    def forward(self, feats):
        boxes_all, scores_all = [], []
        proj = torch.arange(REG_MAX, dtype=torch.float32)
        for lvl, x in enumerate(feats):
            s = float(STRIDES[lvl])
            n, _, h, w = x.shape
            box = self.cv2[lvl](x)  # [N, 64, h, w]
            cls = self.cv3[lvl](x)  # [N, nc, h, w]
            dist = box.view(n, 4, REG_MAX, h, w).permute(0, 3, 4, 1, 2)
            dist = dist.softmax(-1) @ proj  # [N, h, w, 4]
            ax = torch.arange(w, dtype=torch.float32) + 0.5
            ay = torch.arange(h, dtype=torch.float32) + 0.5
            gy, gx = torch.meshgrid(ay, ax, indexing="ij")
            x1 = (gx - dist[..., 0]) * s
            y1 = (gy - dist[..., 1]) * s
            x2 = (gx + dist[..., 2]) * s
            y2 = (gy + dist[..., 3]) * s
            boxes = torch.stack([x1, y1, x2, y2], -1).reshape(n, h * w, 4)
            scores = cls.sigmoid().permute(0, 2, 3, 1).reshape(n, h * w, self.nc)
            boxes_all.append(boxes)
            scores_all.append(scores)
        return torch.cat(boxes_all, 1), torch.cat(scores_all, 1)


class DetectV5(nn.Module):
    def __init__(self, nc, ch):
        super().__init__()
        self.nc = nc
        self.na = 3
        self.m = nn.ModuleList(nn.Conv2d(c, self.na * (nc + 5), 1) for c in ch)

    def forward(self, feats):
        boxes_all, scores_all = [], []
        for lvl, x in enumerate(feats):
            s = float(STRIDES[lvl])
            n, _, h, w = x.shape
            y = self.m[lvl](x)
            # NCHW -> [N, h, w, na, 5+nc] matching the JAX layout (channel-last
            # reshape: channel dim ordered (na, 5+nc))
            y = y.permute(0, 2, 3, 1).reshape(n, h, w, self.na, self.nc + 5).sigmoid()
            gy, gx = torch.meshgrid(
                torch.arange(h, dtype=torch.float32),
                torch.arange(w, dtype=torch.float32),
                indexing="ij",
            )
            anchors = torch.tensor(V5_ANCHORS[lvl], dtype=torch.float32)
            cx = (y[..., 0] * 2 - 0.5 + gx[..., None]) * s
            cy = (y[..., 1] * 2 - 0.5 + gy[..., None]) * s
            bw = (y[..., 2] * 2) ** 2 * anchors[None, None, None, :, 0]
            bh = (y[..., 3] * 2) ** 2 * anchors[None, None, None, :, 1]
            boxes = torch.stack(
                [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1
            ).reshape(n, h * w * self.na, 4)
            scores = (y[..., 5:] * y[..., 4:5]).reshape(n, h * w * self.na, self.nc)
            boxes_all.append(boxes)
            scores_all.append(scores)
        return torch.cat(boxes_all, 1), torch.cat(scores_all, 1)


class TorchYoloMirror(nn.Module):
    """Assembles the same node graph as realtime_analytics_tpu.models.yolo."""

    def __init__(self, jax_model):
        super().__init__()
        self.nodes = jax_model.nodes
        self.version = jax_model.version
        mods = {}
        for i, node in enumerate(self.nodes):
            srcs = [s if s >= 0 else i - 1 for s in node.src]
            cins = [jax_model.channels[s] if s >= 0 else 3 for s in srcs]
            if node.kind == "conv":
                mods[str(i)] = Conv(cins[0], node.c2, node.k, node.s, node.p)
            elif node.kind == "c2f":
                mods[str(i)] = C2f(cins[0], node.c2, node.n, node.shortcut)
            elif node.kind == "c3":
                mods[str(i)] = C3(cins[0], node.c2, node.n, node.shortcut)
            elif node.kind == "sppf":
                mods[str(i)] = SPPF(cins[0], node.c2, node.k)
            elif node.kind == "upsample":
                mods[str(i)] = nn.Upsample(scale_factor=2, mode="nearest")
            elif node.kind == "detect_v8":
                mods[str(i)] = DetectV8(jax_model.nc, cins)
            elif node.kind == "detect_v5":
                mods[str(i)] = DetectV5(jax_model.nc, cins)
        self.model = nn.ModuleDict(mods)
        self._randomize_bn()

    def _randomize_bn(self):
        g = torch.Generator().manual_seed(7)
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                with torch.no_grad():
                    m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.2)
                    m.running_var.copy_(
                        torch.rand(m.num_features, generator=g) * 0.5 + 0.75
                    )
                    m.weight.copy_(torch.rand(m.num_features, generator=g) * 0.5 + 0.75)
                    m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)

    @torch.no_grad()
    def forward(self, x):  # x: [N, 3, H, W]
        outs = [None] * len(self.nodes)
        prev = x
        for i, node in enumerate(self.nodes):
            srcs = [s if s >= 0 else i - 1 for s in node.src]
            ins = [prev if (s == i - 1 and i > 0) else outs[s] for s in srcs]
            if i == 0:
                ins = [x]
            if node.kind == "concat":
                y = torch.cat(ins, 1)
            elif node.kind.startswith("detect"):
                return self.model[str(i)](ins)
            else:
                y = self.model[str(i)](ins[0])
            outs[i] = y
            prev = y
        raise RuntimeError("no detect head")

    def ultralytics_state_dict(self):
        """state_dict with keys renamed to the Ultralytics 'model.N.x' layout."""
        return {f"model.{k}": v for k, v in self.model.state_dict().items()}

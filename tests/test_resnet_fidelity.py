"""ResNet checkpoint fidelity: JAX model + torchvision-layout loader vs a
torch mirror (BN folding correctness on the classification path)."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from realtime_analytics_tpu.models.resnet import build_resnet
from realtime_analytics_tpu.models.weights import resnet_params_from_state_dict


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != width:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width, 1, stride, bias=False),
                nn.BatchNorm2d(width),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class TorchResNet18(nn.Module):
    """torchvision-naming resnet18 mirror (state_dict-compatible keys)."""

    def __init__(self, num_classes):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, (width, blocks) in enumerate([(64, 2), (128, 2), (256, 2), (512, 2)]):
            stride = 1 if i == 0 else 2
            layer = nn.Sequential(
                BasicBlock(cin, width, stride), BasicBlock(width, width, 1)
            )
            setattr(self, f"layer{i + 1}", layer)
            cin = width
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, num_classes)
        self._randomize_bn()

    def _randomize_bn(self):
        g = torch.Generator().manual_seed(11)
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                with torch.no_grad():
                    m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
                    m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                    m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                    m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)

    @torch.no_grad()
    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            y = getattr(self, f"layer{i}")(y)
        return self.fc(self.avgpool(y).flatten(1))


def test_resnet18_matches_torch_mirror():
    torch.manual_seed(6)
    tm = TorchResNet18(num_classes=37).eval()
    jm = build_resnet("resnet18", num_classes=37)
    params = resnet_params_from_state_dict(jm, tm.state_dict())

    x = torch.rand(2, 3, 96, 96)
    t_logits = tm(x).numpy()
    j_logits = np.asarray(jm.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=1e-3)

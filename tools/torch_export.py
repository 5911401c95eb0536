"""Export torch models to ONNX without the `onnx` pip package.

torch's torchscript exporter only needs `onnx.load_model_from_string` (to scan
for onnxscript functions); we back that with dipoorlet_tpu's own codec via a
stub module installed into sys.modules.

Also defines the benchmark model zoo (ResNet-18/50, MobileNet-v2,
RegNet-600M-style) hand-written in torch since torchvision is unavailable.
These mirror the model families named in BASELINE.json configs.
"""
from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn


def _install_onnx_stub():
    if "onnx" in sys.modules:
        return
    from dipoorlet_tpu import onnx_ir

    stub = types.ModuleType("onnx")

    def load_model_from_string(data):
        m = onnx_ir.load_model_from_string(data)

        # torch re-serializes via SerializeToString if functions were added
        def _serialize():
            return m.encode()

        m.SerializeToString = _serialize
        return m

    stub.load_model_from_string = load_model_from_string
    sys.modules["onnx"] = stub


def export(model: nn.Module, example: torch.Tensor, path: str, opset: int = 13):
    _install_onnx_stub()
    model.eval()
    with torch.no_grad():
        torch.onnx.export(model, (example,), path, opset_version=opset, dynamo=False,
                          input_names=["input"], output_names=["output"])
    return path


# ---------------------------------------------------------------------------
# Model zoo (hand-written; torchvision is not available in this image)
# ---------------------------------------------------------------------------
class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idt)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000, width=64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.cin = width
        stages = []
        for i, n in enumerate(layers):
            w = width * (2 ** i)
            stride = 1 if i == 0 else 2
            blocks = []
            for j in range(n):
                if block is BasicBlock:
                    blocks.append(BasicBlock(self.cin, w, stride if j == 0 else 1))
                    self.cin = w
                else:
                    blocks.append(Bottleneck(self.cin, w, stride if j == 0 else 1))
                    self.cin = w * 4
            stages.append(nn.Sequential(*blocks))
        self.layers = nn.Sequential(*stages)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(self.cin, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layers(x)
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet18(num_classes=1000):
    return ResNet(BasicBlock, [2, 2, 2, 2], num_classes)


def resnet50(num_classes=1000):
    return ResNet(Bottleneck, [3, 4, 6, 3], num_classes)


class InvertedResidual(nn.Module):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = int(round(cin * expand))
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand != 1:
            layers += [nn.Conv2d(cin, hidden, 1, bias=False), nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True)]
        layers += [
            nn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden, bias=False),
            nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True),
            nn.Conv2d(hidden, cout, 1, bias=False), nn.BatchNorm2d(cout),
        ]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


def mobilenet_v2(num_classes=1000):
    cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
    layers = [nn.Conv2d(3, 32, 3, 2, 1, bias=False), nn.BatchNorm2d(32), nn.ReLU6(inplace=True)]
    cin = 32
    for t, c, n, s in cfg:
        for i in range(n):
            layers.append(InvertedResidual(cin, c, s if i == 0 else 1, t))
            cin = c
    layers += [nn.Conv2d(cin, 1280, 1, bias=False), nn.BatchNorm2d(1280), nn.ReLU6(inplace=True),
               nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(1280, num_classes)]
    return nn.Sequential(*layers)


class RegBlock(nn.Module):
    """X-block (group conv bottleneck) as in RegNetX."""

    def __init__(self, cin, cout, stride, group_w):
        super().__init__()
        groups = cout // group_w
        self.conv1 = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, stride, 1, groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.conv3 = nn.Conv2d(cout, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


def regnet_600m(num_classes=1000):
    """RegNetX-600MF-like: widths/depths from the published config."""
    widths = [48, 96, 240, 528]
    depths = [1, 3, 5, 7]
    group_w = 24
    layers = [nn.Conv2d(3, 32, 3, 2, 1, bias=False), nn.BatchNorm2d(32), nn.ReLU(inplace=True)]
    cin = 32
    for w, d in zip(widths, depths):
        for i in range(d):
            layers.append(RegBlock(cin, w, 2 if i == 0 else 1, group_w))
            cin = w
    layers += [nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(cin, num_classes)]
    return nn.Sequential(*layers)


MODEL_ZOO = {
    "resnet18": resnet18,
    "resnet50": resnet50,
    "mobilenet_v2": mobilenet_v2,
    "regnet_600m": regnet_600m,
}


def export_zoo_model(name: str, path: str, image_size: int = 224, num_classes: int = 1000, seed: int = 0):
    torch.manual_seed(seed)
    model = MODEL_ZOO[name](num_classes=num_classes)
    example = torch.randn(1, 3, image_size, image_size)
    return export(model, example, path)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("name", choices=sorted(MODEL_ZOO))
    p.add_argument("path")
    p.add_argument("--size", type=int, default=224)
    a = p.parse_args()
    export_zoo_model(a.name, a.path, a.size)
    print(f"exported {a.name} -> {a.path}")

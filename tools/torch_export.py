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
    # a well-formed spec so importlib.util.find_spec("onnx") (e.g. from
    # transformers' optional-dependency probing) doesn't raise
    import importlib.machinery
    stub.__spec__ = importlib.machinery.ModuleSpec("onnx", loader=None)
    stub.__version__ = "0.0.0-dipoorlet-stub"

    def load_model_from_string(data):
        m = onnx_ir.load_model_from_string(data)

        # torch re-serializes via SerializeToString if functions were added
        def _serialize():
            return m.encode()

        m.SerializeToString = _serialize
        return m

    stub.load_model_from_string = load_model_from_string
    sys.modules["onnx"] = stub


def export(model: nn.Module, example, path: str, opset: int = 13,
           output_names=None, input_names=None):
    """example: one tensor or a tuple of tensors (multi-input models —
    e.g. encoder-decoder ids); input names default to 'input' /
    'input_<i>'."""
    _install_onnx_stub()
    model.eval()
    ex_tuple = example if isinstance(example, tuple) else (example,)
    if input_names is None:
        input_names = (["input"] if len(ex_tuple) == 1
                       else [f"input_{i}" for i in range(len(ex_tuple))])
    with torch.no_grad():
        torch.onnx.export(model, ex_tuple, path, opset_version=opset, dynamo=False,
                          input_names=list(input_names),
                          output_names=list(output_names or ["output"]))
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


class UNetBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.net = nn.Sequential(
            nn.Conv2d(cin, cout, 3, 1, 1, bias=False), nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, 1, 1, bias=False), nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

    def forward(self, x):
        return self.net(x)


class UNetTiny(nn.Module):
    """Encoder-decoder with ConvTranspose ups and skip Concats — the model
    shape behind the reference's `--model_type unet` path (dipoorlet's
    transformer/unet branch, /root/reference/dipoorlet/__main__.py:80-89)."""

    def __init__(self, num_classes=8, width=16):
        super().__init__()
        w = width
        self.enc1 = UNetBlock(3, w)
        self.enc2 = UNetBlock(w, w * 2)
        self.enc3 = UNetBlock(w * 2, w * 4)
        self.pool = nn.MaxPool2d(2)
        self.up2 = nn.ConvTranspose2d(w * 4, w * 2, 2, 2)
        self.dec2 = UNetBlock(w * 4, w * 2)
        self.up1 = nn.ConvTranspose2d(w * 2, w, 2, 2)
        self.dec1 = UNetBlock(w * 2, w)
        self.head = nn.Conv2d(w, num_classes, 1)

    def forward(self, x):
        e1 = self.enc1(x)
        e2 = self.enc2(self.pool(e1))
        e3 = self.enc3(self.pool(e2))
        d2 = self.dec2(torch.cat([self.up2(e3), e2], 1))
        d1 = self.dec1(torch.cat([self.up1(d2), e1], 1))
        return self.head(d1)


def unet_tiny(num_classes=8):
    return UNetTiny(num_classes=num_classes)


def _silu(x):
    # explicit decomposition: exports as Sigmoid+Mul at opset 13 regardless
    # of the exporter's aten::silu symbolic support
    return x * torch.sigmoid(x)


class GNBlock(nn.Module):
    """GroupNorm/SiLU residual conv block (diffusion-UNet style)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(8, cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = nn.GroupNorm(8, cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        self.skip = nn.Conv2d(cin, cout, 1) if cin != cout else nn.Identity()

    def forward(self, x):
        h = self.conv1(_silu(self.norm1(x)))
        h = self.conv2(_silu(self.norm2(h)))
        return h + self.skip(x)


class UNetDiffusionTiny(nn.Module):
    """GroupNorm/SiLU/Resize(nearest)/skip-concat topology — the modern
    diffusion-UNet shape behind the reference's `--model_type unet` branch
    (/root/reference/dipoorlet/__main__.py:80-89).  At opset 13 GroupNorm
    exports as the Reshape/InstanceNormalization decomposition, SiLU as
    Sigmoid+Mul, and the nearest upsample as Resize — exercising a
    different op mix than UNetTiny's BN/ReLU/ConvTranspose."""

    def __init__(self, width=16):
        super().__init__()
        w = width
        self.stem = nn.Conv2d(3, w, 3, 1, 1)
        self.down1 = GNBlock(w, w)
        self.down2 = GNBlock(w, w * 2)
        self.down3 = GNBlock(w * 2, w * 4)
        self.pool = nn.AvgPool2d(2)
        self.mid = GNBlock(w * 4, w * 4)
        self.up = nn.Upsample(scale_factor=2, mode="nearest")
        self.dec2 = GNBlock(w * 4 + w * 2, w * 2)
        self.dec1 = GNBlock(w * 2 + w, w)
        self.out_norm = nn.GroupNorm(8, w)
        self.head = nn.Conv2d(w, 3, 3, 1, 1)

    def forward(self, x):
        s1 = self.down1(self.stem(x))
        s2 = self.down2(self.pool(s1))
        h = self.mid(self.down3(self.pool(s2)))
        h = self.dec2(torch.cat([self.up(h), s2], 1))
        h = self.dec1(torch.cat([self.up(h), s1], 1))
        return self.head(_silu(self.out_norm(h)))


def unet_diffusion_tiny():
    return UNetDiffusionTiny()


class YoloTiny(nn.Module):
    """Two-scale anchor-style detector: strided backbone, nearest-Upsample
    FPN with Concat, raw conv heads at strides 16/32.  Exercises the
    Resize/Concat/multi-output quantization paths (Concat range propagation
    in the rv emitter, multi-output profiling)."""

    def __init__(self, num_classes=4, width=16, anchors=3):
        super().__init__()

        def cbl(cin, cout, k=3, s=1):
            return nn.Sequential(nn.Conv2d(cin, cout, k, s, k // 2, bias=False),
                                 nn.BatchNorm2d(cout), nn.LeakyReLU(0.1, inplace=True))

        w = width
        self.stem = cbl(3, w, 3, 2)                       # /2
        self.s4 = nn.Sequential(cbl(w, w * 2, 3, 2), cbl(w * 2, w * 2))      # /4
        self.s8 = nn.Sequential(cbl(w * 2, w * 4, 3, 2), cbl(w * 4, w * 4))  # /8
        self.s16 = nn.Sequential(cbl(w * 4, w * 8, 3, 2), cbl(w * 8, w * 8))  # /16
        self.s32 = nn.Sequential(cbl(w * 8, w * 16, 3, 2), cbl(w * 16, w * 16))  # /32
        self.lat32 = cbl(w * 16, w * 4, 1)
        self.up = nn.Upsample(scale_factor=2, mode="nearest")
        self.fuse16 = cbl(w * 12, w * 8)
        cout = anchors * (5 + num_classes)
        self.head16 = nn.Conv2d(w * 8, cout, 1)
        self.head32 = nn.Conv2d(w * 16, cout, 1)

    def forward(self, x):
        c16 = self.s16(self.s8(self.s4(self.stem(x))))
        c32 = self.s32(c16)
        p16 = self.fuse16(torch.cat([self.up(self.lat32(c32)), c16], 1))
        return self.head16(p16), self.head32(c32)


def yolo_tiny(num_classes=4):
    return YoloTiny(num_classes=num_classes)


class ViTBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.ln1 = nn.LayerNorm(dim)
        self.ln2 = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.mlp = nn.Sequential(nn.Linear(dim, dim * mlp_ratio), nn.GELU(),
                                 nn.Linear(dim * mlp_ratio, dim))
        self.heads = heads
        self.scale = (dim // heads) ** -0.5

    def forward(self, x):
        B, N, D = x.shape
        h = self.heads
        qkv = self.qkv(self.ln1(x)).reshape(B, N, 3, h, D // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = torch.softmax(q @ k.transpose(-2, -1) * self.scale, dim=-1)
        x = x + self.proj((att @ v).transpose(1, 2).reshape(B, N, D))
        return x + self.mlp(self.ln2(x))


class ViTTiny(nn.Module):
    """Patch-conv ViT classifier (LayerNorm/MatMul/Softmax/Gelu path)."""

    def __init__(self, num_classes=10, dim=96, depth=4, heads=4, patch=8, image_size=64):
        super().__init__()
        n_tokens = (image_size // patch) ** 2
        self.patch = nn.Conv2d(3, dim, patch, patch)
        self.cls = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos = nn.Parameter(torch.randn(1, n_tokens + 1, dim) * 0.02)
        self.blocks = nn.Sequential(*[ViTBlock(dim, heads) for _ in range(depth)])
        self.ln = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):
        B = x.shape[0]
        t = self.patch(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls.expand(B, -1, -1), t], 1) + self.pos
        t = self.ln(self.blocks(t))
        return self.head(t[:, 0])


def vit_tiny(num_classes=10):
    return ViTTiny(num_classes=num_classes)


MODEL_ZOO = {
    "resnet18": resnet18,
    "resnet50": resnet50,
    "mobilenet_v2": mobilenet_v2,
    "regnet_600m": regnet_600m,
    "unet_tiny": unet_tiny,
    "unet_diffusion_tiny": unet_diffusion_tiny,
    "yolo_tiny": yolo_tiny,
    "vit_tiny": vit_tiny,
}

ZOO_OUTPUT_NAMES = {"yolo_tiny": ["p16", "p32"]}
# native input resolution for the small families (ImageNet models use `image_size`)
ZOO_IMAGE_SIZE = {"unet_tiny": 64, "unet_diffusion_tiny": 64, "yolo_tiny": 64,
                  "vit_tiny": 64}


def export_zoo_model(name: str, path: str, image_size: int = 224, num_classes: int = 1000, seed: int = 0):
    torch.manual_seed(seed)
    image_size = ZOO_IMAGE_SIZE.get(name, image_size)
    kwargs = {} if name in ZOO_IMAGE_SIZE else {"num_classes": num_classes}
    model = MODEL_ZOO[name](**kwargs)
    example = torch.randn(1, 3, image_size, image_size)
    return export(model, example, path, output_names=ZOO_OUTPUT_NAMES.get(name))


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("name", choices=sorted(MODEL_ZOO))
    p.add_argument("path")
    p.add_argument("--size", type=int, default=224)
    a = p.parse_args()
    export_zoo_model(a.name, a.path, a.size)
    print(f"exported {a.name} -> {a.path}")

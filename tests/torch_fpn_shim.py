"""Minimal torch resnet50-FPN with torchvision-compatible semantics + state
dict, used by the BE / BE_GAN / BC trajectory-parity gates.

This environment has no torchvision wheel, and the reference models build
the backbone inside their constructors (`resnet_fpn_backbone('resnet50',
True)` — networks_BE.py:16, networks_BE_GAN.py:44, networks_BC.py:83), so
the gates install this shim as `torchvision.models.detection.backbone_utils`
before importing them.  What it reproduces (and what the gates then assert
end-to-end against the flax rebuild, models/backbone.py):

  * resnet50 Bottleneck body — stride on the 3x3 conv, FrozenBatchNorm2d
    everywhere (torchvision's default detection-backbone norm layer), 7x7/s2
    stem + 3x3/s2 maxpool;
  * trainable_layers=3 default: conv1 + layer1 requires_grad_(False);
  * FPN: 1x1 lateral convs, top-down nearest upsampling, 3x3 output convs,
    LastLevelMaxPool; forward returns OrderedDict {'0','1','2','3','pool'}
    at strides 4/8/16/32/64 with 256 channels;
  * state-dict vocabulary (body.conv1.weight, body.layerL.B.convN.weight,
    body.layerL.B.downsample.{0,1}.*, fpn.inner_blocks.N.*,
    fpn.layer_blocks.N.*) accepted verbatim by
    vaeplay_tpu.models.backbone.convert_torchvision_state_dict.

`pretrained` is accepted and ignored — no weights can be downloaded here;
the gates transplant whatever weights the shim holds into the flax model,
so parity is checked regardless of the init distribution.
"""

import types
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


class FrozenBatchNorm2d(nn.Module):
    """y = (x - mean) * weight / sqrt(var + eps) + bias, all four tensors
    non-trainable buffers (torchvision FrozenBatchNorm2d, eps 1e-5)."""

    def __init__(self, num_features, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.register_buffer("weight", torch.ones(num_features))
        self.register_buffer("bias", torch.zeros(num_features))
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        shift = self.bias - self.running_mean * scale
        return x * scale.reshape(1, -1, 1, 1) + shift.reshape(1, -1, 1, 1)


class Bottleneck(nn.Module):
    def __init__(self, in_ch, width, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = FrozenBatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = FrozenBatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = FrozenBatchNorm2d(width * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, width * 4, 1, stride=stride, bias=False),
                FrozenBatchNorm2d(width * 4),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class ResNet50Body(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = FrozenBatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        in_ch = 64
        for li, (width, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 6, 3), (1, 2, 2, 2)), start=1
        ):
            stage = []
            for bi in range(blocks):
                stage.append(Bottleneck(in_ch, width,
                                        stride=stride if bi == 0 else 1,
                                        downsample=bi == 0))
                in_ch = width * 4
            setattr(self, f"layer{li}", nn.Sequential(*stage))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


class FPN(nn.Module):
    def __init__(self, in_channels=(256, 512, 1024, 2048), out_channels=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Conv2d(c, out_channels, 1) for c in in_channels])
        self.layer_blocks = nn.ModuleList(
            [nn.Conv2d(out_channels, out_channels, 3, padding=1)
             for _ in in_channels])
        for m in list(self.inner_blocks) + list(self.layer_blocks):
            nn.init.kaiming_uniform_(m.weight, a=1)
            nn.init.constant_(m.bias, 0)

    def forward(self, feats):
        laterals = [b(f) for b, f in zip(self.inner_blocks, feats)]
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = F.interpolate(merged[i + 1], size=laterals[i].shape[-2:],
                               mode="nearest")
            merged[i] = laterals[i] + up
        outs = OrderedDict(
            (str(i), b(m)) for i, (b, m) in enumerate(zip(self.layer_blocks,
                                                          merged)))
        outs["pool"] = F.max_pool2d(outs["3"], 1, stride=2, padding=0)
        return outs


class BackboneWithFPN(nn.Module):
    out_channels = 256

    def __init__(self):
        super().__init__()
        self.body = ResNet50Body()
        self.fpn = FPN()

    def forward(self, x):
        return self.fpn(self.body(x))


def resnet_fpn_backbone(backbone_name, pretrained=False, trainable_layers=3,
                        **kwargs):
    assert backbone_name == "resnet50", backbone_name
    net = BackboneWithFPN()
    # trainable_layers=3: only layer2/3/4 (+ fpn) train; conv1 + layer1 frozen
    layers_to_train = ["layer4", "layer3", "layer2"][:trainable_layers]
    for name, p in net.body.named_parameters():
        if all(not name.startswith(layer) for layer in layers_to_train):
            p.requires_grad_(False)
    return net


def install(monkeypatch):
    """Register the torchvision module tree (backbone_utils + the unused
    resnet/transforms submodules the reference files import) in sys.modules
    via the given pytest MonkeyPatch (unwound when its context exits)."""
    import sys

    # reference tools/utils.py imports cv2 + skimage (and datasets import
    # rdp); the gates never reach those code paths
    for name in ("cv2", "rdp"):
        if name not in sys.modules:
            monkeypatch.setitem(sys.modules, name, types.ModuleType(name))
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.measure = types.ModuleType("skimage.measure")
        monkeypatch.setitem(sys.modules, "skimage", sk)
        monkeypatch.setitem(sys.modules, "skimage.measure", sk.measure)

    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models_m = types.ModuleType("torchvision.models")
    det_m = types.ModuleType("torchvision.models.detection")
    bu_m = types.ModuleType("torchvision.models.detection.backbone_utils")
    resnet_m = types.ModuleType("torchvision.models.resnet")
    dense_m = types.ModuleType("torchvision.models.densenet")
    tf_m = types.ModuleType("torchvision.transforms")
    tff_m = types.ModuleType("torchvision.transforms.functional")
    bu_m.resnet_fpn_backbone = resnet_fpn_backbone
    resnet_m.resnet18 = lambda *a, **k: None
    resnet_m.resnet34 = lambda *a, **k: None
    resnet_m.resnet50 = lambda *a, **k: None
    dense_m.densenet121 = lambda *a, **k: None
    tv.models = models_m
    tv.transforms = tf_m
    tf_m.functional = tff_m
    models_m.detection = det_m
    models_m.resnet = resnet_m
    models_m.densenet = dense_m
    det_m.backbone_utils = bu_m
    for name, mod in (
        ("torchvision", tv),
        ("torchvision.models", models_m),
        ("torchvision.models.detection", det_m),
        ("torchvision.models.detection.backbone_utils", bu_m),
        ("torchvision.models.resnet", resnet_m),
        ("torchvision.models.densenet", dense_m),
        ("torchvision.transforms", tf_m),
        ("torchvision.transforms.functional", tff_m),
    ):
        monkeypatch.setitem(sys.modules, name, mod)

"""ResNet50 + FPN backbone — flax rebuild of torchvision's
`resnet_fpn_backbone('resnet50', pretrained=True)` used by the BE/BC/BE_GAN
feature nets (reference networks_BE.py:16, networks_BC.py:83,
networks_BE_GAN.py:44).

Faithful points:
  * Bottleneck layout, strides, and the FPN top-down pathway with nearest
    upsampling; levels "0".."3" at strides 4/8/16/32 with 256 channels.
  * FrozenBatchNorm semantics: backbone norm layers are affine transforms
    with *stored* (non-trainable) statistics, kept in the "constants"
    collection — matching torchvision's FrozenBatchNorm2d.
  * torchvision's default trainable_layers=3 (conv1 + layer1 frozen) is
    honored by the trainer via the `FROZEN_PREFIXES` optimizer mask.
  * `convert_torchvision_state_dict` transplants a torchvision checkpoint
    (when the user supplies one; this environment has no pretrained weights)
    into the flax param/constant trees.

The reference feature nets consume only level "0" (stride 4,
networks_BE.py:35); `ResNetFPN.__call__` returns all pyramid levels and
callers pick what they need.
"""

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vaeplay_tpu.core import init as vinit
from vaeplay_tpu.ops.image import max_pool

# param subtrees frozen by torchvision's trainable_layers=3 default
FROZEN_PREFIXES = ("conv1", "layer1")


class FrozenBatchNorm(nn.Module):
    """Affine y = (x - mean) * scale / sqrt(var + eps) + bias with all four
    tensors stored as non-trainable constants (torchvision FrozenBatchNorm2d,
    eps 1e-5 via the resnet default 0.0 + torchvision uses eps=1e-5)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.variable("constants", "scale", jnp.ones, (self.features,))
        bias = self.variable("constants", "bias", jnp.zeros, (self.features,))
        mean = self.variable("constants", "mean", jnp.zeros, (self.features,))
        var = self.variable("constants", "var", jnp.ones, (self.features,))
        inv = scale.value * jax.lax.rsqrt(var.value + self.eps)
        return x * inv + (bias.value - mean.value * inv)


class Bottleneck(nn.Module):
    """torchvision resnet Bottleneck: 1x1 → 3x3(stride) → 1x1(x4) + skip."""

    features: int  # width of the 3x3 conv; output is features * 4
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=vinit.conv_kaiming, name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=vinit.conv_kaiming, name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    kernel_init=vinit.conv_kaiming, name="conv3")(y)
        y = FrozenBatchNorm(self.features * 4, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False,
                               kernel_init=vinit.conv_kaiming, name="down_conv")(x)
            identity = FrozenBatchNorm(self.features * 4, name="down_bn")(identity)
        return nn.relu(y + identity)


class ResNet50(nn.Module):
    """Returns C2..C5 feature maps (strides 4, 8, 16, 32).

    `layers`/`base_width` default to the real resnet50 (3,4,6,3)x64; slim
    configs (e.g. (1,1,1,1)x16) keep the exact 4-stage/stride topology and
    sharding behavior for dryrun/SPMD-test budgets where only the program
    STRUCTURE is under test, not the capacity."""

    layers: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        w = self.base_width
        x = nn.Conv(w, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=vinit.conv_kaiming, name="conv1")(x)
        x = FrozenBatchNorm(w, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool(x, 3, stride=2, padding=1)
        feats = []
        for li, (width, blocks, stride) in enumerate(
            zip((w, w * 2, w * 4, w * 8), self.layers, (1, 2, 2, 2)), start=1
        ):
            for bi in range(blocks):
                x = Bottleneck(
                    width,
                    stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    name=f"layer{li}_block{bi}",
                )(x)
            feats.append(x)
        return feats


class FPN(nn.Module):
    """torchvision FeaturePyramidNetwork: 1x1 laterals + top-down nearest
    upsample + 3x3 output convs, 256 channels."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=vinit.conv_kaiming,
                    bias_init=vinit.zeros, name=f"inner{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down: start from the deepest level
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(
                merged[i + 1],
                laterals[i].shape[:1] + laterals[i].shape[1:3] + merged[i + 1].shape[3:],
                method="nearest",
            )
            merged[i] = laterals[i] + up
        outs = {
            str(i): nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                            kernel_init=vinit.conv_kaiming, bias_init=vinit.zeros,
                            name=f"layer{i}")(m)
            for i, m in enumerate(merged)
        }
        outs["pool"] = max_pool(outs["3"], 1, stride=2, padding=0)
        return outs


class ResNetFPN(nn.Module):
    """resnet_fpn_backbone('resnet50') equivalent; out_channels = 256.

    `layers`/`base_width` select a slim variant (see ResNet50) for
    dryrun/SPMD tests; defaults are the real resnet50."""

    out_channels: int = 256
    layers: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats = ResNet50(layers=self.layers, base_width=self.base_width,
                         name="body")(x)
        return FPN(out_channels=self.out_channels, name="fpn")(feats)


# ---------------------------------------------------------------------------
# torchvision weight conversion


def load_backbone_state(path: str) -> Dict[str, "np.ndarray"]:
    """Load a backbone checkpoint file into {tensor name → numpy array}.

    Accepts a torchvision-style ``.pth``/``.pt`` (via torch.load, handling a
    raw state_dict or a {"state_dict"|"model": ...} wrapper) or an ``.npz``
    with the same key vocabulary.  Provides the `pretrained=True` capability
    of the reference feature nets (networks_BE.py:16, networks_BC.py:83,
    networks_BE_GAN.py:44) from a user-supplied offline file — this
    environment cannot download weights."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def _find_backbone_subtrees(params: Dict, constants: Dict):
    """Locate every ResNetFPN subtree (a dict holding both "body" and "fpn")
    in a model's param/constant trees — models nest the backbone differently
    (BE: feature_net/backbone, BE_GAN: backbone, BC: feature_net/feature)."""
    found = []

    def walk(p, c):
        if not isinstance(p, dict):
            return
        if "body" in p and "fpn" in p and isinstance(c, dict) and "body" in c:
            found.append((p, c))
            return
        for k in p:
            if isinstance(c, dict) and k in c:
                walk(p[k], c[k])

    walk(params, constants)
    return found


def load_and_transplant_backbone(path: str, params: Dict, constants: Dict) -> int:
    """Load `path` and transplant it into every ResNetFPN subtree found in
    (params, constants) IN PLACE.  Returns the number of subtrees filled;
    raises if none were found (wrong model or frozen trees)."""
    sd = load_backbone_state(path)
    trees = _find_backbone_subtrees(params, constants)
    if not trees:
        raise ValueError(
            "no ResNetFPN subtree (body+fpn) found in the model params — "
            "--backbone_ckpt only applies to BE/BC/BE_GAN-style models")
    for p, c in trees:
        convert_torchvision_state_dict(sd, p, c)
    return len(trees)


def convert_torchvision_state_dict(
    state_dict: Dict[str, "np.ndarray"], params: Dict, constants: Dict
) -> None:
    """Transplant a torchvision resnet50 state_dict (tensor name → numpy
    OIHW/1D arrays) into ResNetFPN param/constant trees IN PLACE (the trees
    must be plain nested dicts, e.g. from flax.core.unfreeze).

    Accepts either raw `resnet50` keys (conv1.weight, layer1.0.conv1.weight...)
    or `backbone.body.*` / `backbone.fpn.*` prefixed keys from a detection
    checkpoint.
    """

    def strip(k: str) -> str:
        for pre in ("backbone.body.", "backbone.fpn.", "body.", "fpn."):
            if k.startswith(pre):
                return k[len(pre):]
        return k

    def conv_w(v):  # OIHW → HWIO
        return jnp.asarray(np.transpose(v, (2, 3, 1, 0)))

    sd = {strip(k): np.asarray(v) for k, v in state_dict.items()}
    body_p, body_c = params["body"], constants["body"]

    def put_bn(tree_c, prefix):
        tree_c["scale"] = jnp.asarray(sd[f"{prefix}.weight"])
        tree_c["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        tree_c["mean"] = jnp.asarray(sd[f"{prefix}.running_mean"])
        tree_c["var"] = jnp.asarray(sd[f"{prefix}.running_var"])

    if "conv1.weight" in sd:
        want = body_p["conv1"]["kernel"].shape[3]
        have = sd["conv1.weight"].shape[0]
        if want != have:
            raise ValueError(
                f"backbone_ckpt stem width {have} != model stem width {want}: "
                "slim base_width configs cannot load this checkpoint")
        body_p["conv1"]["kernel"] = conv_w(sd["conv1.weight"])
        put_bn(body_c["bn1"], "bn1")
        # block counts come from the model's own param tree (a slim-config
        # model has fewer than resnet50's (3,4,6,3)); the checkpoint must
        # cover every block the model has (ADVICE.md round 3).
        for li in range(1, 5):
            blocks = sum(1 for k in body_p
                         if k.startswith(f"layer{li}_block"))
            missing = [bi for bi in range(blocks)
                       if f"layer{li}.{bi}.conv1.weight" not in sd]
            if missing:
                raise ValueError(
                    f"backbone_ckpt has no layer{li} blocks {missing}: the "
                    f"model expects {blocks} blocks in layer{li} but the "
                    "checkpoint is a different resnet variant (slim "
                    "backbone_layers configs cannot load full resnet50 "
                    "checkpoints and vice versa)")
            for bi in range(blocks):
                src = f"layer{li}.{bi}"
                dst = f"layer{li}_block{bi}"
                for ci in (1, 2, 3):
                    body_p[dst][f"conv{ci}"]["kernel"] = conv_w(sd[f"{src}.conv{ci}.weight"])
                    put_bn(body_c[dst][f"bn{ci}"], f"{src}.bn{ci}")
                if f"{src}.downsample.0.weight" in sd:
                    body_p[dst]["down_conv"]["kernel"] = conv_w(sd[f"{src}.downsample.0.weight"])
                    put_bn(body_c[dst]["down_bn"], f"{src}.downsample.1")
    # FPN weights (present in detection checkpoints)
    fpn_p = params["fpn"]
    for i in range(4):
        for src, dst in ((f"inner_blocks.{i}", f"inner{i}"), (f"layer_blocks.{i}", f"layer{i}")):
            wk, bk = f"{src}.weight", f"{src}.bias"
            if wk not in sd:
                wk, bk = f"{src}.0.weight", f"{src}.0.bias"  # newer torchvision
            if wk in sd:
                fpn_p[dst]["kernel"] = conv_w(sd[wk])
                fpn_p[dst]["bias"] = jnp.asarray(sd[bk])

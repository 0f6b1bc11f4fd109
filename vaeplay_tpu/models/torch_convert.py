"""torch → flax weight transplantation for the circle VAE-GAN.

Used by the CPU-vs-reference parity gate (tests/test_parity_vaegan.py): given
a torch state_dict of the reference VaeGan (models/networks.py:201-262), fill
the flax param/batch_stats trees so both models compute identical functions.

Layout conversions:
  conv            OIHW → HWIO
  conv-transpose  (in, out, kh, kw) → HWIO (applied flipped, see
                  core.layers.ConvTransposeBlock)
  linear          (out, in) → (in, out)
  encoder/discriminator flatten FCs: torch flattens NCHW channel-major while
  the NHWC rebuild flattens spatial-major — the FC kernel's input axis is
  permuted accordingly.
"""

from typing import Dict

import numpy as np


def _conv(w):  # OIHW → HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _convT(w):  # (I, O, kh, kw) → HWIO
    return np.transpose(w, (2, 3, 0, 1))


def _lin(w):  # (out, in) → (in, out)
    return np.transpose(w, (1, 0))


def _lin_from_nchw_flat(w, c, h, ww):
    """FC over a flattened conv map: torch input index = c*(h*w)+s,
    NHWC input index = s*C + c.  w: (out, c*h*w)."""
    out = w.shape[0]
    w = w.reshape(out, c, h, ww)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out, -1)
    return np.transpose(w, (1, 0))


def _bn(sd, prefix):
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
         "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


def vaegan_from_torch(sd: Dict[str, np.ndarray], img_size: int):
    """Returns (params, batch_stats) plain nested dicts for models.vae_gan.VaeGan."""
    import math

    iter_level = int(math.log2(img_size // 8))
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {"encoder": {}, "decoder": {}, "discriminator": {}, "param_encoder": {}}
    stats: Dict = {"encoder": {}, "decoder": {}, "discriminator": {}}

    # ---- encoder
    enc_p, enc_s = params["encoder"], stats["encoder"]
    for i in range(iter_level):
        bn_p, bn_s = _bn(sd, f"encoder.conv.{i}.bn")
        enc_p[f"block{i}"] = {"conv": {"kernel": _conv(sd[f"encoder.conv.{i}.conv.weight"])},
                              "bn": bn_p}
        enc_s[f"block{i}"] = {"bn": bn_s}
    size = 64 * (2 ** (iter_level - 1))
    enc_p["fc"] = {"kernel": _lin_from_nchw_flat(sd["encoder.fc.0.weight"], size, 8, 8)}
    bn_p, bn_s = _bn(sd, "encoder.fc.1")
    enc_p["fc_bn"], enc_s["fc_bn"] = bn_p, bn_s
    enc_p["l_mu"] = {"kernel": _lin(sd["encoder.l_mu.weight"]),
                     "bias": np.asarray(sd["encoder.l_mu.bias"])}
    enc_p["l_var"] = {"kernel": _lin(sd["encoder.l_var.weight"]),
                      "bias": np.asarray(sd["encoder.l_var.bias"])}

    # ---- decoder (fc output is reshaped channel-major on both sides)
    dec_p, dec_s = params["decoder"], stats["decoder"]
    dec_p["fc"] = {"kernel": _lin(sd["decoder.fc.0.weight"])}
    bn_p, bn_s = _bn(sd, "decoder.fc.1")
    dec_p["fc_bn"], dec_s["fc_bn"] = bn_p, bn_s
    for i in range(iter_level):
        bn_p, bn_s = _bn(sd, f"decoder.conv.{i}.bn")
        dec_p[f"block{i}"] = {"conv": {"kernel": _convT(sd[f"decoder.conv.{i}.conv.weight"])},
                              "bn": bn_p}
        dec_s[f"block{i}"] = {"bn": bn_s}
    dec_p["out_conv"] = {"kernel": _conv(sd[f"decoder.conv.{iter_level}.0.weight"]),
                         "bias": np.asarray(sd[f"decoder.conv.{iter_level}.0.bias"])}

    # ---- discriminator
    dis_p, dis_s = params["discriminator"], stats["discriminator"]
    dis_p["stem"] = {"kernel": _conv(sd["discriminator.conv.0.0.weight"]),
                     "bias": np.asarray(sd["discriminator.conv.0.0.bias"])}
    ch = 32
    for i in range(1, iter_level + 1):
        bn_p, bn_s = _bn(sd, f"discriminator.conv.{i}.bn")
        dis_p[f"block{i}"] = {"conv": {"kernel": _conv(sd[f"discriminator.conv.{i}.conv.weight"])},
                              "bn": bn_p}
        dis_s[f"block{i}"] = {"bn": bn_s}
        ch *= 2
    dis_p["fc0"] = {"kernel": _lin_from_nchw_flat(sd["discriminator.fc.0.weight"], ch, 8, 8)}
    bn_p, bn_s = _bn(sd, "discriminator.fc.1")
    dis_p["fc_bn"], dis_s["fc_bn"] = bn_p, bn_s
    dis_p["fc1"] = {"kernel": _lin(sd["discriminator.fc.3.weight"]),
                    "bias": np.asarray(sd["discriminator.fc.3.bias"])}

    # ---- param encoder (plain linears)
    pe = params["param_encoder"]
    for flax_name, torch_name in [
        ("head0", "head.0"), ("head1", "head.1"), ("head2", "head.2"),
        ("head3", "head.3"), ("r0", "r_fc.0"), ("r1", "r_fc.1"),
        ("xy0", "xy_fc.0"), ("xy1", "xy_fc.1"),
    ]:
        pe[flax_name] = {"kernel": _lin(sd[f"param_encoder.{torch_name}.weight"]),
                         "bias": np.asarray(sd[f"param_encoder.{torch_name}.bias"])}

    return params, stats


# ---------------------------------------------------------------------------
# Style_GAN (reference models/network_Style_GAN.py) transplantation — used by
# the Style_GAN trajectory-parity gate (tests/test_parity_trajectory_stylegan.py).

def _convblock(sd, prefix, bias=True):
    """reference blocks.Conv2d → flax ConvBlock {conv: {kernel[, bias]}}.
    InstanceNorm2d carries no parameters (affine=False default)."""
    p = {"kernel": _conv(sd[f"{prefix}.conv.0.weight"])}
    if bias:
        p["bias"] = np.asarray(sd[f"{prefix}.conv.0.bias"])
    return {"conv": p}


def _linblock(sd, prefix):
    """reference blocks.Linear → flax DenseBlock {fc: {kernel, bias}}."""
    return {"fc": {"kernel": _lin(sd[f"{prefix}.fc.0.weight"]),
                   "bias": np.asarray(sd[f"{prefix}.fc.0.bias"])}}


def _scse(sd, prefix):
    """reference blocks.SCSEBlock → flax SCSEBlock params."""
    def c(name):
        return {"kernel": _conv(sd[f"{prefix}.{name}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.{name}.bias"])}
    return {"cse_reduce": c("cSE.1"), "cse_expand": c("cSE.3"),
            "sse": c("sSE.0")}


def _convt(sd, prefix):
    """plain nn.ConvTranspose2d → flax ConvTransposeBlock {kernel, bias}."""
    return {"kernel": _convT(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _myconv(sd, prefix, bias=True):
    """reference myConv2d (label-gated conv pair) → flax MyConv2d."""
    return {"conv_1": _convblock(sd, f"{prefix}.conv_1", bias),
            "conv_2": _convblock(sd, f"{prefix}.conv_2", bias)}


def style_encoder_from_torch(sd: Dict[str, np.ndarray], image_size: int):
    """reference StyleEncoder (network_Style_GAN.py:12-43) → flax params."""
    import math

    sd = {k: np.asarray(v) for k, v in sd.items()}
    n_level = int(math.log2(image_size)) - 2
    p = {"c0": _convblock(sd, "convs.0")}
    for i in range(1, n_level + 1):
        p[f"c{i}"] = _convblock(sd, f"convs.{i}", bias=False)  # instance norm
    p["c_extra0"] = _convblock(sd, f"convs.{n_level + 1}")
    p["c_extra1"] = _convblock(sd, f"convs.{n_level + 2}")
    p["fc_mu"] = _linblock(sd, "fc_mu")
    p["fc_logvar"] = _linblock(sd, "fc_logvar")
    return p


def style_generator_from_torch(sd: Dict[str, np.ndarray]):
    """reference Generator (network_Style_GAN.py:81-180) → flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = {
        "mlp": {"fc0": _linblock(sd, "mlp.model.0"),
                "fc1": _linblock(sd, "mlp.model.1"),
                "fc_out": _linblock(sd, "mlp.model.2")},
        "conv1": _myconv(sd, "conv1"),
        "conv2": _myconv(sd, "conv2"),
        "final_up": _convt(sd, "final.0"),
        "final_c0": _convblock(sd, "final.1"),
        "final_c1": _convblock(sd, "final.2"),
        "final_c2": _convblock(sd, "final.3"),
    }
    for i in (1, 2, 3, 4):
        p[f"down{i}"] = _myconv(sd, f"down{i}", bias=False)  # instance norm
    for i in (1, 2, 3):
        p[f"skip{i}"] = _convblock(sd, f"skip{i}", bias=False)
        p[f"up{i}"] = {
            "up": _convt(sd, f"up{i}.up_convs.0"),
            "cat": _convblock(sd, f"up{i}.cat_convs.0"),
            "scse0": _scse(sd, f"up{i}.cat_convs.1"),
            "scse1": _scse(sd, f"up{i}.cat_convs.2"),
        }
    return p


def style_discriminator_from_torch(sd: Dict[str, np.ndarray], image_size: int):
    """reference Discriminator (network_Style_GAN.py:201-229) → flax params."""
    import math

    sd = {k: np.asarray(v) for k, v in sd.items()}
    n_level = int(math.log2(image_size)) - 2
    p = {"c0": _convblock(sd, "convs.0")}
    for i in range(1, n_level + 1):
        p[f"c{i}"] = _convblock(sd, f"convs.{i}", bias=False)
    p["adv0"] = _convblock(sd, "adv_convs.0")
    p["adv1"] = _convblock(sd, "adv_convs.1")
    p["aux0"] = _convblock(sd, "aux_convs.0")
    p["aux1"] = _convblock(sd, "aux_convs.1")
    return p

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
        # s2d final head (SmallChannelConv3x3S1): same canonical kernels,
        # flat {kernel, bias} layout
        "final_c0": {"kernel": _conv(sd["final.1.conv.0.weight"]),
                     "bias": np.asarray(sd["final.1.conv.0.bias"])},
        "final_c1": {"kernel": _conv(sd["final.2.conv.0.weight"]),
                     "bias": np.asarray(sd["final.2.conv.0.bias"])},
        "final_c2": {"kernel": _conv(sd["final.3.conv.0.weight"]),
                     "bias": np.asarray(sd["final.3.conv.0.bias"])},
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


# ---------------------------------------------------------------------------
# BP (reference models/networks_BP.py) transplantation — used by the BP
# trajectory-parity gate (tests/test_parity_trajectory_bp.py).

def _attnblock(sd, prefix):
    """reference blocks.SelfAttentionBlock → flax SelfAttentionBlock params
    (q/k/v are 1x1 Conv2d blocks with bias; gamma is a (1,) scalar)."""
    return {"q": _convblock(sd, f"{prefix}.q"),
            "k": _convblock(sd, f"{prefix}.k"),
            "v": _convblock(sd, f"{prefix}.v"),
            "gamma": np.asarray(sd[f"{prefix}.gamma"])}


def bp_from_torch(sd: Dict[str, np.ndarray]):
    """reference BP ComposeNet (networks_BP.py:242-262) state_dict → flax
    params for models/bp.ComposeNet.  The reference EllipseParamPredictor's
    conv stack (networks_BP.py:46-51) is dead code — defined but skipped in
    forward (:62-66) — so its tensors are intentionally not mapped."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc = {f"conv{i}": _convblock(sd, f"encoder.convs.{i}") for i in range(7)}
    ell = {f"fc{i}": _linblock(sd, f"ellipse_predictor.fcs.{i}")
           for i in range(3)}
    # fc0 consumes the flattened 4x4 avgpool: torch flattens NCHW (c,h,w),
    # flax flattens NHWC (h,w,c) — permute the input axis accordingly
    ell["fc0"]["fc"]["kernel"] = _lin_from_nchw_flat(
        sd["ellipse_predictor.fcs.0.fc.0.weight"], 256, 4, 4)
    elp = "emit_line_predictor"
    emit = {f"conv{i}": _convblock(sd, f"{elp}.convs.{i}") for i in range(7)}
    pp = f"{elp}.param_predictor"
    ve = {f"fc{i}": _linblock(sd, f"{pp}.value_encoder.fcs.{i}")
          for i in range(4)}
    for i in range(3):
        ve[f"attn{i}"] = _attnblock(sd, f"{pp}.value_encoder.attns.{i}")
    ppd = {"value_encoder": ve}
    for i in range(3):
        ppd[f"attn_a{i}"] = _attnblock(sd, f"{pp}.batch_attention_a.{i}")
        ppd[f"attn_b{i}"] = _attnblock(sd, f"{pp}.batch_attention_b.{i}")
        ppd[f"trig{i}"] = _linblock(sd, f"{pp}.trigger_pred.{i}")
        ppd[f"param{i}"] = _linblock(sd, f"{pp}.params_pred.{i}")
    emit["param_predictor"] = ppd
    return {"encoder": enc, "ellipse_predictor": ell,
            "emit_line_predictor": emit}


# ---------------------------------------------------------------------------
# BE_font (reference models/networks_BE_font.py) transplantation — used by
# the BE_font trajectory-parity gate (tests/test_parity_trajectory_be_font.py).

def _convblock_bn(sd, prefix):
    """reference blocks.Conv2d with bn='batch' → flax ConvBlock
    ({conv: {kernel}, norm: {scale, bias}}, {norm: {mean, var}})."""
    bn_p, bn_s = _bn(sd, f"{prefix}.conv.1")
    return ({"conv": {"kernel": _conv(sd[f"{prefix}.conv.0.weight"])},
             "norm": bn_p}, {"norm": bn_s})


def _embeding_block(sd, prefix):
    """reference networks_BE_font.EmbedingBlock → flax EmbedingBlock params."""
    p = {"fc0": _linblock(sd, f"{prefix}.convs_first.0"),
         "fc1": _linblock(sd, f"{prefix}.convs_first.1"),
         "e0": _linblock(sd, f"{prefix}.embeding.0"),
         "e1": _linblock(sd, f"{prefix}.embeding.1")}
    for i in range(3):
        p[f"attn{i}"] = _attnblock(sd, f"{prefix}.attention.{i}")
    return p


def _style_encode_block(sd, prefix, in_size):
    """reference networks_BE_font.StyleEncodeBlock → flax StyleEncodeBlock
    (instance-norm convs carry no norm params; conv bias disabled)."""
    import math

    repeat_num = int(math.log2(in_size)) - 3
    p = {"c0": _convblock(sd, f"{prefix}.convs.0", bias=False)}
    for i in range(repeat_num):
        p[f"c{i + 1}"] = _convblock(sd, f"{prefix}.convs.{i + 1}", bias=False)
    p["c_out"] = _convblock(sd, f"{prefix}.convs.{repeat_num + 1}", bias=False)
    return p


def be_font_from_torch(sd: Dict[str, np.ndarray], in_size: int):
    """reference BE_font ComposeNet (networks_BE_font.py:125-234) state_dict →
    (params, batch_stats) for models/be_font.ComposeNet.

    The relay FC pair straddles the layout boundary twice: relay0 consumes the
    flattened bottleneck (torch NCHW channel-major, flax NHWC spatial-major) so
    its first c*4*4 input rows are permuted; relay1's OUTPUT is reshaped back
    to a spatial map, so its output columns (and bias) get the same (c,h,w) →
    (h,w,c) permutation.  relay0-out → relay1-in is an internal latent with no
    layout meaning and is left untouched."""
    import math

    sd = {k: np.asarray(v) for k, v in sd.items()}
    repeat_num = int(math.log2(in_size // 4))
    params: Dict = {}
    stats: Dict = {}

    params["down0"] = _convblock(sd, "down.0", bias=False)
    c = 64
    for i in range(repeat_num):
        c = min(c * 2, 512)
        p0, s0 = _convblock_bn(sd, f"down.{i + 1}.0")
        params[f"down_blocks_{i}_0"] = p0
        stats[f"down_blocks_{i}_0"] = s0
        params[f"down_blocks_{i}_1"] = _convblock(sd, f"down.{i + 1}.1",
                                                  bias=False)

    params["embeding_block"] = {
        "label": _embeding_block(sd, "embeding_block.label_encode_block"),
        "style": _embeding_block(sd, "embeding_block.style_encode_block"),
    }
    params["style_encoder"] = {
        "label": _style_encode_block(sd, "style_encoder.label_encode_block",
                                     in_size),
        "style": _style_encode_block(sd, "style_encoder.style_encode_block",
                                     in_size),
    }

    relay_in = c * 4 * 4
    w0 = sd["relay_convs.0.fc.0.weight"]  # (relay_in, relay_in + 512)
    w0_feat = w0[:, :relay_in].reshape(-1, c, 4, 4)
    w0_feat = np.transpose(w0_feat, (0, 2, 3, 1)).reshape(-1, relay_in)
    params["relay0"] = {"fc": {
        "kernel": _lin(np.concatenate([w0_feat, w0[:, relay_in:]], axis=1)),
        "bias": np.asarray(sd["relay_convs.0.fc.0.bias"])}}
    w1 = sd["relay_convs.1.fc.0.weight"]  # (relay_in, relay_in)
    w1 = w1.reshape(c, 4, 4, -1).transpose(1, 2, 0, 3).reshape(relay_in, -1)
    b1 = sd["relay_convs.1.fc.0.bias"].reshape(c, 4, 4)
    params["relay1"] = {"fc": {
        "kernel": _lin(w1),
        "bias": np.transpose(b1, (1, 2, 0)).reshape(-1)}}

    for i in range(repeat_num):
        up_p, up_s = {}, {}
        for j, name in ((0, "conv1"), (1, "conv2")):
            pj, sj = _convblock_bn(sd, f"up.{i}.conv.{j}")
            up_p[name] = pj
            up_s[name] = sj
        params[f"ups_{i}"] = up_p
        stats[f"ups_{i}"] = up_s
        params[f"skips_{i}"] = _convblock(sd, f"skip.{i}", bias=False)
        params[f"cats_{i}"] = _convblock(sd, f"cat.{i}", bias=False)

    for head, tpre in (("mask_net", "mask_net"), ("edge_net", "edge_net")):
        params[head] = {
            "p0": _convblock(sd, f"{tpre}.predictor.0", bias=False),
            "p1": _convblock(sd, f"{tpre}.predictor.1", bias=False),
            "p2": _convblock(sd, f"{tpre}.predictor.2", bias=True)}
    return params, stats


def _be_font_classifier(sd, prefix, in_size):
    """reference networks_BE_font.Classifier → flax Classifier
    (params, batch_stats).  cls_convs.0 consumes the flattened 1024-ch conv
    map before the embed concat — its first 1024*(s/32)^2 input rows are
    NCHW→NHWC permuted."""
    p = {"c0": _convblock(sd, f"{prefix}.conv_first", bias=False)}
    s: Dict = {}
    for i, bn in enumerate(("instance", "instance", "batch", "batch")):
        if bn == "batch":
            pj, sj = _convblock_bn(sd, f"{prefix}.backbone.{i}")
            p[f"c{i + 1}"] = pj
            s[f"c{i + 1}"] = sj
        else:
            p[f"c{i + 1}"] = _convblock(sd, f"{prefix}.backbone.{i}",
                                        bias=False)
    p["embed"] = {
        "label": _embeding_block(sd, f"{prefix}.embeding_block.label_encode_block"),
        "style": _embeding_block(sd, f"{prefix}.embeding_block.style_encode_block"),
    }
    side = in_size // 32
    flat = 1024 * side * side
    w = sd[f"{prefix}.cls_convs.0.fc.0.weight"]
    w_feat = w[:, :flat].reshape(-1, 1024, side, side)
    w_feat = np.transpose(w_feat, (0, 2, 3, 1)).reshape(-1, flat)
    p["fc0"] = {"fc": {
        "kernel": _lin(np.concatenate([w_feat, w[:, flat:]], axis=1)),
        "bias": np.asarray(sd[f"{prefix}.cls_convs.0.fc.0.bias"])}}
    p["fc1"] = _linblock(sd, f"{prefix}.cls_convs.1")
    p["fc2"] = _linblock(sd, f"{prefix}.cls_convs.2")
    return p, s


def be_font_disc_from_torch(sd: Dict[str, np.ndarray], in_size: int):
    """reference BE_font Discriminator (networks_BE_font.py:269-278)
    state_dict → (params, batch_stats) for models/be_font.Discriminator."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}
    for name in ("adv_convs", "aux_convs"):
        p, s = _be_font_classifier(sd, name, in_size)
        params[name] = p
        stats[name] = s
    return params, stats


# ---------------------------------------------------------------------------
# BCP (reference models/networks_BCP.py) transplantation — used by the BCP
# trajectory-parity gate (tests/test_parity_trajectory_bcp.py).

def _linblock_nb(sd, prefix):
    """reference blocks.Linear(bias=None) → flax DenseBlock {fc: {kernel}}."""
    return {"fc": {"kernel": _lin(sd[f"{prefix}.fc.0.weight"])}}


def bcp_from_torch(sd: Dict[str, np.ndarray], blocks: int = 8,
                   merged: bool = True):
    """reference BCP ComposeNet (networks_BCP.py:253-304) state_dict → flax
    params for models/bcp.ComposeNet (merged encoder layout by default —
    merge_encoder_params moves the dual-tower kernels 1:1, no transforms).

    ClassPredictor / LinePredictor level counts use the encoder's out_size
    CONSTANT 128 (networks_BCP.py:63,266), independent of the input size."""
    import math

    from vaeplay_tpu.models.bcp import merge_encoder_params

    sd = {k: np.asarray(v) for k, v in sd.items()}
    dual = {}
    for i in range(blocks):
        dual[f"a{i}"] = {
            "c0": _convblock(sd, f"encoder.convs1.{i}.convs.0"),
            "c1": _convblock(sd, f"encoder.convs1.{i}.convs.1"),
            "c2": _convblock(sd, f"encoder.convs1.{i}.convs.2"),
        }
        dual[f"b{i}"] = {  # instance-norm tower: bias only on the 1x1 c1
            "c0": _convblock(sd, f"encoder.convs2.{i}.convs.0", bias=False),
            "c1": _convblock(sd, f"encoder.convs2.{i}.convs.1"),
            "c2": _convblock(sd, f"encoder.convs2.{i}.convs.2", bias=False),
        }
    enc = merge_encoder_params(dual, blocks) if merged else dual

    n_cls = int(math.log2(128)) - 1
    cls_p = {f"conv{i}": _convblock(sd, f"cls_classifier.convs.{i}")
             for i in range(n_cls)}
    for i in range(3):
        cls_p[f"fc{i}"] = _linblock(sd, f"cls_classifier.cls_convs.{i}")

    lp = {}
    level = int(math.log(128)) - 1
    for i in range(level):
        lp[f"freq{i}"] = _convblock(
            sd, f"line_predictor.frequency_encode_img.{i}", bias=False)
    lp["freq_out"] = _convblock(
        sd, f"line_predictor.frequency_encode_img.{level}")
    for i in range(3):
        lp[f"freq_fc{i}"] = _linblock(
            sd, f"line_predictor.frequency_encode_img_sub.{i}")
    for i in range(2):
        lp[f"fh{i}"] = _linblock(sd, f"line_predictor.frequency_head.{i}")
    for i in range(3):
        lp[f"pp{i}"] = _linblock(sd, f"line_predictor.params_pred.{i}")
        lp[f"fp{i}"] = _linblock(sd, f"line_predictor.frequency_pred.{i}")
    return {"encoder": enc, "cls_classifier": cls_p, "line_predictor": lp}


def bcp_disc_from_torch(sd: Dict[str, np.ndarray], image_size: int):
    """reference BCP Discriminator (networks_BCP.py:306-363) state_dict →
    flax params for models/bcp.Discriminator."""
    import math

    sd = {k: np.asarray(v) for k, v in sd.items()}
    level = int(math.log2(image_size)) - 2 - 1
    p = {"g0": _convblock(sd, "global_convs.0")}
    for i in range(1, level):
        p[f"g{i}"] = _convblock(sd, f"global_convs.{i}", bias=False)
    p["g_out"] = _convblock(sd, f"global_convs.{level}")
    for i in range(level):
        p[f"l{i}a"] = _linblock_nb(sd, f"local_convs.{2 * i}")
        p[f"l{i}b"] = _linblock_nb(sd, f"local_convs.{2 * i + 1}")
    p["l_out"] = _linblock_nb(sd, f"local_convs.{2 * level}")
    for i in range(4):
        p[f"m{i}"] = _linblock(sd, f"merge_convs.{i}")
    p["m4"] = _linblock_nb(sd, "merge_convs.4")
    return p


# ---------------------------------------------------------------------------
# BE / BE_GAN (reference models/networks_BE.py, networks_BE_GAN.py)
# transplantation — used by the BE / BE_GAN trajectory-parity gates.  The
# torch side is instantiated against tests/torch_fpn_shim.py (this
# environment has no torchvision wheel); the backbone subtree reuses
# backbone.convert_torchvision_state_dict on the shim's torchvision-layout
# state dict.

def _plain(tree):
    """FrozenDict → mutable plain nested dict (deep copy of the structure)."""
    import flax

    t = flax.core.unfreeze(tree) if tree is not None else {}

    def rec(x):
        return {k: rec(v) for k, v in x.items()} if isinstance(x, dict) else x

    return rec(t)


def _masknet_from_torch(sd, prefix):
    """reference MaskNet/EdgeNet (networks_BE.py:39-66, networks_BE_GAN.py:11-37)
    → flax models/be.MaskNet (params, batch_stats).  pred1-3 are
    SmallChannelConv3x3S1 blocks holding the SAME canonical (3,3,C,F)
    kernels as the reference's plain convs (exact-math s2d layout)."""
    p, s = {}, {}
    for flax_up, torch_up in (("up1", "conv1"), ("up2", "conv2")):
        up_p, up_s = {}, {}
        for j, name in ((0, "conv1"), (1, "conv2")):
            pj, sj = _convblock_bn(sd, f"{prefix}.{torch_up}.conv.{j}")
            up_p[name], up_s[name] = pj, sj
        p[flax_up], s[flax_up] = up_p, up_s
    for i in range(3):
        p[f"pred{i + 1}"] = {
            "kernel": _conv(sd[f"{prefix}.predictor.{i}.conv.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.predictor.{i}.conv.0.bias"])}
    return p, s


def _aux_chain(sd, prefix, repeat):
    """256→target 1x1/3x3 BN conv chain (networks_BE.py:20-26)."""
    p, s = {}, {}
    for i in range(repeat):
        pa, sa = _convblock_bn(sd, f"{prefix}.{2 * i}")
        pb, sb = _convblock_bn(sd, f"{prefix}.{2 * i + 1}")
        p[f"aux{i}a"], s[f"aux{i}a"] = pa, sa
        p[f"aux{i}b"], s[f"aux{i}b"] = pb, sb
    return p, s


def _fill_backbone(sd, prefix, params, constants):
    from vaeplay_tpu.models.backbone import convert_torchvision_state_dict

    bb = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    convert_torchvision_state_dict(bb, params, constants)


def be_from_torch(sd: Dict[str, np.ndarray], variables):
    """reference BE ComposeNet (networks_BE.py:68-90) state_dict → (params,
    batch_stats, constants) for models/be.ComposeNet, starting from
    freshly-initialized `variables` (the backbone transplant fills a copied
    tree in place; heads/aux are rebuilt outright)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = _plain(variables["params"])
    stats = _plain(variables.get("batch_stats"))
    consts = _plain(variables.get("constants"))
    _fill_backbone(sd, "feature_net.backbone.",
                   params["feature_net"]["backbone"],
                   consts["feature_net"]["backbone"])
    pa, sa = _aux_chain(sd, "feature_net.aux_convs", 3)  # 256 → 32
    params["feature_net"].update(pa)
    stats["feature_net"].update(sa)
    for head in ("mask_net", "edge_net"):
        p, s = _masknet_from_torch(sd, head)
        params[head] = p
        stats[head] = s
    return params, stats, consts


def be_gan_from_torch(sd: Dict[str, np.ndarray], variables):
    """reference BE_GAN generator ComposeNet (networks_BE_GAN.py:39-73)
    state_dict → (params, batch_stats, constants) for models/be_gan.ComposeNet."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = _plain(variables["params"])
    stats = _plain(variables.get("batch_stats"))
    consts = _plain(variables.get("constants"))
    _fill_backbone(sd, "backbone.", params["backbone"], consts["backbone"])
    pa, sa = _aux_chain(sd, "aux_convs", 2)  # 256 → 64
    params.update(pa)
    stats.update(sa)
    for head in ("mask_net", "edge_net"):
        p, s = _masknet_from_torch(sd, head)
        params[head] = p
        stats[head] = s
    return params, stats, consts


def _maskmapper_from_torch(sd, prefix):
    """reference MaskMapper (networks_BE_GAN.py:75-114) → flax
    models/be_gan.MaskMapper (params, batch_stats).  conv0 is the
    SmallChannelConv3x3S2 s2d stem holding the same canonical kernel."""
    p = {"conv0": {"kernel": _conv(sd[f"{prefix}.convs.0.conv.0.weight"]),
                   "bias": np.asarray(sd[f"{prefix}.convs.0.conv.0.bias"])},
         "conv1": _convblock(sd, f"{prefix}.convs.1")}
    s = {}
    idx = 0
    while f"{prefix}.feat_modules.{idx}.0.conv.0.weight" in sd:
        pa, sa = _convblock_bn(sd, f"{prefix}.feat_modules.{idx}.0")
        pb, sb = _convblock_bn(sd, f"{prefix}.feat_modules.{idx}.1")
        p[f"feat{idx}a"], s[f"feat{idx}a"] = pa, sa
        p[f"feat{idx}b"], s[f"feat{idx}b"] = pb, sb
        idx += 1
    p["pool_conv"] = _convblock(sd, f"{prefix}.pooler.0")
    return p, s


def be_gan_disc_from_torch(sd: Dict[str, np.ndarray]):
    """reference BE_GAN Discriminator (networks_BE_GAN.py:116-140) state_dict
    → (params, batch_stats) for models/be_gan.Discriminator."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params, stats = {}, {}
    for name in ("content_disc", "boundary_disc"):
        p, s = _maskmapper_from_torch(sd, name)
        params[name], stats[name] = p, s
    params["pred0"] = _linblock(sd, "predictor.0")
    params["pred1"] = _linblock(sd, "predictor.1")
    params["pred2"] = _linblock_nb(sd, "predictor.2")
    return params, stats


# ---------------------------------------------------------------------------
# BC (reference models/networks_BC.py) transplantation — used by the BC
# trajectory-parity gate (tests/test_parity_trajectory_bc.py).

def bc_from_torch(sd: Dict[str, np.ndarray], variables):
    """reference BC ComposeNet (networks_BC.py:178-241) state_dict →
    (params, batch_stats, constants) for models/bc.ComposeNet.

    MaskNet p1/p2 and the EdgeNet stack are the exact-math layout rewrites
    (SmallChannelConv3x3S1 / OneChannelConv3x3) holding the SAME canonical
    kernels; the RefineNet FC flattening is (point, feat)-major on both
    sides, so fc kernels transplant with a plain transpose."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = _plain(variables["params"])
    stats = _plain(variables.get("batch_stats"))
    consts = _plain(variables.get("constants"))
    _fill_backbone(sd, "feature_net.feature.",
                   params["feature_net"]["feature"],
                   consts["feature_net"]["feature"])

    def raw_conv(prefix):
        return {"kernel": _conv(sd[f"{prefix}.conv.0.weight"]),
                "bias": np.asarray(sd[f"{prefix}.conv.0.bias"])}

    mn, mns = {}, {}
    for flax_name, tname in (("c1a", "conv1.0"), ("c1b", "conv1.1"),
                             ("c1c", "conv1.2"), ("c2a", "conv2.0"),
                             ("c2b", "conv2.1")):
        p_, s_ = _convblock_bn(sd, f"mask_net.{tname}")
        mn[flax_name], mns[flax_name] = p_, s_
    for i in range(2):
        mn[f"p{i + 1}"] = raw_conv(f"mask_net.predictor.{i}")
    params["mask_net"], stats["mask_net"] = mn, mns

    en = {}
    for i in range(3):
        en[f"c{i}"] = raw_conv(f"edge_net.conv1.{i}")
    for i in range(2):
        en[f"p{i}"] = raw_conv(f"edge_net.predictor.{i}")
    params["edge_net"] = en

    rn = {f"attn{i}": _attnblock(sd, f"refine_net.deform_blocks.{i}")
          for i in range(6)}
    for i in range(2):  # plain nn.Linear pair (networks_BC.py:160-163)
        rn[f"fc{i}"] = {
            "kernel": _lin(sd[f"refine_net.fc_blocks.{i}.weight"]),
            "bias": np.asarray(sd[f"refine_net.fc_blocks.{i}.bias"])}
    params["refine_net"] = rn
    return params, stats, consts

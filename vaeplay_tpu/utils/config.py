"""Typed per-family configs — the single home for the constants the reference
scatters as module globals and inline literals (SURVEY.md §5 "Config / flag
system": VALUE_WEIGHT appears in three reference copies, SAMPLE_COUNT,
DEFAULT_MAX_POINTS, LABEL_EMBED/STYLE_EMBED, loss weights, CLI defaults).

Each trainer CLI's argparse defaults mirror these; library users can build
models/steps directly from a config instance.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class VaeGanConfig:
    """train.py:109-146."""
    img_size: int = 128
    z_dim: int = 128
    num_of_param: int = 3
    batch_size: int = 16
    epochs: int = 20
    lr: float = 1e-4              # four RMSprop optimizers
    lambda_mse: float = 1e-6      # train.py:15
    bn_momentum_torch: float = 0.9  # networks.py:16


@dataclass(frozen=True)
class BEConfig:
    """train_BE.py:81-98."""
    img_size: int = 512
    batch_size: int = 32
    epochs: int = 1
    iterations: int = 1000
    lr: float = 1e-4
    aux_out_channels: int = 32    # networks_BE.py:19
    bce_weight: float = 0.5       # train_BE.py:58-59


@dataclass(frozen=True)
class BEGanConfig:
    """train_BE_GAN.py:189-237."""
    img_size: int = 512
    batch_size: int = 16
    epochs: int = 10
    iterations: int = 200
    lr_g: float = 1e-4
    lr_d: float = 1e-5            # lr * 0.1
    adam_betas: Tuple[float, float] = (0.5, 0.999)
    num_classes: int = 4          # unknown, oval, explode, emit
    aux_out_channels: int = 64    # networks_BE_GAN.py:42
    mask_loss_weight: float = 2.0
    edge_loss_weight: float = 2.0
    cnt_loss_weight: float = 0.5


@dataclass(frozen=True)
class BPConfig:
    """train_BP.py:131-180; networks_BP.py:15-17."""
    img_size: int = 512
    batch_size: int = 8
    epochs: int = 1
    iterations: int = 500
    lr: float = 1e-3
    steplr: Tuple[int, float] = (2, 0.1)
    sample_scale: int = 2
    sample_count: int = 720       # 360 * sample_scale
    value_weight: float = 10.0


@dataclass(frozen=True)
class BCConfig:
    """train_BC.py:90-130; networks_BC.py:24-25."""
    img_size: int = 256
    batch_size: int = 32
    epochs: int = 20
    lr: float = 1e-4
    steplr: Tuple[int, float] = (10, 0.5)
    max_points: int = 256         # DEFAULT_MAX_POINTS
    padding: int = 1
    ckpt_from_epoch: int = 10     # train_BC.py:134
    rdp_epsilon: float = 4.0      # dataset.py:253


@dataclass(frozen=True)
class BCPConfig:
    """train_BCP.py:180-231; networks_BCP.py:16."""
    img_size: int = 512
    batch_size: int = 16
    epochs: int = 1
    iterations: int = 200
    lr: float = 1e-3
    lr_disc: float = 1e-3
    max_points: int = 2048        # model cap 4096
    value_weight: float = 10.0
    freq_loss_weight: float = 4.0
    total_regress_weight: float = 10.0
    key_regress_weight: float = 6.0


@dataclass(frozen=True)
class BEFontConfig:
    """train_BE_font.py:226-282; networks_BE_font.py:18-19."""
    img_size: int = 64
    batch_size: int = 32
    epochs: int = 1
    lr: float = 1e-4              # three Adam optimizers
    num_classes: int = 143
    style_dim: int = 5
    label_embed: int = 256
    style_embed: int = 256
    mask_loss_weight: float = 10.0
    edge_loss_weight: float = 10.0
    adv_loss_weight: float = 2.0
    embed_loss_weight: float = 2.0
    max_allowed_iou: float = 0.1  # dataset_font.py:14
    synth_attempts: int = 20      # dataset_font.py:15


@dataclass(frozen=True)
class StyleGanConfig:
    """train_Style_GAN.py:287-339; network_Style_GAN.py:10."""
    img_size: int = 256
    z_dim: int = 512
    batch_size: int = 32
    epochs: int = 2
    iterations: int = 1000
    lr: float = 1e-4              # three Adam optimizers
    num_classes: int = 2
    image_channel: int = 3
    latent_cycle_weight: float = 0.5


CONFIGS = {
    "vae": VaeGanConfig, "be": BEConfig, "be_gan": BEGanConfig,
    "bp": BPConfig, "bc": BCConfig, "bcp": BCPConfig,
    "be_font": BEFontConfig, "style_gan": StyleGanConfig,
}

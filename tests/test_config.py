"""Config constants stay in sync with the model/loss modules."""

from vaeplay_tpu.models import bcp, bp
from vaeplay_tpu.models.bc import DEFAULT_MAX_POINTS
from vaeplay_tpu.models.be_font import LABEL_EMBED, NUM_CLASSES, STYLE_EMBED
from vaeplay_tpu.ops.losses import VALUE_WEIGHT
from vaeplay_tpu.utils.config import CONFIGS, BCConfig, BEFontConfig, BPConfig


def test_value_weight_single_source():
    assert VALUE_WEIGHT == bp.VALUE_WEIGHT == bcp.VALUE_WEIGHT == 10.0
    assert BPConfig().value_weight == VALUE_WEIGHT


def test_sample_count():
    assert BPConfig().sample_count == bp.SAMPLE_COUNT == 720


def test_max_points():
    assert BCConfig().max_points == DEFAULT_MAX_POINTS == 256


def test_font_embeds():
    cfg = BEFontConfig()
    assert cfg.label_embed == LABEL_EMBED == 256
    assert cfg.style_embed == STYLE_EMBED == 256
    assert cfg.num_classes == NUM_CLASSES == 143


def test_all_families_present():
    assert set(CONFIGS) == {"vae", "be", "be_gan", "bp", "bc", "bcp",
                            "be_font", "style_gan"}

from vaeplay_tpu.core import init, layers  # noqa: F401
from vaeplay_tpu.core.layers import (  # noqa: F401
    AddCoords,
    ConvBlock,
    DenseBlock,
    Down,
    SCSEBlock,
    SelfAttentionBlock,
    Up,
)

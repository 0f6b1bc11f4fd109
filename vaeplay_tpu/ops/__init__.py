from vaeplay_tpu.ops import attention, geometry, image, losses  # noqa: F401

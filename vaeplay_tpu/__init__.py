"""vaeplay_tpu — a TPU-native (JAX/XLA/pjit/Pallas) manga bubble & sound-effect
analysis/synthesis framework with the capabilities of kungyao/vae-play.

Layout (see SURVEY.md §7 for the design rationale):
  core/     layer library (flax.linen, NHWC), parameter initializers
  ops/      losses, geometry, image ops, Pallas kernels, contour tracing
  models/   the seven model families (vae_gan, be, be_gan, bp, bc, bcp,
            be_font, style_gan) as pure functional flax modules
  data/     host-side input pipelines (synthetic circles, bubble datasets,
            kana compositing) with double-buffered device prefetch
  parallel/ device-mesh construction and sharding rules (dp/tp over ICI)
  train/    fused multi-optimizer jit train steps, trainer loop, orbax ckpt
  eval/     batched inference incl. the manga-page crop/paste pipeline
  cli/      train_*/test_* entry points mirroring the reference CLI
"""

__version__ = "0.1.0"

"""Circle VAE-GAN — TPU-native rebuild of reference models/networks.py.

The namesake model: a VAE/GAN (Larsen et al., "Autoencoding beyond pixels")
over synthetic circle images, with an auxiliary head regressing encoded circle
parameters from z.  All four sub-networks (encoder / decoder / discriminator /
param head) live under one flax module so the fused train step can take
per-subnetwork gradients from a single forward (replacing the reference's five
`backward(retain_graph=True)` passes, train.py:68-78).

Reference citations:
  EncoderBlock      networks.py:10-30   (5x5 s2 conv no-bias + BN(m=0.9) + relu,
                                         optional pre-BN tap)
  DecoderBlock      networks.py:34-46   (5x5 s2 transpose-conv + BN + relu)
  Encoder           networks.py:49-81
  Decoder           networks.py:84-115
  DirectDecoder     networks.py:118-148 (plain linear stack, NO activations)
  Discriminator     networks.py:151-198 (REC feature tap / GAN sigmoid logit)
  VaeGan            networks.py:201-262
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vaeplay_tpu.core import init as vinit
from vaeplay_tpu.core.layers import ConvTransposeBlock

# torch BN momentum 0.9 (networks.py:16) → flax momentum = 1 - 0.9 = 0.1
_BN_MOMENTUM = 0.1


def _bn(train: bool, name: str):
    """BatchNorm that preserves the incoming activation dtype.

    flax BatchNorm normalizes in (at least) f32 and returns f32, which would
    silently upcast everything downstream of the first BN under the bf16
    mixed-precision policy; casting the output back keeps the compute chain
    in bf16 while the statistics math stays f32 (utils/amp.py)."""
    bn = nn.BatchNorm(
        use_running_average=not train, momentum=_BN_MOMENTUM, epsilon=1e-5, name=name
    )
    return lambda x: bn(x).astype(x.dtype)


class EncoderBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, out: bool = False
    ):
        conv = nn.Conv(
            self.features, (5, 5), strides=(2, 2), padding=((2, 2), (2, 2)),
            use_bias=False, kernel_init=vinit.vaegan_uniform(), name="conv",
        )(x)
        y = _bn(train, "bn")(conv)
        y = nn.relu(y)
        if out:
            return y, conv  # pre-BN tap (networks.py:18-25)
        return y


class DecoderBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = ConvTransposeBlock(
            self.features, 5, stride=2, padding=2, output_padding=1,
            use_bias=False, kernel_init=vinit.vaegan_uniform(transpose=True),
            name="conv",
        )(x)
        x = _bn(train, "bn")(x)
        return nn.relu(x)


class Encoder(nn.Module):
    z_size: int = 128
    iter_level: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        size = 64
        x = EncoderBlock(64, name="block0")(x, train=train)
        for i in range(1, self.iter_level):
            size *= 2
            x = EncoderBlock(size, name=f"block{i}")(x, train=train)
        x = x.reshape(x.shape[0], -1)  # (B, 8*8*size)
        x = nn.Dense(1024, use_bias=False, kernel_init=vinit.vaegan_uniform(),
                     name="fc")(x)
        x = _bn(train, "fc_bn")(x)
        x = nn.relu(x)
        mu = nn.Dense(self.z_size, kernel_init=vinit.vaegan_uniform(),
                      bias_init=vinit.zeros, name="l_mu")(x)
        logvar = nn.Dense(self.z_size, kernel_init=vinit.vaegan_uniform(),
                          bias_init=vinit.zeros, name="l_var")(x)
        return mu, logvar

    @property
    def final_size(self) -> int:
        return 64 * (2 ** (self.iter_level - 1))


class Decoder(nn.Module):
    size: int  # channel count at the 8x8 bottleneck (encoder.final_size)
    channel_out: int = 1
    iter_level: int = 3

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Dense(8 * 8 * self.size, use_bias=False,
                     kernel_init=vinit.vaegan_uniform(), name="fc")(z)
        x = _bn(train, "fc_bn")(x)
        x = nn.relu(x)
        # NHWC reshape: torch views to (B, size, 8, 8); channel-last here
        x = x.reshape(x.shape[0], self.size, 8, 8).transpose(0, 2, 3, 1)
        size = self.size
        x = DecoderBlock(size, name="block0")(x, train=train)
        for i in range(1, self.iter_level):
            size //= 2
            x = DecoderBlock(size, name=f"block{i}")(x, train=train)
        x = nn.Conv(self.channel_out, (5, 5), padding=((2, 2), (2, 2)),
                    kernel_init=vinit.vaegan_uniform(), bias_init=vinit.zeros,
                    name="out_conv")(x)
        return nn.sigmoid(x)


class DirectDecoder(nn.Module):
    """z → (radius, x, y) circle params; plain linear stack with no
    activations (networks.py:118-148) — outputs [r, xy] concatenated."""

    num_of_param: int = 3

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        d = lambda f, name: nn.Dense(f, kernel_init=vinit.vaegan_uniform(),
                                     bias_init=vinit.zeros, name=name)
        x = d(512, "head0")(z)
        x = d(256, "head1")(x)
        x = d(128, "head2")(x)
        x = d(64, "head3")(x)
        r = d(32, "r0")(x)
        r = d(1, "r1")(r)
        xy = d(32, "xy0")(x)
        xy = d(2, "xy1")(xy)
        return jnp.concatenate([r, xy], axis=-1)


class Discriminator(nn.Module):
    recon_level: int = 3
    iter_level: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True, mode: str = "REC"):
        """x is the concatenated (3B, H, W, C) [orig; pred; sampled] batch.

        mode "REC": runs up to recon_level and returns that block's pre-BN
        conv features flattened (networks.py:179-185).  mode "GAN": full pass
        + fc + sigmoid (networks.py:188-195).
        """
        h = nn.Conv(32, (5, 5), padding=((2, 2), (2, 2)),
                    kernel_init=vinit.vaegan_uniform(), bias_init=vinit.zeros,
                    name="stem")(x)
        h = nn.relu(h)
        size, channel_out = 32, 64
        tap = None
        for i in range(1, self.iter_level + 1):
            block = EncoderBlock(channel_out, name=f"block{i}")
            if i == self.recon_level and mode == "REC":
                h, conv_out = block(h, train=train, out=True)
                tap = conv_out.reshape(conv_out.shape[0], -1)
                return tap
            h = block(h, train=train)
            size = channel_out
            channel_out *= 2
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(512, use_bias=False, kernel_init=vinit.vaegan_uniform(),
                     name="fc0")(h)
        h = _bn(train, "fc_bn")(h)
        h = nn.relu(h)
        h = nn.Dense(1, kernel_init=vinit.vaegan_uniform(),
                     bias_init=vinit.zeros, name="fc1")(h)
        return nn.sigmoid(h)


class VaeGan(nn.Module):
    """Full VAE-GAN (networks.py:201-262).  iter_level = log2(img_size/8)."""

    img_size: int = 128
    z_size: int = 128
    num_of_param: int = 3
    channel_in: int = 1

    def setup(self):
        self.iter_level = int(math.log2(self.img_size // 8))
        self.encoder = Encoder(z_size=self.z_size, iter_level=self.iter_level)
        bottleneck = 64 * (2 ** (self.iter_level - 1))
        self.decoder = Decoder(size=bottleneck, channel_out=self.channel_in,
                               iter_level=self.iter_level)
        self.discriminator = Discriminator(recon_level=self.iter_level,
                                           iter_level=self.iter_level)
        self.param_encoder = DirectDecoder(num_of_param=self.num_of_param)

    def reparameterize(self, mu, logvar, eps=None):
        """z = mu + eps*exp(0.5*logvar), eps~N(0,1) (networks.py:228-231).
        `eps` overrides the sampled noise — deterministic-replay mode for
        trajectory-parity gates (SURVEY.md §7 'exact-parity RNG')."""
        std = jnp.exp(0.5 * logvar)
        if eps is None:
            eps = jax.random.normal(self.make_rng("noise"), std.shape, std.dtype)
        return mu + eps * std

    def __call__(self, x: jnp.ndarray, train: bool = True, noise=None):
        """Training forward (networks.py:233-247): returns
        (x_tilde, disc_class, disc_layer, mus, log_variances, params) where the
        disc_* tensors cover the concatenated [orig; pred; sampled] batch.

        noise=(eps, z_p) injects recorded noise for both stochastic sites
        (reparameterization and the prior sample) instead of drawing from the
        "noise" rng stream — the deterministic-replay mode trajectory-parity
        tests use to feed the reference and the rebuild identical draws."""
        b = x.shape[0]
        mus, log_variances = self.encoder(x, train=train)
        z = self.reparameterize(mus, log_variances,
                                eps=None if noise is None else noise[0])
        x_tilde = self.decoder(z, train=train)
        params = self.param_encoder(z)
        if noise is None:
            z_p = jax.random.normal(self.make_rng("noise"), (b, self.z_size),
                                    mus.dtype)  # keep the prior branch in the
        else:
            z_p = jnp.asarray(noise[1], mus.dtype)
        x_p = self.decoder(z_p, train=train)  # compute dtype under bf16 amp
        cat = jnp.concatenate([x, x_tilde, x_p], axis=0)
        disc_layer = self.discriminator(cat, train=train, mode="REC")
        disc_class = self.discriminator(cat, train=train, mode="GAN")
        return x_tilde, disc_class, disc_layer, mus, log_variances, params

    def generate(self, gen_size: int = 10):
        """Eval path with x=None: sample prior and decode (networks.py:249-252)."""
        z_p = jax.random.normal(self.make_rng("noise"), (gen_size, self.z_size))
        return self.decoder(z_p, train=False)

    def reconstruct(self, x: jnp.ndarray):
        """Eval path (networks.py:253-258): returns (x_tilde, params)."""
        mus, log_variances = self.encoder(x, train=False)
        z = self.reparameterize(mus, log_variances)
        return self.decoder(z, train=False), self.param_encoder(z)

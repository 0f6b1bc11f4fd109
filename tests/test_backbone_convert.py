"""Backbone weight conversion + torch-BN-semantics tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.models.backbone import ResNetFPN, convert_torchvision_state_dict
from vaeplay_tpu.utils.jitting import jit_init


def fake_resnet50_state_dict(rng):
    """Random arrays with torchvision resnet50 names/shapes (OIHW)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_c = 64
    for li, (width, blocks) in enumerate([(64, 3), (128, 4), (256, 6), (512, 3)], 1):
        for bi in range(blocks):
            p = f"layer{li}.{bi}"
            conv(f"{p}.conv1", width, in_c if bi == 0 else width * 4, 1)
            bn(f"{p}.bn1", width)
            conv(f"{p}.conv2", width, width, 3)
            bn(f"{p}.bn2", width)
            conv(f"{p}.conv3", width * 4, width, 1)
            bn(f"{p}.bn3", width * 4)
            if bi == 0:
                conv(f"{p}.downsample.0", width * 4, in_c, 1)
                bn(f"{p}.downsample.1", width * 4)
        in_c = width * 4
    return sd


def test_torchvision_conversion_transplants_and_changes_output():
    model = ResNetFPN()
    x = jnp.ones((1, 64, 64, 3)) * 0.3
    variables = jit_init(model, jax.random.PRNGKey(0), x)
    before = model.apply(variables, x)["0"]

    import flax

    params = flax.core.unfreeze(variables["params"])
    constants = flax.core.unfreeze(variables["constants"])
    sd = fake_resnet50_state_dict(np.random.default_rng(0))
    convert_torchvision_state_dict(sd, params, constants)
    after = model.apply({"params": params, "constants": constants}, x)["0"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # transplanted conv1 kernel matches the OIHW→HWIO transpose
    np.testing.assert_array_equal(
        np.asarray(params["body"]["conv1"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )
    # frozen-BN stats actually carried over
    np.testing.assert_array_equal(
        np.asarray(constants["body"]["bn1"]["mean"]), sd["bn1.running_mean"])


def test_frozen_bn_math():
    """FrozenBatchNorm computes (x - mean) * scale/sqrt(var+eps) + bias."""
    from vaeplay_tpu.models.backbone import FrozenBatchNorm

    m = FrozenBatchNorm(4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 3, 4)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    c = {
        "scale": jnp.asarray([1.0, 2.0, 0.5, 1.5]),
        "bias": jnp.asarray([0.0, 1.0, -1.0, 0.5]),
        "mean": jnp.asarray([0.1, -0.2, 0.3, 0.0]),
        "var": jnp.asarray([1.0, 0.5, 2.0, 1.0]),
    }
    y = m.apply({"constants": c}, x)
    expected = ((np.asarray(x) - np.asarray(c["mean"]))
                * np.asarray(c["scale"]) / np.sqrt(np.asarray(c["var"]) + 1e-5)
                + np.asarray(c["bias"]))
    np.testing.assert_allclose(np.asarray(y), expected, rtol=2e-5, atol=1e-5)


def test_batchnorm_momentum_matches_torch():
    """flax momentum 0.1 == torch BatchNorm momentum 0.9 (networks.py:16)."""
    torch = pytest.importorskip("torch")
    from vaeplay_tpu.models.vae_gan import _bn

    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, 4, 4, 3)).astype(np.float32) * 2 + 1

    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return _bn(True, "bn")(x)

    m = M()
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _, mut = m.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
    jmean = np.asarray(mut["batch_stats"]["bn"]["mean"])

    tbn = torch.nn.BatchNorm2d(3, momentum=0.9)
    tbn.train()
    tbn(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    tmean = tbn.running_mean.detach().numpy()
    np.testing.assert_allclose(jmean, tmean, rtol=1e-4, atol=1e-5)

import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.ops.geometry import (
    decode_circle_param,
    encode_circle_param,
    render_circle_batch,
    angle_between,
    rotate_vector,
)


def test_circle_codec_roundtrip():
    n = 128
    r = jnp.asarray([10.0, 30.0, 50.0])
    x = jnp.asarray([60.0, 40.0, 70.0])
    y = jnp.asarray([64.0, 90.0, 55.0])
    enc = encode_circle_param(n, r, x, y)
    dec = decode_circle_param(n, enc["radius"], enc["x"], enc["y"])
    np.testing.assert_allclose(np.asarray(dec["radius"]), np.asarray(r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dec["x"]), np.asarray(x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dec["y"]), np.asarray(y), rtol=1e-5)


def test_render_circle_matches_reference_numpy():
    """Device rendering == reference generate_circle_img (tools/utils.py:24-42)."""
    n, x, y, r = 32, 14, 18, 7
    sample = np.linspace(0, n - 1, n)
    xv, yv = np.meshgrid(sample, sample)
    res = (xv - x) ** 2 + (yv - y) ** 2
    expected = (res <= r * r).astype(np.float32)
    got = np.asarray(
        render_circle_batch(n, jnp.asarray([float(r)]), jnp.asarray([float(x)]), jnp.asarray([float(y)]))
    )[0, :, :, 0]
    np.testing.assert_array_equal(got, expected)


def test_angle_between():
    np.testing.assert_allclose(
        float(angle_between(jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 1, 0]))),
        np.pi / 2, rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(angle_between(jnp.asarray([1.0, 0, 0]), jnp.asarray([-1.0, 0, 0]))),
        np.pi, rtol=1e-6,
    )


def test_rotate_vector():
    rx, ry = rotate_vector(jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(np.pi / 2))
    np.testing.assert_allclose([float(rx), float(ry)], [0.0, 1.0], atol=1e-6)

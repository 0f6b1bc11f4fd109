"""BucketedPredictor: fixed-bucket serving for variable batch sizes
(eval/predictor.py).  Asserts result equivalence with direct per-row eval,
bucket/chunk arithmetic, and that distinct request sizes map onto a bounded
set of compiled shapes (the point of the wrapper: the manga serve path's
bubbles-per-page count must not trigger one XLA compile per page)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.eval.predictor import BucketedPredictor, next_bucket


def make_counting_step():
    """A per-sample jitted eval_step that records each traced batch shape."""
    traced = []

    @jax.jit
    def step(state, imgs):
        traced.append(imgs.shape[0])
        return {"masks": imgs * state["w"], "edges": imgs + state["w"]}

    return step, traced


def test_next_bucket():
    assert [next_bucket(n, 32) for n in (1, 2, 3, 4, 5, 8, 9, 31, 32)] == [
        1, 2, 4, 4, 8, 8, 16, 32, 32]
    with pytest.raises(AssertionError):
        next_bucket(33, 32)
    with pytest.raises(AssertionError):
        next_bucket(0, 32)


def test_matches_direct_eval_and_bounds_compiles():
    step, traced = make_counting_step()
    state = {"w": jnp.asarray(2.0)}
    pred = BucketedPredictor(step, state, max_batch=8)
    rng = np.random.default_rng(0)

    for n in (1, 3, 5, 3, 7, 2, 6, 5, 1, 4):
        imgs = rng.normal(size=(n, 4, 4, 3)).astype(np.float32)
        out = pred(imgs)
        assert out["masks"].shape == (n, 4, 4, 3)
        np.testing.assert_allclose(out["masks"], imgs * 2.0, rtol=1e-6)
        np.testing.assert_allclose(out["edges"], imgs + 2.0, rtol=1e-6)

    # ten distinct request sizes → only power-of-two shapes ever traced
    assert set(traced) <= {1, 2, 4, 8}
    assert pred.compiled_buckets <= {1, 2, 4, 8}


def test_chunks_oversize_requests():
    step, traced = make_counting_step()
    pred = BucketedPredictor(step, {"w": jnp.asarray(0.5)}, max_batch=4)
    imgs = np.arange(11 * 2 * 2 * 1, dtype=np.float32).reshape(11, 2, 2, 1)
    out = pred(imgs)
    np.testing.assert_allclose(out["masks"], imgs * 0.5, rtol=1e-6)
    assert out["masks"].shape[0] == 11
    # 11 = 4 + 4 + 3(pad→4): only the max_batch shape traced
    assert set(traced) == {4}

"""Exact large-array top-k (ops/_topk.py) vs jax.lax.top_k."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.ops._topk import top_k_2d


@pytest.mark.parametrize(
    "r,kk,k",
    [
        (1000, 91, 100),     # retinanet-like
        (9000, 91, 1000),    # P3-like (scaled)
        (64, 16, 5),
        (128, 1, 17),        # kk == 1 fallback
        (10, 91, 200),       # k >= r fallback
    ],
)
def test_matches_lax_topk(r, kk, k):
    rng = np.random.RandomState(r + kk + k)
    s = jnp.asarray(rng.rand(r, kk).astype(np.float32))
    v, i = top_k_2d(s, k)
    v_ref, i_ref = jax.lax.top_k(s.reshape(-1), k)
    # identical value multiset and identical index set (distinct values
    # here, so tie order cannot differ)
    np.testing.assert_allclose(np.sort(np.asarray(v)), np.sort(np.asarray(v_ref)))
    assert set(np.asarray(i).tolist()) == set(np.asarray(i_ref).tolist())
    # self-consistency: values really are scores[flat_index]
    np.testing.assert_array_equal(
        np.asarray(v), np.asarray(s.reshape(-1))[np.asarray(i)]
    )


def test_ties_still_return_k_valid_elements():
    """Degenerate detection case: many exact ties (sigmoid(0) = 0.5 rows
    from dead logits). The selected set must still be a legal top-k:
    every returned value >= the true k-th value, k entries, real
    positions."""
    rng = np.random.RandomState(0)
    s = np.full((500, 11), 0.5, np.float32)
    hot = rng.choice(500 * 11, 40, replace=False)
    s.reshape(-1)[hot] = rng.rand(40) + 1.0
    s = jnp.asarray(s)
    k = 100
    v, i = top_k_2d(s, k)
    v_ref, _ = jax.lax.top_k(s.reshape(-1), k)
    kth = float(np.asarray(v_ref)[-1])
    assert np.asarray(v).shape == (k,)
    assert (np.asarray(v) >= kth).all()
    np.testing.assert_array_equal(
        np.asarray(v), np.asarray(s.reshape(-1))[np.asarray(i)]
    )
    # the non-tied (distinct) head must match exactly
    np.testing.assert_allclose(np.asarray(v)[:40], np.asarray(v_ref)[:40])


def test_jit_and_grad_free():
    s = jnp.asarray(np.random.RandomState(1).rand(256, 8).astype(np.float32))
    v, i = jax.jit(lambda x: top_k_2d(x, 32))(s)
    assert v.shape == (32,) and i.shape == (32,)


def test_top_k_flat_matches_lax_topk():
    rng = np.random.RandomState(0)
    from vision_tpu.ops._topk import top_k_flat

    for n, k in [(129792, 1000), (90000, 1000), (2048, 100), (507, 100)]:
        x = jnp.asarray(rng.randn(n).astype(np.float32))
        want_v, want_i = jax.lax.top_k(x, k)
        got_v, got_i = top_k_flat(x, k)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v))
        # same set of indices (tie order may differ)
        assert set(np.asarray(got_i).tolist()) == set(
            np.asarray(want_i).tolist()
        )


def test_top_k_flat_with_duplicates_and_vmap():
    from vision_tpu.ops._topk import top_k_flat

    rng = np.random.RandomState(1)
    x = jnp.asarray(
        np.repeat(rng.randn(2, 512).astype(np.float32), 8, axis=1)
    )  # heavy exact ties, [2, 4096]
    got_v, got_i = jax.vmap(lambda a: top_k_flat(a, 64))(x)
    want_v, _ = jax.vmap(lambda a: jax.lax.top_k(a, 64))(x)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v))
    # returned indices must actually hold the returned values
    picked = jnp.take_along_axis(x, got_i, axis=1)
    np.testing.assert_allclose(np.asarray(picked), np.asarray(got_v))

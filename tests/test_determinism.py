"""Bitwise reproducibility (SURVEY §5: the reference gates nondeterministic
CUDA atomics behind torch.use_deterministic_algorithms; XLA is deterministic
by default — we verify it holds for our hot paths, incl. the roi_align
backward that is atomicAdd-nondeterministic in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_forward_bitwise_reproducible():
    from vision_tpu.models import resnet18

    m = resnet18(num_classes=10)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    f = jax.jit(lambda v, x: m.module.apply(v, x, train=False))
    a = np.asarray(f(m.variables, x))
    b = np.asarray(f(m.variables, x))
    np.testing.assert_array_equal(a, b)


def test_roi_align_backward_bitwise_reproducible():
    from vision_tpu.ops import roi_align

    feat = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 8), jnp.float32)
    # many overlapping rois: the reference's CUDA backward would scatter-add
    # nondeterministically here
    rois = jnp.asarray(
        [[0, 1, 1, 10, 10], [0, 2, 2, 11, 11], [0, 1.5, 1.5, 10.5, 10.5]],
        jnp.float32,
    )

    def loss(f):
        return jnp.sum(roi_align(f, rois, (4, 4), 1.0, 2) ** 2)

    g = jax.jit(jax.grad(loss))
    a = np.asarray(g(feat))
    b = np.asarray(g(feat))
    np.testing.assert_array_equal(a, b)


def test_dropout_reproducible_given_key():
    from vision_tpu.models import alexnet

    m = alexnet(num_classes=10)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    f = jax.jit(
        lambda v, x, k: m.module.apply(
            v, x, train=True, rngs={"dropout": k}
        )
    )
    k = jax.random.PRNGKey(7)
    np.testing.assert_array_equal(
        np.asarray(f(m.variables, x, k)), np.asarray(f(m.variables, x, k))
    )

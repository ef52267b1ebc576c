"""Batched auto-augment engine parity vs the per-sample path.

The engine (``v2/_batch_augment.py``) must reproduce the per-sample
``_apply_op`` semantics: bit-identical for every op except Rotate, which
uses the Paeth three-shear decomposition and is pinned to sample within
+-1 source pixel of the direct nearest warp.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_tpu.transforms.v2 import RandAugment, TrivialAugmentWide
from vision_tpu.transforms.v2 import functional as F
from vision_tpu.transforms.v2._batch_augment import (
    apply_ops_batched,
    max_shift_bound,
)

N, H, W = 6, 40, 40


def _imgs(seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, 256, (N, H, W, 3)), jnp.uint8)


def _coord_imgs():
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    one = np.stack([ii, jj, np.full_like(ii, 7)], -1)
    return jnp.asarray(np.broadcast_to(one[None], (N, H, W, 3)), jnp.uint8)


RA = RandAugment(magnitude=9)
SPACE = RA._augmentation_space(31, (H, W))
NAMES = list(SPACE.keys())
BOUND = max_shift_bound(SPACE, 9, (H, W))


def _forced(imgs, name, mag_value, rot90_needed=False, bound=H):
    # bound=H: forced magnitudes here can exceed the RA-bin-9 static bound;
    # the samplers themselves always pass max_shift_bound of their space
    op_idx = jnp.full((imgs.shape[0],), NAMES.index(name), jnp.int32)
    mags = {
        nm: jnp.full((imgs.shape[0],), 0.0, jnp.float32) for nm in NAMES
    }
    mags[name] = jnp.full((imgs.shape[0],), mag_value, jnp.float32)
    if name == "Posterize":
        mags[name] = jnp.full((imgs.shape[0],), mag_value, jnp.float32)
    return apply_ops_batched(
        imgs, op_idx, mags, NAMES, bound, rot90_needed=rot90_needed
    )


@pytest.mark.parametrize(
    "name,mag",
    [
        ("Identity", 0.0),
        ("ShearX", 0.09),
        ("ShearX", -0.09),
        ("ShearY", 0.09),
        ("TranslateX", 10.0),
        ("TranslateX", -7.0),
        ("TranslateY", 6.0),
        ("Brightness", 0.27),
        ("Brightness", -0.27),
        ("Color", 0.27),
        ("Contrast", 0.27),
        ("Sharpness", 0.27),
        ("Posterize", 5.0),
        ("Solarize", 174.0),
        ("AutoContrast", 0.0),
        ("Equalize", 0.0),
    ],
)
def test_engine_op_matches_per_sample(name, mag):
    imgs = _imgs()
    got = np.asarray(_forced(imgs, name, mag))
    # f32 scalar: the traced path computes magnitudes in f32 (mag * sign);
    # a python-float oracle would differ by one ulp in the blend ratio
    m = int(mag) if name == "Posterize" else jnp.float32(mag)
    want = np.stack(
        [np.asarray(RA._apply_op(imgs[i], name, m)) for i in range(N)]
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("deg", [9.0, -9.0, 25.0, 44.0])
def test_engine_rotate_within_one_pixel(deg):
    imgs = _coord_imgs()
    got = np.asarray(_forced(imgs, "Rotate", deg))[0].astype(np.int32)
    want = np.asarray(F.rotate(imgs[0], deg, "nearest")).astype(np.int32)
    both = (got[..., 2] == 7) & (want[..., 2] == 7)
    assert both.mean() > 0.7  # interiors overlap
    d = np.abs(got[..., :2] - want[..., :2])[both]
    assert d.max() <= 1, f"three-shear rotate drifted {d.max()}px"
    # and a decent fraction of pixels are bit-identical
    exact = (got == want).all(-1)[both].mean()
    assert exact > 0.5


@pytest.mark.parametrize("deg", [90.0, 180.0, 270.0, -90.0])
def test_engine_rot90_exact(deg):
    imgs = _imgs()
    got = np.asarray(_forced(imgs, "Rotate", deg, rot90_needed=True))
    want = np.stack(
        [np.asarray(F.rotate(imgs[i], deg, "nearest")) for i in range(N)]
    )
    np.testing.assert_array_equal(got, want)


def test_engine_rotate_135_close():
    imgs = _coord_imgs()
    got = np.asarray(
        _forced(imgs, "Rotate", 135.0, rot90_needed=True, bound=H)
    )[0].astype(np.int32)
    want = np.asarray(F.rotate(imgs[0], 135.0, "nearest")).astype(np.int32)
    both = (got[..., 2] == 7) & (want[..., 2] == 7)
    d = np.abs(got[..., :2] - want[..., :2])[both]
    assert d.max() <= 1


def test_randaugment_batched_matches_vmap():
    imgs = _imgs(3)
    key = jax.random.PRNGKey(42)
    ra = RandAugment(magnitude=9)
    got = np.asarray(jax.jit(ra.batched)(imgs, key))

    keys = jax.random.split(key, N)
    want = np.asarray(
        jax.jit(jax.vmap(lambda im, k: ra(im, key=k)))(imgs, keys)
    )
    # recompute the draws to know which samples hit Rotate in any slot
    def draws(k):
        ops = []
        for kk in jax.random.split(k, ra.num_ops):
            k1, _ = jax.random.split(kk)
            ops.append(jax.random.randint(k1, (), 0, len(NAMES)))
        return jnp.stack(ops)

    ops = np.asarray(jax.vmap(draws)(keys))
    rot = NAMES.index("Rotate")
    for i in range(N):
        if rot in ops[i]:
            # three-shear rotate: +-1px displacement -> on noise images a
            # minority of pixels move; displacement is pinned elsewhere
            frac = (got[i] == want[i]).mean()
            assert frac > 0.2, f"rotate sample {i} diverged: {frac}"
        else:
            np.testing.assert_array_equal(got[i], want[i], err_msg=f"i={i}")


def test_trivial_augment_batched_matches_vmap():
    imgs = _imgs(5)
    key = jax.random.PRNGKey(7)
    ta = TrivialAugmentWide()
    got = np.asarray(jax.jit(ta.batched)(imgs, key))
    keys = jax.random.split(key, N)
    want = np.asarray(
        jax.jit(jax.vmap(lambda im, k: ta(im, key=k)))(imgs, keys)
    )
    names = list(ta._augmentation_space(31).keys())

    def draws(k):
        k1, _, _ = jax.random.split(k, 3)
        return jax.random.randint(k1, (), 0, len(names))

    ops = np.asarray(jax.vmap(draws)(keys))
    rot = names.index("Rotate")
    for i in range(N):
        if ops[i] == rot:
            assert (got[i] == want[i]).mean() > 0.3
        else:
            np.testing.assert_array_equal(got[i], want[i], err_msg=f"i={i}")


@pytest.mark.slow
def test_augmix_batched_matches_vmap():
    from vision_tpu.transforms.v2 import AugMix

    imgs = _imgs(9)
    key = jax.random.PRNGKey(11)
    am = AugMix()
    got = np.asarray(jax.jit(am.batched)(imgs, key)).astype(np.int32)
    keys = jax.random.split(key, N)
    want = np.asarray(
        jax.jit(jax.vmap(lambda im, k: am(im, key=k)))(imgs, keys)
    ).astype(np.int32)
    # chains mix float images: non-Rotate chains are bit-identical, a
    # Rotate step shifts its chain's contribution by <=1 source pixel ->
    # bounded mixing-weight-scaled error. Allow a small count tolerance
    # on a minority of pixels.
    diff = np.abs(got - want)
    assert (diff == 0).mean() > 0.55, f"only {(diff == 0).mean()} exact"
    assert np.median(diff) == 0


def test_bucketed_color_stage_matches_batchwide():
    """N=64 activates color bucketing (capacity < N). Integer-exact ops
    (Posterize/Solarize/Invert/Equalize + all geometric) must match the
    batch-wide path (color_bucket=0) bitwise; float-blend ops may differ
    by <=1 uint8 count at a vanishing fraction of pixels (XLA contracts
    the blend with FMA differently in the gathered program — documented
    in the module docstring)."""
    from vision_tpu.transforms.v2._batch_augment import (
        _color_bucket_capacity,
    )

    n = 64
    assert 0 < _color_bucket_capacity(n, len(NAMES)) < n
    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.randint(0, 256, (n, 24, 24, 3)), jnp.uint8)
    op_idx_np = rng.randint(0, len(NAMES), (n,))
    op_idx = jnp.asarray(op_idx_np, jnp.int32)
    mags = {}
    for nm, (tab, signed) in SPACE.items():
        mag = float(tab[9]) if tab.ndim > 0 else 0.0
        sign = rng.choice([-1.0, 1.0], n).astype(np.float32)
        mags[nm] = jnp.asarray(mag * sign if signed else np.full(n, mag, np.float32))
    bound = max_shift_bound(SPACE, 9, (24, 24))
    got = np.asarray(
        apply_ops_batched(imgs, op_idx, mags, NAMES, bound)
    ).astype(np.int32)
    want = np.asarray(
        apply_ops_batched(imgs, op_idx, mags, NAMES, bound, color_bucket=0)
    ).astype(np.int32)
    blend = {"Brightness", "Color", "Contrast", "Sharpness", "AutoContrast"}
    d = np.abs(got - want)
    assert d.max() <= 1, f"bucketed stage drifted {d.max()} counts"
    assert (d > 0).mean() < 2e-3  # ulp flips only, not systematic
    exact = np.array(
        [NAMES[op_idx_np[b]] not in blend for b in range(n)]
    )
    np.testing.assert_array_equal(got[exact], want[exact])


def test_bucketed_color_overflow_falls_back_exactly():
    """Force every sample onto one bucketed op (count >> capacity): the
    lax.cond overflow fallback must produce the exact batch-wide result."""
    n = 64
    rng = np.random.RandomState(11)
    imgs = jnp.asarray(rng.randint(0, 256, (n, 24, 24, 3)), jnp.uint8)
    bound = max_shift_bound(SPACE, 9, (24, 24))
    for name, exact in (("Equalize", True), ("Sharpness", False)):
        op_idx = jnp.full((n,), NAMES.index(name), jnp.int32)
        mags = {
            nm: jnp.full((n,), 0.27 if nm == name else 0.0, jnp.float32)
            for nm in NAMES
        }
        got = np.asarray(
            apply_ops_batched(imgs, op_idx, mags, NAMES, bound)
        ).astype(np.int32)
        want = np.asarray(
            apply_ops_batched(imgs, op_idx, mags, NAMES, bound, color_bucket=0)
        ).astype(np.int32)
        if exact:  # integer pipeline: bitwise on every path
            np.testing.assert_array_equal(got, want)
        else:  # float blend inside lax.cond: <=1-count FMA flips allowed
            d = np.abs(got - want)
            assert d.max() <= 1 and (d > 0).mean() < 0.05


def test_bucketed_color_stage_jits():
    """The bucketed stage must trace cleanly under jit (lax.cond +
    scatter-drop) and agree with eager."""
    n = 32
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randint(0, 256, (n, 16, 16, 3)), jnp.uint8)
    op_idx = jnp.asarray(rng.randint(0, len(NAMES), (n,)), jnp.int32)
    mags = {
        nm: jnp.full((n,), float(tab[9]) if tab.ndim > 0 else 0.0, jnp.float32)
        for nm, (tab, _s) in SPACE.items()
    }
    bound = max_shift_bound(SPACE, 9, (16, 16))
    fn = lambda x: apply_ops_batched(x, op_idx, mags, NAMES, bound)  # noqa: E731
    np.testing.assert_array_equal(
        np.asarray(jax.jit(fn)(imgs)), np.asarray(fn(imgs))
    )


def test_rrc_batched_matches_vmapped_compose():
    """RandomResizedCrop.batched(+fused flip) must reproduce the vmapped
    Compose([RRC, RandomHorizontalFlip]) jit path — same RNG draw
    structure, pixels within 1 uint8 count (two-matmul resample vs
    four-gather lerp: f32 accumulation order only)."""
    from vision_tpu.transforms.v2 import (
        Compose,
        RandomHorizontalFlip,
        RandomResizedCrop,
    )

    n = 16
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 256, (n, 48, 48, 3)), jnp.uint8)
    rrc = RandomResizedCrop(32, antialias=True)
    pre = Compose([rrc, RandomHorizontalFlip(p=0.5)])
    key = jax.random.PRNGKey(21)

    @jax.jit
    def vmapped(x, k):
        keys = jax.random.split(k, n)
        return jax.vmap(lambda im, kk: pre(im, key=kk))(x, keys)

    got = np.asarray(
        jax.jit(lambda x, k: rrc.batched(x, k, flip_p=0.5))(raw, key)
    ).astype(np.int32)
    want = np.asarray(vmapped(raw, key)).astype(np.int32)
    assert got.shape == want.shape == (n, 32, 32, 3)
    d = np.abs(got - want)
    assert d.max() <= 1, f"batched RRC drifted {d.max()} counts"
    assert (d > 0).mean() < 0.02
    # at least one sample must actually be flipped for the fused-flip
    # path to be exercised (p=0.5 over 16 samples)
    got_noflip = np.asarray(
        jax.jit(lambda x, k: rrc.batched(x, k, flip_p=None))(raw, key)
    )
    assert not np.array_equal(got, got_noflip)


def test_rrc_batched_no_flip_matches_vmapped_rrc():
    from vision_tpu.transforms.v2 import RandomResizedCrop

    n = 8
    rng = np.random.RandomState(5)
    raw = jnp.asarray(rng.randint(0, 256, (n, 40, 56, 3)), jnp.uint8)
    rrc = RandomResizedCrop((24, 28), antialias=True)
    key = jax.random.PRNGKey(9)

    @jax.jit
    def vmapped(x, k):
        keys = jax.random.split(k, n)
        return jax.vmap(lambda im, kk: rrc(im, key=kk))(x, keys)

    got = np.asarray(jax.jit(rrc.batched)(raw, key)).astype(np.int32)
    want = np.asarray(vmapped(raw, key)).astype(np.int32)
    d = np.abs(got - want)
    assert d.max() <= 1 and (d > 0).mean() < 0.02

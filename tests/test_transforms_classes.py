"""Class transform behavior (reference ``test/test_transforms_v2.py``
check_transform contracts): param-consistency across leaves, probability
gates, shape semantics, MixUp/CutMix batch math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu import tv_tensors
from vision_tpu.transforms import v2 as T


def make_sample(rng, h=32, w=48):
    img = tv_tensors.Image((rng.rand(h, w, 3) * 255).astype(np.uint8))
    boxes = tv_tensors.BoundingBoxes(
        np.array([[4.0, 4.0, 20.0, 24.0], [10.0, 8.0, 30.0, 28.0]], np.float32),
        format="XYXY",
        canvas_size=(h, w),
    )
    mask = tv_tensors.Mask((rng.rand(h, w) > 0.5).astype(np.uint8))
    return {"image": img, "boxes": boxes, "mask": mask, "labels": np.array([1, 2])}


def test_resize_applies_to_all_leaves(rng):
    s = make_sample(rng)
    out = T.Resize((16, 24))(s, key=jax.random.PRNGKey(0))
    assert out["image"].shape == (16, 24, 3)
    assert out["mask"].shape == (16, 24)
    assert out["boxes"].canvas_size == (16, 24)
    np.testing.assert_allclose(
        np.asarray(out["boxes"].data)[0], [2, 2, 10, 12], atol=1e-4
    )
    np.testing.assert_array_equal(out["labels"], [1, 2])  # untouched


def test_random_crop_consistency(rng):
    s = make_sample(rng)
    out = T.RandomCrop(16)(s, key=jax.random.PRNGKey(1))
    assert out["image"].shape == (16, 16, 3)
    assert out["mask"].shape == (16, 16)
    assert out["boxes"].canvas_size == (16, 16)


def test_random_horizontal_flip_all_or_nothing(rng):
    s = make_sample(rng)
    for seed in range(8):
        out = T.RandomHorizontalFlip(p=0.5)(s, key=jax.random.PRNGKey(seed))
        img_flipped = not np.array_equal(
            np.asarray(out["image"].data), np.asarray(s["image"].data)
        )
        box_flipped = not np.allclose(
            np.asarray(out["boxes"].data), np.asarray(s["boxes"].data)
        )
        assert img_flipped == box_flipped  # geometry consistency


def test_random_resized_crop_output_size(rng):
    s = make_sample(rng)
    out = T.RandomResizedCrop(20, antialias=True)(s, key=jax.random.PRNGKey(2))
    assert out["image"].shape == (20, 20, 3)
    assert out["boxes"].canvas_size == (20, 20)


def test_compose_threads_keys(rng):
    s = make_sample(rng)
    pipeline = T.Compose(
        [
            T.RandomResizedCrop(16, antialias=True),
            T.RandomHorizontalFlip(0.5),
            T.ToDtype(jnp.float32, scale=True),
        ]
    )
    out1 = pipeline(s, key=jax.random.PRNGKey(3))
    out2 = pipeline(s, key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(
        np.asarray(out1["image"].data), np.asarray(out2["image"].data)
    )  # same key -> deterministic
    assert out1["image"].dtype == jnp.float32


def test_plain_array_treated_as_image_once(rng):
    img = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    arr2 = np.ones((4,), np.float32)
    out = T.Resize((4, 4))((jnp.asarray(img), jnp.asarray(arr2)), key=jax.random.PRNGKey(0))
    assert out[0].shape == (4, 4, 3)
    assert out[1].shape == (4,)  # second plain tensor untouched


def test_normalize_and_todtype(rng):
    img = tv_tensors.Image((rng.rand(4, 4, 3) * 255).astype(np.uint8))
    out = T.Compose(
        [T.ToDtype(jnp.float32, scale=True), T.Normalize([0.5] * 3, [0.5] * 3)]
    )(img, key=jax.random.PRNGKey(0))
    assert float(jnp.min(out.data)) >= -1.0 and float(jnp.max(out.data)) <= 1.0


def test_color_jitter_runs(rng):
    img = tv_tensors.Image((rng.rand(16, 16, 3) * 255).astype(np.uint8))
    out = T.ColorJitter(0.4, 0.4, 0.4, 0.1)(img, key=jax.random.PRNGKey(5))
    assert out.shape == img.shape
    assert out.dtype == img.dtype


def test_randaugment_trivial_augmix_run(rng):
    img = tv_tensors.Image((rng.rand(32, 32, 3) * 255).astype(np.uint8))
    for t in [
        T.RandAugment(),
        T.TrivialAugmentWide(),
        T.AugMix(),
        T.AutoAugment("imagenet"),
    ]:
        out = t(img, key=jax.random.PRNGKey(7))
        assert out.shape == img.shape, type(t).__name__
        assert out.dtype == img.dtype


def test_mixup(rng):
    imgs = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3])
    out_img, out_lbl = T.MixUp(alpha=1.0, num_classes=4)(
        (imgs, labels), key=jax.random.PRNGKey(11)
    )
    assert out_lbl.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(out_lbl).sum(axis=1), 1.0, atol=1e-5)
    # mixed image is a convex combination of img and rolled img
    lam = float(out_lbl[0, 0])
    expect = lam * np.asarray(imgs) + (1 - lam) * np.asarray(jnp.roll(imgs, 1, 0))
    np.testing.assert_allclose(np.asarray(out_img), expect, atol=1e-4)


def test_cutmix(rng):
    imgs = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3])
    out_img, out_lbl = T.CutMix(alpha=1.0, num_classes=4)(
        (imgs, labels), key=jax.random.PRNGKey(13)
    )
    assert out_lbl.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(out_lbl).sum(axis=1), 1.0, atol=1e-5)
    # pixels are either original or rolled
    orig = np.asarray(imgs)
    rolled = np.asarray(jnp.roll(imgs, 1, 0))
    got = np.asarray(out_img)
    is_orig = np.isclose(got, orig).all(axis=-1)
    is_rolled = np.isclose(got, rolled).all(axis=-1)
    assert (is_orig | is_rolled).all()


def test_random_erasing(rng):
    img = tv_tensors.Image(rng.rand(32, 32, 3).astype(np.float32))
    out = T.RandomErasing(p=1.0, value=0.0)(img, key=jax.random.PRNGKey(17))
    assert (np.asarray(out.data) == 0).any()


def test_sanitize_bounding_boxes_removes(rng):
    h = w = 32
    img = tv_tensors.Image(rng.rand(h, w, 3).astype(np.float32))
    boxes = tv_tensors.BoundingBoxes(
        np.array([[2, 2, 10, 10], [5, 5, 5.2, 5.2]], np.float32),
        format="XYXY",
        canvas_size=(h, w),
    )
    labels = np.array([1, 2])
    out = T.SanitizeBoundingBoxes()(
        {"image": img, "boxes": boxes, "labels": labels}, key=jax.random.PRNGKey(0)
    )
    assert out["boxes"].shape == (1, 4)
    np.testing.assert_array_equal(out["labels"], [1])


def test_random_zoom_out(rng):
    s = make_sample(rng)
    out = T.RandomZoomOut(p=1.0, side_range=(1.5, 2.0))(s, key=jax.random.PRNGKey(3))
    assert out["image"].shape[-3] > s["image"].shape[-3]
    assert out["boxes"].canvas_size == out["image"].shape[:2]


def test_uniform_temporal_subsample(rng):
    vid = tv_tensors.Video(rng.rand(10, 4, 4, 3).astype(np.float32))
    out = T.UniformTemporalSubsample(5)(vid, key=jax.random.PRNGKey(0))
    assert out.shape == (5, 4, 4, 3)


def test_to_image_and_pure_tensor(rng):
    import PIL.Image

    pil = PIL.Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8))
    out = T.ToImage()(pil)
    assert isinstance(out, tv_tensors.Image)
    assert out.shape == (8, 8, 3)
    pure = T.ToPureTensor()(out)
    assert isinstance(pure, jax.Array)


def test_presets_classification(rng):
    from vision_tpu.transforms import ImageClassification

    preset = ImageClassification(crop_size=224)
    img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    out = preset(jnp.asarray(img))
    assert out.shape == (224, 224, 3)
    assert out.dtype == jnp.float32


def test_preset_jits(rng):
    from vision_tpu.transforms import ImageClassification

    preset = ImageClassification(crop_size=64, resize_size=72)
    img = jnp.asarray((rng.rand(100, 120, 3) * 255).astype(np.uint8))
    jitted = jax.jit(preset.__call__)
    out = jitted(img)
    ref = preset(img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_train_augmentation_compose_jits(rng):
    """SURVEY 2.5 TPU plan: a full train-augmentation Compose (random crop
    + flip + color + normalize) compiles under ONE jit with an explicit
    PRNG key and is deterministic per key."""
    from vision_tpu.transforms import v2 as T

    pipeline = T.Compose(
        [
            T.RandomResizedCrop(32, antialias=True),
            T.RandomHorizontalFlip(p=0.5),
            T.ColorJitter(brightness=0.4, contrast=0.4, saturation=0.4),
            T.ToDtype(jnp.float32, scale=True),
            T.Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
        ]
    )
    img = jnp.asarray((rng.rand(64, 80, 3) * 255).astype(np.uint8))
    fn = jax.jit(lambda im, key: pipeline(im, key=key))
    k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    out1 = fn(img, k1)
    out1_again = fn(img, k1)
    out2 = fn(img, k2)
    assert out1.shape == (32, 32, 3) and out1.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out1_again))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # note: traced RandomResizedCrop uses the non-antialiased gather path
    # (data-dependent antialias kernel widths are not static-shape), so the
    # jitted values intentionally differ from eager antialiased output;
    # determinism-per-key and key-sensitivity above are the contracts.


def test_mixup_cutmix_jit_match_eager(rng):
    """MixUp/CutMix compile under jit and match the eager path bit-level
    (CutMix box select) / fp32-roundoff (MixUp blend)."""
    from vision_tpu.transforms import v2 as T

    imgs = jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32))
    labels = jnp.arange(8) % 10
    for t in (
        T.MixUp(alpha=0.2, num_classes=10),
        T.CutMix(alpha=1.0, num_classes=10),
    ):
        fn = jax.jit(lambda i, l, k, t=t: t((i, l), key=k))
        out_j = fn(imgs, labels, jax.random.PRNGKey(3))
        out_e = t((imgs, labels), key=jax.random.PRNGKey(3))
        np.testing.assert_allclose(
            np.asarray(out_j[0]), np.asarray(out_e[0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out_j[1]), np.asarray(out_e[1]), atol=1e-6
        )
        assert out_j[1].shape == (8, 10)


def test_randaugment_jits(rng):
    """RandAugment compiles under jit: op choice via lax.switch, traced
    sign, concrete per-bin magnitudes. Traced matches eager within one
    uint8 step (sign multiplication runs in f32 under trace vs python
    float64 eagerly, which can flip ties in the final rounding)."""
    from vision_tpu.transforms import v2 as T

    ra = T.RandAugment()
    img = jnp.asarray((rng.rand(64, 64, 3) * 255).astype(np.uint8))
    fn = jax.jit(lambda i, k: ra(i, key=k))
    for s in range(4):
        k = jax.random.PRNGKey(s)
        a = np.asarray(fn(img, k)).astype(np.int32)
        b = np.asarray(ra(img, key=k)).astype(np.int32)
        assert np.abs(a - b).max() <= 2, f"key {s}"
    # deterministic per key
    np.testing.assert_array_equal(
        np.asarray(fn(img, jax.random.PRNGKey(7))),
        np.asarray(fn(img, jax.random.PRNGKey(7))),
    )


def test_trivialaugment_jits(rng):
    """TrivialAugmentWide compiles under jit: traced op index via
    lax.switch, traced bin index into concrete magnitude tables, traced
    sign, and a traced-bits posterize. Matches eager within one uint8
    step (f32-vs-f64 factor rounding under trace)."""
    from vision_tpu.transforms import v2 as T

    ta = T.TrivialAugmentWide()
    img = jnp.asarray((rng.rand(64, 64, 3) * 255).astype(np.uint8))
    fn = jax.jit(lambda i, k: ta(i, key=k))
    for s in range(6):
        k = jax.random.PRNGKey(s)
        a = np.asarray(fn(img, k)).astype(np.int32)
        b = np.asarray(ta(img, key=k)).astype(np.int32)
        assert np.abs(a - b).max() <= 2, f"key {s}"
    np.testing.assert_array_equal(
        np.asarray(fn(img, jax.random.PRNGKey(11))),
        np.asarray(fn(img, jax.random.PRNGKey(11))),
    )


def test_jitted_uint8_pipeline_dtype_flow(rng):
    """Regression (round-2 review): the traced resized-crop must return
    the INTEGER input dtype so ToDtype(scale=True) rescales and
    Normalize sees [0,1] floats — the jitted pipeline used to push raw
    0-255 floats through, producing ~1000x-off activations."""
    from vision_tpu.transforms import v2 as T
    from vision_tpu.transforms.v2.functional import resized_crop_dynamic

    img = jnp.asarray((rng.rand(48, 48, 3) * 255).astype(np.uint8))
    out = jax.jit(
        lambda i: resized_crop_dynamic(
            i, jnp.float32(2), jnp.float32(3), jnp.float32(40),
            jnp.float32(40), (32, 32),
        )
    )(img)
    assert out.dtype == jnp.uint8

    pipe = T.Compose([
        T.RandomResizedCrop(32, antialias=True),
        T.ColorJitter(brightness=0.4, contrast=0.4, saturation=0.4,
                      hue=0.1),
        T.RandomErasing(p=1.0),
        T.ToDtype(jnp.float32, scale=True),
        T.Normalize(mean=[0.485, 0.456, 0.406],
                    std=[0.229, 0.224, 0.225]),
    ])
    k = jax.random.PRNGKey(5)
    jitted = np.asarray(jax.jit(lambda i, kk: pipe(i, key=kk))(img, k))
    eager = np.asarray(pipe(img, key=k))
    # params differ between traced/eager sampling; the CONTRACT is the
    # normalized value range (a dtype bug puts jit 100-1000x off)
    for arr in (jitted, eager):
        assert -4.0 < arr.min() and arr.max() < 4.0


@pytest.mark.slow
def test_augmix_jits(rng):
    """AugMix compiles under jit. With a STATIC chain depth the traced
    path consumes keys identically to the eager path, so outputs match
    within uint8 rounding (f32-vs-f64 magnitude math); with chain_depth
    -1 the traced path unrolls to depth 3 with gating (different key
    tree, distribution-equivalent) — checked for determinism only."""
    from vision_tpu.transforms import v2 as T

    img = jnp.asarray((rng.rand(48, 48, 3) * 255).astype(np.uint8))
    am = T.AugMix(chain_depth=2)
    fn = jax.jit(lambda i, k: am(i, key=k))
    for s in range(4):
        k = jax.random.PRNGKey(s)
        a = np.asarray(fn(img, k)).astype(np.int32)
        b = np.asarray(am(img, key=k)).astype(np.int32)
        d = np.abs(a - b)
        # f32-vs-f64 boundary ties can flip one op's sign/bin, which an
        # affine op spreads over a few pixels — bound the mass, not max
        assert d.mean() < 0.05 and (d > 2).mean() < 0.01, f"key {s}"

    am_dyn = T.AugMix()  # chain_depth=-1: traced depth via gating
    fn_dyn = jax.jit(lambda i, k: am_dyn(i, key=k))
    o1 = np.asarray(fn_dyn(img, jax.random.PRNGKey(9)))
    o2 = np.asarray(fn_dyn(img, jax.random.PRNGKey(9)))
    np.testing.assert_array_equal(o1, o2)
    assert (o1 != np.asarray(img)).any()

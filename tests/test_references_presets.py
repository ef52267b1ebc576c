"""Per-task reference support modules added for parity with the
reference's references/ layout: segmentation coco_utils + presets, video
presets, similarity loss/sampler/model."""

import importlib.util
import os
import sys

import numpy as np
import pytest

_REFS = os.path.join(os.path.dirname(__file__), "..", "references")


def _load(task, name):
    spec = importlib.util.spec_from_file_location(
        f"{task}_{name}", os.path.join(_REFS, task, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    # flax Module dataclass transform resolves cls.__module__ through
    # sys.modules, so the module must be registered before exec
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------------- segmentation --


def test_seg_convert_polys_merges_instances_with_ignore():
    cu = _load("segmentation", "coco_utils")
    img = np.zeros((20, 24, 3), np.uint8)
    anno = [
        {"category_id": 3, "segmentation": [[2, 2, 10, 2, 10, 10, 2, 10]]},
        {"category_id": 5, "segmentation": [[8, 8, 16, 8, 16, 16, 8, 16]]},
    ]
    _, target = cu.ConvertCocoPolysToMask()(img, anno)
    assert target.shape == (20, 24) and target.dtype == np.uint8
    assert target[4, 4] == 3 and target[14, 14] == 5
    assert target[9, 9] == 255  # overlap -> ignore
    assert target[0, 0] == 0


def test_seg_filter_and_remap():
    cu = _load("segmentation", "coco_utils")
    f = cu.FilterAndRemapCocoCategories([0, 5, 2], remap=True)
    img = np.zeros((4, 4, 3), np.uint8)
    anno = [
        {"category_id": 5, "segmentation": []},
        {"category_id": 99, "segmentation": []},
    ]
    _, out = f(img, anno)
    assert len(out) == 1 and out[0]["category_id"] == 1


def test_seg_train_preset_shapes_and_ignore_pad():
    presets = _load("segmentation", "presets")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (30, 40, 3)).astype(np.uint8)
    mask = rng.randint(0, 21, (30, 40)).astype(np.uint8)
    p = presets.SegmentationPresetTrain(base_size=32, crop_size=48)
    oi, om = p(img, mask, np.random.RandomState(1))
    assert oi.shape == (48, 48, 3) and oi.dtype == np.float32
    assert om.shape == (48, 48) and om.dtype == np.int32
    # base_size max resize is 2*32=64 > 48 sometimes, but when the resize
    # lands below the crop, the pad region must be 255-ignore in the mask
    seen_pad = any(
        (p(img, mask, np.random.RandomState(s))[1] == 255).any()
        for s in range(20)
    )
    assert seen_pad


def test_seg_eval_preset():
    presets = _load("segmentation", "presets")
    img = np.zeros((30, 40, 3), np.uint8)
    mask = np.zeros((30, 40), np.uint8)
    p = presets.SegmentationPresetEval(base_size=20)
    oi, om = p(img, mask)
    assert min(oi.shape[:2]) == 20 and om.shape == oi.shape[:2]


# -------------------------------------------------------------- video --


def test_video_presets():
    presets = _load("video_classification", "presets")
    rng = np.random.RandomState(0)
    clip = rng.randint(0, 256, (8, 40, 52, 3)).astype(np.uint8)
    tr = presets.VideoClassificationPresetTrain(
        crop_size=24, resize_size=32
    )
    out = tr(clip, np.random.RandomState(1))
    assert out.shape == (8, 24, 24, 3) and out.dtype == np.float32
    ev = presets.VideoClassificationPresetEval(crop_size=24, resize_size=32)
    out = ev(clip)
    assert out.shape == (8, 24, 24, 3)
    # normalized: roughly centered
    assert abs(float(out.mean())) < 3.0


# --------------------------------------------------------- similarity --


def test_similarity_losses():
    import jax.numpy as jnp

    loss = _load("similarity", "loss")
    # two tight clusters far apart -> zero loss under both strategies
    emb = jnp.asarray(
        [[0.0, 0.0], [0.1, 0.0], [10.0, 10.0], [10.1, 10.0]]
    )
    labels = jnp.asarray([0, 0, 1, 1])
    la, frac = loss.batch_all_triplet_loss(labels, emb, margin=0.5)
    lh, _ = loss.batch_hard_triplet_loss(labels, emb, margin=0.5)
    assert float(la) == 0.0 and float(lh) == 0.0 and float(frac) == 0.0
    # interleaved clusters -> positive loss, hard >= all
    emb = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.5, 0.0], [1.5, 0.0]])
    labels = jnp.asarray([0, 0, 1, 1])
    la, _ = loss.batch_all_triplet_loss(labels, emb, margin=1.0)
    lh, _ = loss.batch_hard_triplet_loss(labels, emb, margin=1.0)
    assert float(la) > 0 and float(lh) >= float(la) - 1e-6
    with pytest.raises(ValueError):
        loss.TripletMarginLoss(mining="bogus")


def test_similarity_pksampler_structure():
    sampler = _load("similarity", "sampler")
    labels = [0] * 5 + [1] * 5 + [2] * 2
    s = sampler.PKSampler(labels, p=2, k=3, seed=0, strict=True)
    assert 2 not in s.groups  # class with < k samples dropped (strict)
    batch = next(iter(s))
    assert len(batch) == 6
    ys = np.asarray(labels)[batch]
    vals, counts = np.unique(ys, return_counts=True)
    assert len(vals) == 2 and (counts == 3).all()


def test_similarity_embedding_model_normalized():
    import jax.numpy as jnp

    model = _load("similarity", "model")
    module, variables = model.build_embedding_model(
        "resnet18", embedding_dim=16
    )
    emb = module.apply(
        variables,
        jnp.asarray(
            np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32
        ),
    )
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-5
    )


# ------------------------------------------------------ depth / stereo --


def _load_stereo_utils():
    spec = importlib.util.spec_from_file_location(
        "stereo_utils",
        os.path.join(_REFS, "depth", "stereo", "utils.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_stereo_metrics():
    import jax.numpy as jnp

    u = _load_stereo_utils()
    gt = jnp.ones((1, 4, 4, 1)) * 10.0
    pred = gt.at[0, 0, 0, 0].add(2.5)  # one pixel off by 2.5
    m, n = u.compute_metrics(
        pred, gt, metrics=("epe", "bad1", "bad2", "rmse", "1px", "relepe")
    )
    assert float(n) == 16
    assert float(m["epe"]) == pytest.approx(2.5 / 16)
    assert float(m["bad1"]) == pytest.approx(1 / 16)
    assert float(m["bad2"]) == pytest.approx(1 / 16)
    assert float(m["1px"]) == pytest.approx(15 / 16)
    with pytest.raises(ValueError):
        u.compute_metrics(pred, gt, metrics=("nope",))
    # masking excludes the bad pixel entirely
    mask = jnp.ones((1, 4, 4, 1), bool).at[0, 0, 0, 0].set(False)
    m, n = u.compute_metrics(pred, gt, valid_mask=mask, metrics=("epe",))
    assert float(m["epe"]) == 0.0 and float(n) == 15


def test_stereo_losses():
    import jax.numpy as jnp
    import numpy as np

    u = _load_stereo_utils()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    # identical images -> ssim loss 0
    assert float(u.ssim_loss(img, img)) == pytest.approx(0.0, abs=1e-5)
    assert float(u.ssim_loss(img, 1.0 - img)) > 0.1
    # psnr: identical -> -inf-ish (clamped by eps), different -> larger
    assert float(u.psnr_loss(img, img)) < float(
        u.psnr_loss(img, img + 0.5)
    )
    # smoothness: constant field costs 0
    flat = jnp.ones((2, 16, 16, 1))
    assert float(u.smoothness_loss(img, flat)) == pytest.approx(0.0)
    # sequence loss weights later iterations more
    gt = jnp.zeros((2, 8, 8, 1))
    bad = jnp.ones((2, 8, 8, 1))
    early_bad = u.sequence_loss([bad, gt * 0], gt, gamma=0.5)
    late_bad = u.sequence_loss([gt * 0, bad], gt, gamma=0.5)
    assert float(late_bad) > float(early_bad)
    # consistency loss: identical sequence -> 0
    assert float(
        u.flow_sequence_consistency_loss([bad, bad, bad])
    ) == pytest.approx(0.0)


def test_stereo_input_padder():
    import jax.numpy as jnp

    u = _load_stereo_utils()
    x = jnp.ones((1, 30, 43, 3))
    p = u.InputPadder(x.shape)
    (xp,) = p.pad(x)
    assert xp.shape[1] % 8 == 0 and xp.shape[2] % 8 == 0
    assert p.unpad(xp).shape == x.shape
    p2 = u.InputPadder(x.shape, mode="kitti")
    (xp2,) = p2.pad(x)
    assert xp2.shape[1] % 8 == 0 and p2.unpad(xp2).shape == x.shape


# ------------------------------------------------- classification mix --


def test_classification_transforms_mixers():
    import jax
    import jax.numpy as jnp

    tr = _load("classification", "transforms")
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(4, 8, 8, 3), jnp.float32
    )
    labels = jnp.asarray([0, 1, 2, 3])
    m = tr.RandomMixUp(num_classes=5, p=1.0, alpha=1.0)
    oi, ol = m((imgs, labels), jax.random.PRNGKey(0))
    assert oi.shape == imgs.shape and ol.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(ol.sum(1)), 1.0, atol=1e-6)
    # p=0 -> identity images, one-hot labels
    m0 = tr.RandomCutMix(num_classes=5, p=0.0)
    oi, ol = m0((imgs, labels), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(oi), np.asarray(imgs))
    np.testing.assert_array_equal(
        np.asarray(ol.argmax(1)), np.asarray(labels)
    )
    assert tr.get_mixup_cutmix(
        mixup_alpha=0.0, cutmix_alpha=0.0, num_classes=5
    ) is None
    rc = tr.get_mixup_cutmix(
        mixup_alpha=0.2, cutmix_alpha=1.0, num_classes=5
    )
    oi, ol = rc((imgs, labels), key=jax.random.PRNGKey(2))
    assert ol.shape == (4, 5)

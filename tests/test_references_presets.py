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

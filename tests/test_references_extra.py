"""Segmentation / video / optical-flow / similarity reference layers:
pure-function units plus an end-to-end smoke step for each CLI's train
loop pieces."""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_REFS = os.path.join(os.path.dirname(__file__), "..", "references")
sys.path.insert(0, os.path.join(_REFS, "classification"))


def _load(name, subdir):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REFS, subdir, "train.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


seg = _load("seg_train", "segmentation")
vid = _load("vid_train", "video_classification")
flow = _load("flow_train", "optical_flow")
sim = _load("sim_train", "similarity")


def test_confusion_matrix_miou():
    cm = seg.ConfusionMatrix(3)
    target = np.asarray([0, 0, 1, 1, 2, 2])
    pred = np.asarray([0, 1, 1, 1, 2, 0])
    cm.update(target, pred)
    acc_global, acc, iou = cm.compute()
    np.testing.assert_allclose(acc_global, 4 / 6)
    # class 0: tp=1 fn=1 fp=1 -> iou 1/3; class 1: tp=2 fn=0 fp=1 -> 2/3
    np.testing.assert_allclose(iou[:2], [1 / 3, 2 / 3])
    np.testing.assert_allclose(acc, [0.5, 1.0, 0.5])


def test_seg_criterion_ignores_255():
    logits = jnp.zeros((1, 2, 2, 3))
    target = jnp.asarray([[[0, 255], [255, 255]]])
    loss = seg.criterion({"out": logits}, target, 3)
    # uniform logits -> CE = log(3) on the single valid pixel
    np.testing.assert_allclose(float(loss), np.log(3), rtol=1e-5)


def test_poly_lr():
    sched = seg.poly_lr_schedule(0.1, total_steps=100, power=0.9)
    np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 0.1 * 0.5**0.9, rtol=1e-6)
    assert float(sched(100)) == 0.0


def test_poly_lr_warmup_is_sequential():
    """Reference SequentialLR semantics: pure linear ramp during warmup
    (no poly decay mixed in), then poly decay over the REMAINING steps."""
    sched = seg.poly_lr_schedule(
        0.1, total_steps=100, power=0.9, warmup_iters=20, warmup_decay=0.5
    )
    # mid-warmup: exactly the linear ramp, undecayed
    np.testing.assert_allclose(
        float(sched(10)), 0.1 * (0.5 + 0.5 * 0.5), rtol=1e-6
    )
    # warmup end: full base lr (continuous handoff)
    np.testing.assert_allclose(float(sched(20)), 0.1, rtol=1e-6)
    # poly decays over the remaining 80 steps and reaches 0 at the end
    np.testing.assert_allclose(
        float(sched(60)), 0.1 * 0.5**0.9, rtol=1e-6
    )
    assert float(sched(100)) == 0.0


def test_video_accuracy_averages_clips():
    va = vid.VideoAccuracy(3)
    # video 0: two clips, averaged softmax favors class 1
    va.update([0, 0], np.asarray([[0.6, 0.4, 0.0], [0.0, 0.9, 0.1]]), [1, 1])
    va.update([1], np.asarray([[0.9, 0.1, 0.0]]), [2])
    assert va.compute() == 0.5


def test_sequence_loss_gamma_weighting():
    gt = jnp.ones((1, 2, 2, 2))
    pred_bad = jnp.zeros((1, 2, 2, 2))   # L1 = 2 per pixel
    pred_good = jnp.ones((1, 2, 2, 2))   # L1 = 0
    # final prediction weighted 1.0, earlier gamma=0.5
    loss = flow.sequence_loss([pred_bad, pred_good], gt, gamma=0.5)
    np.testing.assert_allclose(float(loss), 0.5 * 2.0, rtol=1e-6)
    loss2 = flow.sequence_loss([pred_good, pred_bad], gt, gamma=0.5)
    np.testing.assert_allclose(float(loss2), 1.0 * 2.0, rtol=1e-6)


def test_epe_metrics():
    gt = jnp.zeros((1, 1, 2, 2))
    pred = jnp.asarray([[[[0.5, 0.0], [4.0, 0.0]]]])  # epe 0.5 and 4.0
    m = flow.epe_metrics(pred, gt)
    np.testing.assert_allclose(float(m["epe"]), 2.25)
    np.testing.assert_allclose(float(m["1px"]), 0.5)
    np.testing.assert_allclose(float(m["5px"]), 1.0)


def test_triplet_loss_and_pk_sampler():
    # two tight clusters far apart -> zero loss at margin 1
    emb = jnp.asarray([[0.0, 0.0], [0.1, 0.0], [10.0, 0.0], [10.1, 0.0]])
    labels = jnp.asarray([0, 0, 1, 1])
    loss0, _ = sim.TripletMarginLoss(margin=1.0)(emb, labels)
    assert float(loss0) == 0.0
    # overlapping clusters -> positive loss
    emb2 = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.5, 0.0], [0.6, 0.0]])
    loss1, _ = sim.TripletMarginLoss(margin=1.0)(emb2, labels)
    assert float(loss1) > 0.0

    sampler = iter(sim.PKSampler(np.repeat(np.arange(5), 10), p=3, k=4))
    batch = next(sampler)
    assert len(batch) == 12
    ys = np.repeat(np.arange(5), 10)[batch]
    assert len(set(ys)) == 3
    counts = {y: list(ys).count(y) for y in set(ys)}
    assert all(c == 4 for c in counts.values())


@pytest.mark.slow
def test_segmentation_train_smoke():
    args = seg.get_args_parser().parse_args([
        "--model", "lraspp_mobilenet_v3_large", "--fake-data",
        "--epochs", "1", "--batch-size", "8", "--steps-per-epoch", "1",
        "--size", "32", "--num-classes", "3",
    ])
    seg.main(args)


@pytest.mark.slow
def test_optical_flow_train_smoke():
    args = flow.get_args_parser().parse_args([
        "--model", "raft_small", "--fake-data", "--epochs", "1",
        "--batch-size", "8", "--steps-per-epoch", "1", "--size", "64",
        "--num-flow-updates", "2",
    ])
    flow.main(args)


@pytest.mark.slow
def test_stereo_depth_losses_and_smoke():
    depth = _load("depth_train", os.path.join("depth", "stereo"))
    gt = jnp.full((1, 4, 4, 1), 2.0)
    perfect = jnp.stack(
        [jnp.full((1, 4, 4), -2.0), jnp.zeros((1, 4, 4))], axis=-1
    )
    assert float(depth.disparity_sequence_loss([perfect], gt)) == 0.0
    m = depth.d1_metrics(perfect, gt)
    assert float(m["epe"]) == 0.0 and float(m["d1"]) == 0.0
    # 4px error everywhere -> d1 = 1
    off = perfect.at[..., 0].add(4.0)
    m2 = depth.d1_metrics(off, gt)
    assert float(m2["epe"]) == 4.0 and float(m2["d1"]) == 1.0

    args = depth.get_args_parser().parse_args([
        "--fake-data", "--epochs", "1", "--batch-size", "8",
        "--steps-per-epoch", "1", "--size", "64", "--num-flow-updates", "2",
    ])
    depth.main(args)


@pytest.mark.slow
def test_detection_train_cli_smoke():
    det = _load("det_train", "detection")
    args = det.get_args_parser().parse_args([
        "--model", "retinanet_resnet50_fpn", "--fake-data", "--epochs", "1",
        "--batch-size", "2", "--steps-per-epoch", "1", "--size", "64",
        "--max-boxes", "4", "--num-classes", "5",
    ])
    det.main(args)
    sched = det.warmup_schedule(0.02, warmup_iters=100)
    np.testing.assert_allclose(float(sched(100)), 0.02, rtol=1e-6)
    assert float(sched(0)) < 0.001


@pytest.mark.slow
def test_detection_resume_restores_opt_state(tmp_path):
    """Resume restores optimizer state (momentum + warmup step count):
    the checkpoint carries opt_state and a resumed run loads it (the
    reference checkpoints optimizer + lr_scheduler, train.py:341-351)."""
    det = _load("det_train_resume", "detection")

    def argv(epochs, extra):
        return [
            "--model", "retinanet_resnet50_fpn", "--fake-data",
            "--epochs", str(epochs), "--batch-size", "2",
            "--steps-per-epoch", "1", "--size", "64", "--max-boxes", "4",
            "--num-classes", "5", *extra,
        ]

    out = str(tmp_path / "out")
    det.main(det.get_args_parser().parse_args(argv(1, ["--output-dir", out])))

    import utils as cls_utils

    ckpt = os.path.join(out, "checkpoint_0")
    assert "opt_state" in cls_utils.checkpoint_keys(ckpt)
    det.main(det.get_args_parser().parse_args(argv(2, ["--resume", ckpt])))


def test_phototour_layout(tmp_path):
    import os

    from PIL import Image

    from vision_tpu import datasets

    d = tmp_path / "fakeset"
    os.makedirs(d)
    # one 128x128 bmp = 4 patches
    grid = np.arange(128 * 128, dtype=np.uint8).reshape(128, 128)
    Image.fromarray(grid, "L").save(d / "patches0000.bmp")
    with open(d / "info.txt", "w") as f:
        f.write("0 0\n0 0\n1 0\n1 0\n")
    with open(d / "m50_100000_100000_0.txt", "w") as f:
        f.write("0 0 0 1 0 0 0\n0 0 0 2 1 0 0\n")
    train = datasets.PhotoTour(tmp_path, "fakeset", train=True)
    assert len(train) == 4
    assert train[0].shape == (64, 64, 1)
    test = datasets.PhotoTour(tmp_path, "fakeset", train=False)
    p1, p2, is_match = test[0]
    assert is_match == 1 and test[1][2] == 0
    np.testing.assert_array_equal(p1[..., 0], grid[:64, :64])


def test_segmentation_cli_real_voc_path(tmp_path):
    """_voc_batches over a synthetic VOC tree (real-data code path)."""
    import os

    from vision_tpu.io.image import write_png

    base = tmp_path / "VOCdevkit" / "VOC2012"
    os.makedirs(base / "JPEGImages")
    os.makedirs(base / "SegmentationClass")
    os.makedirs(base / "ImageSets" / "Segmentation")
    names = []
    for i in range(2):
        name = f"2007_{i:06d}"
        names.append(name)
        img = np.random.RandomState(i).randint(0, 255, (40, 60, 3), np.uint8)
        write_png(img, str(base / "JPEGImages" / f"{name}.jpg"))
        os.rename(
            base / "JPEGImages" / f"{name}.jpg",
            base / "JPEGImages" / f"{name}.jpg",
        )
        mask = np.random.RandomState(i).randint(0, 3, (40, 60, 1), np.uint8)
        write_png(mask, str(base / "SegmentationClass" / f"{name}.png"))
    with open(base / "ImageSets" / "Segmentation" / "train.txt", "w") as f:
        f.write("\n".join(names) + "\n")

    args = seg.get_args_parser().parse_args([
        "--data-path", str(tmp_path), "--batch-size", "2", "--size", "32",
    ])
    batches = list(seg._voc_batches(args, "train", True, seed=0))
    assert len(batches) == 1
    b = batches[0]
    assert b["image"].shape == (2, 32, 32, 3)
    assert b["target"].shape == (2, 32, 32) and b["target"].dtype == np.int32
    # class labels survive; 255 is the pad-if-smaller ignore fill that
    # the preset introduces (criterion masks it)
    vals = np.unique(b["target"])
    assert set(vals.tolist()) <= {0, 1, 2, 255}


def test_optical_flow_cli_real_chairs_path(tmp_path):
    import os

    from PIL import Image

    from vision_tpu.datasets._optical_flow import write_flo

    base = tmp_path / "FlyingChairs" / "data"
    os.makedirs(base)
    rng = np.random.RandomState(0)
    for i in (1, 2):
        for k in (1, 2):
            Image.fromarray(
                rng.randint(0, 255, (80, 96, 3), dtype=np.uint8)
            ).save(base / f"{i:05d}_img{k}.ppm")
        write_flo(
            rng.randn(80, 96, 2).astype(np.float32), base / f"{i:05d}_flow.flo"
        )
    np.savetxt(
        tmp_path / "FlyingChairs" / "FlyingChairs_train_val.txt", [1, 1],
        fmt="%d",
    )
    args = flow.get_args_parser().parse_args([
        "--data-path", str(tmp_path), "--batch-size", "2", "--size", "64",
    ])
    batches = list(flow._chairs_batches(args, "train", seed=0))
    assert len(batches) == 1
    b = batches[0]
    assert b["image1"].shape == (2, 64, 64, 3)
    assert b["flow"].shape == (2, 64, 64, 2)
    assert -1.0 <= b["image1"].min() and b["image1"].max() <= 1.0


def test_detection_cli_real_coco_path(tmp_path):
    import json
    import os

    from vision_tpu.io.image import write_png

    det = _load("det_train2", "detection")
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    images, annos = [], []
    for i in range(2):
        write_png(
            rng.randint(0, 255, (40, 60, 3), dtype=np.uint8),
            str(img_dir / f"{i:012d}.png"),
        )
        images.append(
            {"id": i, "file_name": f"{i:012d}.png", "height": 40, "width": 60}
        )
        annos.append(
            {"id": i, "image_id": i, "category_id": 1,
             "bbox": [5, 5, 20, 15], "area": 300, "iscrowd": 0}
        )
    ann_file = tmp_path / "ann.json"
    with open(ann_file, "w") as f:
        json.dump(
            {"images": images, "annotations": annos,
             "categories": [{"id": 1, "name": "thing"}]},
            f,
        )
    args = det.get_args_parser().parse_args([
        "--batch-size", "2", "--size", "64", "--max-boxes", "4",
    ])
    batches = list(det._coco_batches(args, str(ann_file), str(img_dir),
                                     train=False))
    assert len(batches) == 1
    b = batches[0]
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["boxes"].shape == (2, 4, 4) and b["valid"].sum() == 2
    # box scaled by 64/60
    np.testing.assert_allclose(
        b["boxes"][0, 0], np.asarray([5, 5, 25, 20]) * (64 / 60), atol=0.5
    )


def test_grouped_batch_sampler_and_canvases():
    """Aspect-ratio grouped batching (reference
    ``references/detection/group_by_aspect_ratio.py``): same-group batches,
    deterministic epoch length, per-group static canvases."""
    import sys

    sys.path.insert(0, "references/detection")
    from group_by_aspect_ratio import (
        GroupedBatchSampler,
        create_aspect_ratio_groups,
        group_canvas_sizes,
    )

    class FakeDS:
        # alternating portrait / landscape
        def __len__(self):
            return 10

        def get_height_and_width(self, i):
            return (100, 50) if i % 2 == 0 else (50, 100)

    groups = create_aspect_ratio_groups(FakeDS(), k=1)
    assert len(set(groups)) == 2
    sampler = GroupedBatchSampler(list(range(10)), groups, batch_size=2)
    batches = list(sampler)
    assert len(batches) == len(sampler) == 5
    for b in batches:
        assert len(b) == 2
        assert groups[b[0]] == groups[b[1]]  # same group per batch

    sizes = group_canvas_sizes(1, short_side=96, long_side=160)
    assert all(h % 32 == 0 and w % 32 == 0 for h, w in sizes)
    assert len(sizes) == 4  # 2k+2 groups
    assert sizes[0][0] > sizes[0][1]  # most-portrait group is tall


def test_detection_coco_batches_grouped(tmp_path):
    """_coco_batches end to end: synthetic COCO tree -> grouped batches with
    per-group canvases + preset augmentation + padded GT."""
    import json
    import os
    import sys

    sys.path.insert(0, "references/detection")
    import numpy as np

    from vision_tpu.io.image import write_png

    root = tmp_path / "imgs"
    os.makedirs(root)
    images, annos = [], []
    for i, (h, w) in enumerate([(40, 80), (80, 40), (40, 80), (80, 40)]):
        name = f"{i:06d}.png"
        write_png(
            np.full((h, w, 3), 100, np.uint8), str(root / name)
        )
        images.append(
            {"id": i, "file_name": name, "height": h, "width": w}
        )
        annos.append(
            {"id": i, "image_id": i, "category_id": 1,
             "bbox": [5, 5, 20, 10], "area": 200, "iscrowd": 0}
        )
    ann_file = tmp_path / "ann.json"
    with open(ann_file, "w") as f:
        json.dump(
            {"images": images, "annotations": annos,
             "categories": [{"id": 1, "name": "thing"}]},
            f,
        )

    from train import _coco_batches, get_args_parser

    args = get_args_parser().parse_args(
        ["--batch-size", "2", "--size", "64", "--max-boxes", "8",
         "--aspect-ratio-group-factor", "1"]
    )
    batches = list(
        _coco_batches(args, str(ann_file), str(root), train=True, seed=0)
    )
    assert len(batches) == 2
    shapes = {b["image"].shape[1:3] for b in batches}
    assert len(shapes) == 2  # two groups -> two distinct static canvases
    for b in batches:
        assert b["image"].shape[0] == 2
        assert b["boxes"].shape == (2, 8, 4)
        assert b["valid"].any()
        # boxes stay inside the canvas
        h, w = b["image"].shape[1:3]
        assert (b["boxes"][..., 2] <= w + 1e-3).all()
        assert (b["boxes"][..., 3] <= h + 1e-3).all()


@pytest.mark.slow
def test_detection_test_only_coco_eval(tmp_path):
    """--test-only: synthetic COCO val tree -> engine.evaluate_detection ->
    mAP dict (plumbing + metric protocol, random weights)."""
    import json
    import os
    import sys

    sys.path.insert(0, "references/detection")
    import numpy as np

    from vision_tpu.io.image import write_png

    root = tmp_path / "val2017"
    ann_dir = tmp_path / "annotations"
    os.makedirs(root)
    os.makedirs(ann_dir)
    images, annos = [], []
    for i in range(3):
        name = f"{i:012d}.jpg"
        write_png(
            np.full((60, 80, 3), 120, np.uint8), str(root / name.replace(".jpg", ".png"))
        )
        os.rename(root / name.replace(".jpg", ".png"), root / name)
        images.append({"id": i, "file_name": name, "height": 60, "width": 80})
        annos.append(
            {"id": i, "image_id": i, "category_id": 1,
             "bbox": [10, 10, 30, 20], "area": 600, "iscrowd": 0}
        )
    with open(ann_dir / "instances_val2017.json", "w") as f:
        json.dump(
            {"images": images, "annotations": annos,
             "categories": [{"id": 1, "name": "thing"}]},
            f,
        )

    from train import get_args_parser, run_coco_eval

    from vision_tpu.models import get_model
    from vision_tpu.models._utils import fast_init

    args = get_args_parser().parse_args(
        ["--model", "retinanet_resnet50_fpn", "--data-path", str(tmp_path),
         "--batch-size", "2", "--size", "64", "--test-only"]
    )
    with fast_init():
        model = get_model(args.model)
    metrics = run_coco_eval(args, model)
    assert "map" in metrics and 0.0 <= metrics["map"] <= 1.0


def test_detection_coco_batches_with_masks(tmp_path):
    """--with-masks on the REAL COCO path (round-2 review: it used to be
    a silent fake-data-only no-op): batches carry (N, G, H, W) masks that
    went through the same preset geometry as the boxes."""
    import json
    import os
    import sys

    sys.path.insert(0, "references/detection")
    import numpy as np

    from vision_tpu.io.image import write_png

    root = tmp_path / "imgs"
    os.makedirs(root)
    images, annos = [], []
    for i in range(2):
        name = f"{i:06d}.png"
        write_png(np.full((40, 80, 3), 100, np.uint8), str(root / name))
        images.append(
            {"id": i, "file_name": name, "height": 40, "width": 80}
        )
        annos.append(
            {"id": i, "image_id": i, "category_id": 1,
             "bbox": [10, 10, 30, 20], "area": 600, "iscrowd": 0,
             "segmentation": [[10, 10, 40, 10, 40, 30, 10, 30]]}
        )
    ann_file = tmp_path / "ann.json"
    with open(ann_file, "w") as f:
        json.dump(
            {"images": images, "annotations": annos,
             "categories": [{"id": 1, "name": "thing"}]},
            f,
        )

    from train import _coco_batches, get_args_parser

    args = get_args_parser().parse_args(
        ["--batch-size", "2", "--size", "64", "--max-boxes", "4",
         "--aspect-ratio-group-factor", "0", "--with-masks",
         "--data-augmentation", "hflip"]
    )
    (batch,) = list(
        _coco_batches(args, str(ann_file), str(root), train=True, seed=0)
    )
    assert "masks" in batch
    n, g = batch["boxes"].shape[:2]
    h, w = batch["image"].shape[1:3]
    assert batch["masks"].shape == (n, g, h, w)
    for i in range(n):
        for j in range(g):
            if not batch["valid"][i, j]:
                assert batch["masks"][i, j].sum() == 0
                continue
            ys, xs = np.nonzero(batch["masks"][i, j])
            x1, y1, x2, y2 = batch["boxes"][i, j]
            # mask support sits inside the (augmented) box, +-1 px
            assert xs.min() >= x1 - 1 and xs.max() <= x2 + 1
            assert ys.min() >= y1 - 1 and ys.max() <= y2 + 1


@pytest.mark.slow
def test_detection_trainable_backbone_layers_freeze():
    """--trainable-backbone-layers N freezes body stages outside the last
    N (the reference's requires_grad_(False), backbone_utils.py) while FPN
    and heads train."""
    import importlib.util
    import os as _os
    import types

    import numpy as np
    import optax

    import jax
    import jax.numpy as jnp

    def load(name, rel):
        spec = importlib.util.spec_from_file_location(
            name,
            _os.path.join(_os.path.dirname(__file__), "..", "references",
                          "detection", rel),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    train = load("_det_train_t", "train.py")
    engine = load("_det_engine_t", "engine.py")
    from vision_tpu.models import get_model
    from vision_tpu.models._utils import fast_init

    with fast_init():
        m = get_model("retinanet_resnet50_fpn", num_classes=5)
    args = types.SimpleNamespace(
        opt="sgd", lr=0.1, momentum=0.9, weight_decay=1e-4,
        norm_weight_decay=None, warmup_iters=1,
        trainable_backbone_layers=1,
    )
    params = m.variables["params"]
    tx = train.make_tx(args, params)
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(grads, st, params)

    def max_abs(tree):
        return max(
            float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(tree)
        )

    body = upd["backbone"]["body"]
    # frozen stages get exactly-zero updates
    for k in ("conv1", "layer1.0", "layer2.0", "layer3.0"):
        assert max_abs(body[k]) == 0.0, k
    # trainable stage + fpn + head get real updates
    assert max_abs(body["layer4.0"]) > 0
    assert max_abs(upd["backbone"]["fpn"]) > 0
    assert max_abs(upd["head"]) > 0
    # and the full train step accepts the masked tx (structure smoke)
    step, extra = engine.make_detection_train_step(
        m.module, tx, one_stage=True, variables=m.variables
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32),
        "boxes": jnp.asarray([[[4, 4, 30, 30]]], jnp.float32),
        "labels": jnp.ones((1, 1), jnp.int32),
        "valid": jnp.ones((1, 1), bool),
    }
    opt_state = tx.init(params)
    params2, extra, opt_state, total, losses = step(
        params, extra, opt_state, batch, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(total))

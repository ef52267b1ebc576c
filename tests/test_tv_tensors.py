"""Typed container behavior (reference ``test/test_tv_tensors.py``):
metadata survival through pytrees, unwrap-on-op semantics, wrap()."""

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors


def test_image_wraps_and_unwraps():
    img = tv_tensors.Image(np.zeros((4, 4, 3), np.float32))
    assert img.shape == (4, 4, 3)
    out = img + 1.0  # ops unwrap to plain arrays
    assert isinstance(out, jax.Array)
    assert not isinstance(out, tv_tensors.TVTensor)


def test_image_2d_promotes_channel():
    img = tv_tensors.Image(np.zeros((4, 4), np.float32))
    assert img.shape == (4, 4, 1)


def test_bounding_boxes_metadata():
    bb = tv_tensors.BoundingBoxes(
        np.zeros((5, 4), np.float32), format="XYXY", canvas_size=(10, 20)
    )
    assert bb.format is tv_tensors.BoundingBoxFormat.XYXY
    assert bb.canvas_size == (10, 20)
    assert not bb.is_rotated


def test_pytree_roundtrip_preserves_metadata():
    bb = tv_tensors.BoundingBoxes(
        np.ones((5, 4), np.float32), format="XYWH", canvas_size=(10, 20)
    )
    leaves, treedef = jax.tree_util.tree_flatten(bb)
    assert len(leaves) == 1
    bb2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(bb2, tv_tensors.BoundingBoxes)
    assert bb2.format is tv_tensors.BoundingBoxFormat.XYWH
    assert bb2.canvas_size == (10, 20)


def test_containers_flow_through_jit():
    bb = tv_tensors.BoundingBoxes(
        np.ones((5, 4), np.float32), format="XYXY", canvas_size=(10, 20)
    )

    @jax.jit
    def f(b):
        return tv_tensors.wrap(b.data * 2, like=b)

    out = f(bb)
    assert isinstance(out, tv_tensors.BoundingBoxes)
    assert out.canvas_size == (10, 20)
    np.testing.assert_allclose(np.asarray(out.data), 2.0)


def test_wrap_override():
    bb = tv_tensors.BoundingBoxes(
        np.ones((5, 4), np.float32), format="XYXY", canvas_size=(10, 20)
    )
    out = tv_tensors.wrap(bb.data, like=bb, canvas_size=(5, 5))
    assert out.canvas_size == (5, 5)
    assert out.format is tv_tensors.BoundingBoxFormat.XYXY


def test_indexing_preserves_type():
    kp = tv_tensors.KeyPoints(np.zeros((3, 17, 2), np.float32), canvas_size=(8, 8))
    sub = kp[0]
    assert isinstance(sub, tv_tensors.KeyPoints)
    assert sub.canvas_size == (8, 8)


def test_jnp_consumes_containers():
    img = tv_tensors.Image(np.ones((2, 2, 3), np.float32))
    s = jnp.sum(img)
    assert float(s) == 12.0


def test_wrap_dataset_for_transforms_v2(tmp_path):
    import json
    import os

    import numpy as np

    from vision_tpu import datasets, tv_tensors
    from vision_tpu.io.image import write_png

    root = tmp_path / "imgs"
    os.makedirs(root)
    write_png(np.zeros((10, 12, 3), np.uint8), str(root / "000001.png"))
    ann = {
        "images": [{"id": 1, "file_name": "000001.png", "height": 10, "width": 12}],
        "annotations": [
            {"id": 7, "image_id": 1, "category_id": 3,
             "bbox": [1, 2, 4, 5], "area": 20, "iscrowd": 0}
        ],
        "categories": [{"id": 3, "name": "cat"}],
    }
    ann_file = tmp_path / "ann.json"
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    ds = datasets.CocoDetection(str(root), str(ann_file))
    wrapped = datasets.wrap_dataset_for_transforms_v2(ds)
    img, target = wrapped[0]
    assert isinstance(img, tv_tensors.Image)
    assert isinstance(target["boxes"], tv_tensors.BoundingBoxes)
    np.testing.assert_array_equal(np.asarray(target["boxes"].data), [[1, 2, 5, 7]])
    np.testing.assert_array_equal(target["labels"], [3])
    assert target["boxes"].canvas_size == (10, 12)

    # the wrapped boxes flow through a v2 geometric transform
    from vision_tpu.transforms import v2
    import jax

    out_img, out_target = v2.RandomHorizontalFlip(p=1.0)(
        (img, target), key=jax.random.PRNGKey(0)
    )
    np.testing.assert_array_equal(
        np.asarray(out_target["boxes"].data), [[12 - 5, 2, 12 - 1, 7]]
    )

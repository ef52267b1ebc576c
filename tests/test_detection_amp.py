"""Mixed-precision (--amp, bf16) detection eval: box-coordinate math is
an f32-registered op.

The reference registers the box/roi ops at f32 under autocast
(``torchvision/csrc/ops/autocast/``) so fp16 convs never degrade box
coordinates (fp16/bf16 resolve ~1-3 px at an 800 px canvas). Our seam
is the coder/NMS entry casts: ``BoxCoder.decode`` / ``BoxLinearCoder
.decode`` / ``nms_mask`` promote to f32 regardless of input dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models.detection._utils import BoxCoder, BoxLinearCoder

jax.config.update("jax_platforms", "cpu")


def _rand_boxes(rng, n, lo=0.0, hi=800.0):
    x1 = rng.rand(n) * (hi - lo - 50) + lo
    y1 = rng.rand(n) * (hi - lo - 50) + lo
    w = rng.rand(n) * 200 + 4
    h = rng.rand(n) * 200 + 4
    return np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)


def test_box_coder_decode_promotes_bf16_to_f32():
    rng = np.random.RandomState(0)
    coder = BoxCoder((1.0, 1.0, 1.0, 1.0))
    anchors = jnp.asarray(_rand_boxes(rng, 64))
    deltas32 = jnp.asarray(rng.randn(64, 4).astype(np.float32) * 0.3)
    out32 = coder.decode(deltas32, anchors)
    out16 = coder.decode(deltas32.astype(jnp.bfloat16), anchors)
    assert out32.dtype == jnp.float32
    assert out16.dtype == jnp.float32
    # only the bf16 quantization of the *deltas* remains (~0.4% of box
    # size), never a bf16-resolution loss on absolute coordinates
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), atol=2.0
    )
    # absolute-coordinate precision: decoding identical f32 deltas against
    # bf16 anchors must NOT quantize the anchors (anchor grid at x~800
    # quantizes to 4 px in bf16)
    out_a16 = coder.decode(deltas32, anchors.astype(jnp.bfloat16))
    assert out_a16.dtype == jnp.float32


def test_linear_coder_decode_promotes_bf16_to_f32():
    rng = np.random.RandomState(1)
    coder = BoxLinearCoder()
    anchors = jnp.asarray(_rand_boxes(rng, 32))
    rel32 = jnp.asarray(rng.rand(32, 4).astype(np.float32))
    out32 = coder.decode(rel32, anchors)
    out16 = coder.decode(rel32.astype(jnp.bfloat16), anchors)
    assert out32.dtype == jnp.float32 and out16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32), atol=2.0)


def test_frcnn_bf16_eval_end_to_end():
    """amp_vars-style bf16 eval through a whole two-stage pipeline:
    finite, boxes f32 inside the canvas, and score-parity with the f32
    run at bf16-appropriate tolerance."""
    from vision_tpu.models import get_model
    from vision_tpu.models._utils import fast_init

    with fast_init():
        m = get_model("fasterrcnn_mobilenet_v3_large_320_fpn")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    det32 = m.module.apply(m.variables, x, train=False)

    v16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32
        else a,
        m.variables,
    )
    det16 = m.module.apply(v16, x.astype(jnp.bfloat16), train=False)

    assert det16.boxes.dtype == jnp.float32
    b = np.asarray(det16.boxes)
    assert np.isfinite(b).all()
    assert (b >= -1e-3).all() and (b <= 64 + 1e-3).all()
    # random-weight logits are near-uniform, so exact ordering differs;
    # the top scores of both runs must still live in the same range
    s32 = np.sort(np.asarray(det32.scores).ravel())[-5:]
    s16 = np.sort(np.asarray(det16.scores, np.float32).ravel())[-5:]
    np.testing.assert_allclose(s16, s32, atol=0.05)

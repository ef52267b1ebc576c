"""Weight-meta validation for EVERY weights entry (reference
``test/test_extended_models.py`` + ``common_extended_utils.py:33-113``):

* every entry carries the reference's published ``_ops`` (GMACs) and
  ``_file_size`` (MB) meta;
* ``_file_size`` is consistent with ``num_params`` (the reference torch
  checkpoint stores float32 params, ~4 bytes each + container overhead);
* for classification families, ``_ops`` is checked against FLOPs
  measured from the compiled XLA executable — no hand-maintained
  per-op counter table (slow sweep).
"""

import jax
import numpy as np
import pytest

from vision_tpu.models import get_model, get_model_weights, list_models
from vision_tpu.models._ops_count import count_gmacs
from vision_tpu.models._utils import fast_init
from vision_tpu.transforms._presets import ImageClassification


def _all_entries():
    out = []
    for name in list_models():
        try:
            enum = get_model_weights(name)
        except ValueError:
            continue  # quantized builders share the float enum upstream
        for member in enum:
            out.append((name, member))
    return out


_ENTRIES = _all_entries()
_IDS = [f"{n}:{m.name}" for n, m in _ENTRIES]


def test_every_entry_has_ops_and_file_size():
    missing = [
        f"{n}:{m.name}"
        for n, m in _ENTRIES
        if "_ops" not in m.meta or "_file_size" not in m.meta
    ]
    assert not missing, f"{len(missing)} entries missing meta: {missing[:8]}"


@pytest.mark.parametrize("name,member", _ENTRIES, ids=_IDS)
def test_file_size_consistent_with_num_params(name, member):
    meta = member.meta
    n_params = meta["num_params"]
    file_mb = meta["_file_size"]
    # float32 torch checkpoint: ~4 bytes/param + zip/pickle overhead.
    # Detection/segmentation checkpoints carry extra buffers; quantized
    # ones are ~1 byte/param — keep a generous band around 4 B/param.
    bytes_per_param = file_mb * 1024 * 1024 / n_params
    if name == "googlenet":
        # checkpoint stores the aux-classifier branches that num_params
        # (eval net) excludes -> ~7.9 B/param
        assert 6.0 < bytes_per_param < 9.0
        return
    assert 0.7 < bytes_per_param < 6.0, (
        f"{name}:{member.name}: {bytes_per_param:.2f} B/param "
        f"({file_mb} MB / {n_params} params)"
    )


def _classification_entries():
    seen = set()
    out = []
    for name, member in _ENTRIES:
        if name in seen or name.startswith("quantized_"):
            continue
        tf = member.transforms()
        if isinstance(tf, ImageClassification):
            seen.add(name)
            out.append((name, member, tf.crop_size))
    return out


_CLS = _classification_entries()


# The reference counter bills ONLY mm/addmm/bmm/conv/sdpa
# (common_extended_utils.py:150-160); XLA cost_analysis bills EVERY flop
# (softmax, gelu, layernorm, bias tables). Window-attention models run
# many small-seq attentions, so their non-matmul share is larger — give
# them headroom the way the reference gives per-model tolerances
# (test/test_models.py:699-703).
_OPS_TOL = {"maxvit_t": 0.16}


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,member,crop", _CLS, ids=[c[0] for c in _CLS]
)
def test_ops_meta_matches_xla_measured(name, member, crop):
    meta_ops = member.meta["_ops"]
    size = crop if isinstance(crop, int) else crop[0]
    with fast_init():
        m = get_model(name)
    measured = count_gmacs(m, (1, size, size, 3))
    tol = _OPS_TOL.get(name, 0.12)
    assert abs(measured - meta_ops) / meta_ops < tol, (
        f"{name}: measured {measured:.3f} GMACs vs meta {meta_ops} "
        f"at {size}x{size}"
    )


def test_file_size_meta_present():
    enum = get_model_weights("resnet50")
    for member in enum:
        assert member.meta["_file_size"] > 90  # MB, reference meta
        assert member.meta["_ops"] == 4.089

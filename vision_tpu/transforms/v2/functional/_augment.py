"""Augment functionals (reference
``torchvision/transforms/v2/functional/_augment.py``): erase, jpeg."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vision_tpu import tv_tensors

__all__ = ["erase", "jpeg"]


def erase(
    inpt,
    i: int,
    j: int,
    h: int,
    w: int,
    v: jax.Array,
):
    """Set region [i:i+h, j:j+w] to v (reference ``_augment.py`` erase)."""
    if isinstance(inpt, tv_tensors.TVTensor):
        img = inpt.data
        out = img.at[..., i : i + h, j : j + w, :].set(
            jnp.asarray(v, dtype=img.dtype)
        )
        return tv_tensors.wrap(out, like=inpt)
    return inpt.at[..., i : i + h, j : j + w, :].set(
        jnp.asarray(v, dtype=inpt.dtype)
    )


def jpeg(inpt, quality: int):
    """JPEG encode->decode round trip (reference ``_augment.py`` jpeg).
    Host-side (PIL/libjpeg) — not jittable; apply outside jit in the input
    pipeline."""
    import numpy as np

    from vision_tpu.io import decode_jpeg, encode_jpeg

    if isinstance(inpt, tv_tensors.TVTensor):
        img = inpt.data
        rewrap = lambda out: tv_tensors.wrap(out, like=inpt)
    else:
        img, rewrap = inpt, lambda out: out
    if img.dtype != jnp.uint8:
        raise ValueError("jpeg expects uint8 input")
    arr = np.asarray(img)
    lead = arr.shape[:-3]
    flat = arr.reshape((-1,) + arr.shape[-3:])
    outs = [decode_jpeg(encode_jpeg(im, quality=quality)) for im in flat]
    out = np.stack(outs).reshape(lead + outs[0].shape)
    return rewrap(jnp.asarray(out))

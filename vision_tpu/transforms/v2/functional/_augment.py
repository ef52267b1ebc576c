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
    inplace: bool = False,
):
    """Set region [i:i+h, j:j+w] to v (reference ``_augment.py`` erase).

    ``inplace`` is accepted for reference signature parity and ignored:
    JAX arrays are immutable, and the reference returns the tensor
    either way."""
    del inplace
    if isinstance(inpt, tv_tensors.TVTensor):
        img = inpt.data
        out = img.at[..., i : i + h, j : j + w, :].set(
            jnp.asarray(v, dtype=img.dtype)
        )
        return tv_tensors.wrap(out, like=inpt)
    return inpt.at[..., i : i + h, j : j + w, :].set(
        jnp.asarray(v, dtype=inpt.dtype)
    )


def _jpeg_roundtrip_host(arr, quality: int):
    """numpy uint8 [..., H, W, C] -> same, via host libjpeg."""
    import numpy as np

    from vision_tpu.io import decode_jpeg, encode_jpeg

    lead = arr.shape[:-3]
    flat = arr.reshape((-1,) + arr.shape[-3:])
    outs = [decode_jpeg(encode_jpeg(im, quality=quality)) for im in flat]
    return np.stack([np.asarray(o) for o in outs]).reshape(
        lead + outs[0].shape
    )


def jpeg(inpt, quality: int):
    """JPEG encode->decode round trip (reference ``_augment.py`` jpeg).
    The codec runs on the host (libjpeg); under ``jit`` it is staged as a
    ``pure_callback`` (shape/dtype-preserving), so JPEG augmentation can
    live inside a compiled input pipeline."""
    import numpy as np

    if isinstance(inpt, tv_tensors.TVTensor):
        img = inpt.data
        rewrap = lambda out: tv_tensors.wrap(out, like=inpt)
    else:
        img, rewrap = inpt, lambda out: out
    if img.dtype != jnp.uint8:
        raise ValueError("jpeg expects uint8 input")
    if isinstance(img, jax.core.Tracer):
        out = jax.pure_callback(
            lambda a: _jpeg_roundtrip_host(np.asarray(a), quality),
            jax.ShapeDtypeStruct(img.shape, jnp.uint8),
            img,
            vmap_method="sequential",
        )
        return rewrap(out)
    return rewrap(jnp.asarray(_jpeg_roundtrip_host(np.asarray(img), quality)))

"""Typed pytree containers — the TPU-native analog of torchvision.tv_tensors.

The reference implements these as ``torch.Tensor`` subclasses with a
``__torch_function__`` unwrap protocol (reference:
``torchvision/tv_tensors/_tv_tensor.py:17-138``).  JAX arrays cannot be
subclassed, so the idiomatic equivalent is registered pytree dataclasses:
the array is the single pytree child, the metadata (format, canvas_size, …)
is hashable aux data.  They therefore flow through ``jax.jit`` / ``vmap`` /
``pjit`` transparently, and transforms dispatch on the Python type of each
pytree leaf-wrapper — exactly what transforms.v2 needs.

Mirroring the reference's unwrap semantics (ops on a TVTensor return a plain
tensor, ``_tv_tensor.py:57-101``): these wrappers expose ``__jax_array__``,
so any ``jnp`` op consumes them and returns a plain ``jax.Array``.
"""

from __future__ import annotations

import enum
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "TVTensor",
    "Image",
    "Video",
    "Mask",
    "BoundingBoxes",
    "BoundingBoxFormat",
    "KeyPoints",
    "wrap",
]


class BoundingBoxFormat(enum.Enum):
    """Coordinate format of a :class:`BoundingBoxes`.

    Mirrors reference ``torchvision/tv_tensors/_bounding_boxes.py:14-41``,
    including the rotated formats.
    """

    XYXY = "XYXY"
    XYWH = "XYWH"
    CXCYWH = "CXCYWH"
    XYWHR = "XYWHR"
    CXCYWHR = "CXCYWHR"
    XYXYXYXY = "XYXYXYXY"


def _is_rotated(fmt: BoundingBoxFormat) -> bool:
    return fmt in (
        BoundingBoxFormat.XYWHR,
        BoundingBoxFormat.CXCYWHR,
        BoundingBoxFormat.XYXYXYXY,
    )


def _as_array(data: Any) -> jax.Array:
    if isinstance(data, TVTensor):
        return data.data
    if isinstance(data, (jax.Array, np.ndarray)):
        return jnp.asarray(data)
    return jnp.asarray(data)


class TVTensor:
    """Base wrapper: one jax.Array child + hashable metadata aux data."""

    __slots__ = ("data",)

    def __init__(self, data: Any):
        object.__setattr__(self, "data", _as_array(data))

    # --- metadata protocol -------------------------------------------------
    def _meta(self) -> Tuple:
        """Hashable aux data for pytree registration."""
        return ()

    @classmethod
    def _from_meta(cls, data, meta: Tuple) -> "TVTensor":
        return cls(data)

    # --- array protocol ----------------------------------------------------
    def __jax_array__(self) -> jax.Array:
        return self.data

    def __array__(self, dtype=None):
        arr = np.asarray(self.data)
        return arr.astype(dtype) if dtype is not None else arr

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def ndim(self):
        return self.data.ndim

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, idx):
        # Indexing preserves the wrapper type + metadata (like torch slicing
        # of a tensor subclass).
        return type(self)._from_meta(self.data[idx], self._meta())

    def astype(self, dtype):
        return type(self)._from_meta(self.data.astype(dtype), self._meta())

    # Ops unwrap to plain arrays (reference `_tv_tensor.py:57` semantics).
    def __add__(self, o):
        return self.data + _maybe_unwrap(o)

    def __radd__(self, o):
        return _maybe_unwrap(o) + self.data

    def __sub__(self, o):
        return self.data - _maybe_unwrap(o)

    def __rsub__(self, o):
        return _maybe_unwrap(o) - self.data

    def __mul__(self, o):
        return self.data * _maybe_unwrap(o)

    def __rmul__(self, o):
        return _maybe_unwrap(o) * self.data

    def __truediv__(self, o):
        return self.data / _maybe_unwrap(o)

    def __rtruediv__(self, o):
        return _maybe_unwrap(o) / self.data

    def __neg__(self):
        return -self.data

    def __eq__(self, o):  # array semantics, like tensors
        return self.data == _maybe_unwrap(o)

    def __ne__(self, o):
        return self.data != _maybe_unwrap(o)

    __hash__ = None  # type: ignore[assignment]

    def __repr__(self):
        meta = self._meta()
        meta_str = f", meta={meta}" if meta else ""
        return (
            f"{type(self).__name__}(shape={tuple(self.shape)}, "
            f"dtype={self.dtype}{meta_str})"
        )

    # --- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return (self.data,), self._meta()

    @classmethod
    def tree_unflatten(cls, meta, children):
        (data,) = children
        return cls._from_meta(data, meta)


def _maybe_unwrap(x):
    return x.data if isinstance(x, TVTensor) else x


@jax.tree_util.register_pytree_node_class
class Image(TVTensor):
    """An image: channels-last ``(..., H, W, C)`` array.

    Reference: ``torchvision/tv_tensors/_image.py`` (which enforces >=3 dims
    in CHW); here the TPU-native layout is HWC / NHWC.
    """

    __slots__ = ()

    def __init__(self, data: Any):
        arr = _as_array(data)
        if arr.ndim == 2:  # H, W -> H, W, 1
            arr = arr[..., None]
        if arr.ndim < 3:
            raise ValueError(f"Image needs >=2 spatial dims, got shape {arr.shape}")
        object.__setattr__(self, "data", arr)


@jax.tree_util.register_pytree_node_class
class Video(TVTensor):
    """A video: ``(..., T, H, W, C)`` array (reference ``_video.py``)."""

    __slots__ = ()

    def __init__(self, data: Any):
        arr = _as_array(data)
        if arr.ndim < 4:
            raise ValueError(f"Video needs >=4 dims (T,H,W,C), got {arr.shape}")
        object.__setattr__(self, "data", arr)


@jax.tree_util.register_pytree_node_class
class Mask(TVTensor):
    """Segmentation or instance mask(s): ``(..., H, W)`` integer/bool array
    (reference ``_mask.py``). No channel dim — masks are per-pixel labels."""

    __slots__ = ()


@jax.tree_util.register_pytree_node_class
class BoundingBoxes(TVTensor):
    """Boxes ``(..., N, 4)`` (or 5/8 for rotated formats) with format +
    canvas metadata.

    Reference: ``torchvision/tv_tensors/_bounding_boxes.py:63-120``.
    ``canvas_size`` is (H, W); ``clamping_mode`` is "soft" | "hard" | None.
    """

    __slots__ = ("format", "canvas_size", "clamping_mode")

    def __init__(
        self,
        data: Any,
        *,
        format: Union[BoundingBoxFormat, str],
        canvas_size: Tuple[int, int],
        clamping_mode: Optional[str] = "soft",
    ):
        super().__init__(data)
        if isinstance(format, str):
            format = BoundingBoxFormat(format.upper())
        if clamping_mode not in ("soft", "hard", None):
            raise ValueError(f"invalid clamping_mode {clamping_mode!r}")
        object.__setattr__(self, "format", format)
        object.__setattr__(self, "canvas_size", tuple(int(s) for s in canvas_size))
        object.__setattr__(self, "clamping_mode", clamping_mode)

    @property
    def is_rotated(self) -> bool:
        return _is_rotated(self.format)

    def _meta(self):
        return (self.format, self.canvas_size, self.clamping_mode)

    @classmethod
    def _from_meta(cls, data, meta):
        format, canvas_size, clamping_mode = meta
        return cls(
            data, format=format, canvas_size=canvas_size, clamping_mode=clamping_mode
        )


@jax.tree_util.register_pytree_node_class
class KeyPoints(TVTensor):
    """Keypoints ``(..., K, 2)`` in (x, y) with canvas metadata
    (reference ``_keypoints.py``).

    Channels beyond (x, y) — typically COCO per-joint visibility as
    ``(..., K, 3)`` — are carried through every geometry kernel untouched,
    so instance filtering (SanitizeBoundingBoxes) and the keypoint-aware
    hflip keep side data aligned with the coordinates. The reference keeps
    visibility in a separate array and realigns by hand in its keypoint
    recipe (``references/detection/transforms.py``); threading it through
    the pytree is the jit-friendly equivalent."""

    __slots__ = ("canvas_size",)

    def __init__(self, data: Any, *, canvas_size: Tuple[int, int]):
        super().__init__(data)
        object.__setattr__(self, "canvas_size", tuple(int(s) for s in canvas_size))

    def _meta(self):
        return (self.canvas_size,)

    @classmethod
    def _from_meta(cls, data, meta):
        (canvas_size,) = meta
        return cls(data, canvas_size=canvas_size)


def wrap(data: Any, *, like: TVTensor, **kwargs) -> TVTensor:
    """Re-wrap ``data`` with the type + metadata of ``like``
    (reference ``tv_tensors/__init__.py:16``). ``kwargs`` override metadata.
    """
    cls = type(like)
    if cls is BoundingBoxes:
        return BoundingBoxes(
            data,
            format=kwargs.get("format", like.format),
            canvas_size=kwargs.get("canvas_size", like.canvas_size),
            clamping_mode=kwargs.get("clamping_mode", like.clamping_mode),
        )
    if cls is KeyPoints:
        return KeyPoints(data, canvas_size=kwargs.get("canvas_size", like.canvas_size))
    return cls(data)

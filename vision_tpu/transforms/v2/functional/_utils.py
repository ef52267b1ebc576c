"""Kernel registry for transforms.v2 functional dispatch.

Mirrors reference ``torchvision/transforms/v2/functional/_utils.py:17-119``:
a two-level dict ``{functional: {input_type: kernel}}`` with an MRO walk at
lookup time.  Kernels registered for TVTensor types are auto-wrapped to
unwrap → compute → rewrap, so kernel authors only deal with plain arrays.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Type

import jax

from vision_tpu import tv_tensors

_KERNEL_REGISTRY: Dict[Callable, Dict[Type, Callable]] = {}


def _kernel_jax_array_wrapper(kernel):
    @functools.wraps(kernel)
    def wrapper(inpt, *args, **kwargs):
        return kernel(inpt, *args, **kwargs)

    return wrapper


def _register_kernel_internal(functional, input_type, *, tv_tensor_wrapper=True):
    """Register ``kernel`` as the implementation of ``functional`` for
    ``input_type`` (reference ``_utils.py:38-68``)."""

    registry = _KERNEL_REGISTRY.setdefault(functional, {})

    def decorator(kernel):
        wrapped = kernel
        if (
            tv_tensor_wrapper
            and isinstance(input_type, type)
            and issubclass(input_type, tv_tensors.TVTensor)
            and input_type is not tv_tensors.TVTensor
        ):
            wrapped = _default_unwrap_rewrap(kernel)
        registry[input_type] = wrapped
        return kernel

    return decorator


def _default_unwrap_rewrap(kernel):
    """Unwrap a TVTensor to its plain array, run the kernel, rewrap with the
    same metadata (reference ``_utils.py:20-35``)."""

    @functools.wraps(kernel)
    def wrapper(inpt, *args, **kwargs):
        out = kernel(inpt.data, *args, **kwargs)
        return tv_tensors.wrap(out, like=inpt)

    return wrapper


def register_kernel(functional, input_type):
    """Public hook for user-defined TVTensor types
    (reference ``_utils.py:70-97``)."""
    return _register_kernel_internal(functional, input_type)


def _get_kernel(functional, input_type):
    """MRO walk to find the most specific registered kernel
    (reference ``_utils.py:99-119``)."""
    registry = _KERNEL_REGISTRY.get(functional)
    if registry is None:
        raise TypeError(f"No kernels registered for {functional.__name__}")
    for cls in input_type.__mro__:
        if cls in registry:
            return registry[cls]
    # plain jax.Array / numpy inputs hit the jax.Array registration
    if jax.Array in registry and not issubclass(input_type, tv_tensors.TVTensor):
        return registry[jax.Array]
    raise TypeError(
        f"{functional.__name__} got unsupported input type {input_type.__name__}"
    )


def _call_kernel(functional, inpt, *args, **kwargs):
    kernel = _get_kernel(functional, type(inpt))
    return kernel(inpt, *args, **kwargs)


def is_pure_tensor(inpt: Any) -> bool:
    import numpy as np

    return isinstance(inpt, (jax.Array, np.ndarray)) and not isinstance(
        inpt, tv_tensors.TVTensor
    )

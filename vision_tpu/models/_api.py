"""Model + weights registry (reference ``torchvision/models/_api.py``).

``Weights``/``WeightsEnum`` carry the reference's metadata (metrics,
num_params, recipe) verbatim so parity targets travel with the code.
``get_state_dict`` downloads the *reference torch checkpoint* and converts
it to flax params via ``vision_tpu._torch_convert`` — the weight-porting
path that reproduces reference accuracies (SURVEY.md §5 checkpoint plan).
"""

from __future__ import annotations

import dataclasses
import enum
import fnmatch
import importlib
import os
import pathlib
from functools import partial
from typing import Any, Callable, Dict, List, Mapping, Optional, Set, Type, Union

from vision_tpu.models._meta_extra import OPS_FILE_SIZE as _META_EXTRA

__all__ = [
    "Weights",
    "WeightsEnum",
    "get_model",
    "get_model_builder",
    "get_model_weights",
    "get_weight",
    "list_models",
    "register_model",
]


@dataclasses.dataclass
class Weights:
    """reference ``models/_api.py:21``."""

    url: str
    transforms: Callable
    meta: Dict[str, Any]

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, Weights):
            return NotImplemented
        return (
            self.url == other.url
            and self.meta is other.meta
            and self.transforms is other.transforms
        )

    def __hash__(self):
        return hash(self.url)


class WeightsEnum(enum.Enum):
    """reference ``models/_api.py:69``."""

    @classmethod
    def verify(cls, obj: Any) -> Any:
        if obj is not None:
            if type(obj) is str:
                obj = cls[obj.replace(cls.__name__ + ".", "")]
            elif not isinstance(obj, cls):
                raise TypeError(
                    f"Invalid Weight class provided; expected {cls.__name__} "
                    f"but received {obj.__class__.__name__}."
                )
        return obj

    def get_state_dict(self, progress: bool = True) -> Dict[str, Any]:
        """Download + load the reference torch checkpoint (host-side).
        Returns the raw torch state dict (numpy-converted); model builders
        run it through the architecture-specific converter."""
        from vision_tpu.models._hub import load_state_dict_from_url

        return load_state_dict_from_url(self.url, progress=progress)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}.{self._name_}"

    @property
    def url(self):
        return self.value.url

    @property
    def transforms(self):
        return self.value.transforms

    @property
    def meta(self):
        meta = self.value.meta
        key = f"{self.__class__.__name__}.{self._name_}"
        extra = _META_EXTRA.get(key)
        if extra and not all(k in meta for k in extra):
            # merge the reference's published _ops/_file_size; values
            # declared inline in the enum win
            meta = {**extra, **meta}
            self.value.meta = meta  # cache the merged dict
        return meta


BUILTIN_MODELS: Dict[str, Callable] = {}


def register_model(name: Optional[str] = None) -> Callable:
    """reference ``models/_api.py:196``."""

    def wrapper(fn: Callable) -> Callable:
        key = name if name is not None else fn.__name__
        if key in BUILTIN_MODELS:
            raise ValueError(f"model {key} already registered")
        BUILTIN_MODELS[key] = fn
        return fn

    return wrapper


def list_models(
    module: Optional[Any] = None,
    include: Union[str, List[str], None] = None,
    exclude: Union[str, List[str], None] = None,
) -> List[str]:
    """reference ``models/_api.py:214``."""
    all_models = {
        k
        for k, fn in BUILTIN_MODELS.items()
        if module is None or fn.__module__.rsplit(".", 1)[0] == module.__name__
    }
    if include:
        models: Set[str] = set()
        if isinstance(include, str):
            include = [include]
        for pat in include:
            models |= set(fnmatch.filter(all_models, pat))
    else:
        models = all_models
    if exclude:
        if isinstance(exclude, str):
            exclude = [exclude]
        for pat in exclude:
            models -= set(fnmatch.filter(all_models, pat))
    return sorted(models)


def get_model_builder(name: str) -> Callable:
    name = name.lower()
    try:
        return BUILTIN_MODELS[name]
    except KeyError:
        raise ValueError(f"Unknown model {name}")


def get_model(name: str, **config: Any):
    """reference ``models/_api.py:263``."""
    return get_model_builder(name)(**config)


def get_model_weights(name: Union[Callable, str]):
    """reference ``models/_api.py:239``: the WeightsEnum of a builder."""
    builder = get_model_builder(name) if isinstance(name, str) else name
    return _get_enum_from_fn(builder)


def get_weight(name: str) -> WeightsEnum:
    """reference ``models/_api.py:120``: 'ResNet50_Weights.IMAGENET1K_V2'."""
    try:
        enum_name, value_name = name.split(".")
    except ValueError:
        raise ValueError(f"Invalid weight name {name!r}")
    for fn in BUILTIN_MODELS.values():
        module = importlib.import_module(fn.__module__)
        if hasattr(module, enum_name):
            return getattr(module, enum_name)[value_name]
    raise ValueError(f"weight enum {enum_name} not found")


def _get_enum_from_fn(fn: Callable):
    import inspect

    sig = inspect.signature(fn)
    if "weights" not in sig.parameters:
        raise ValueError("builder has no 'weights' parameter")
    ann = sig.parameters["weights"].annotation
    module = importlib.import_module(fn.__module__)
    for obj in vars(module).values():
        if (
            isinstance(obj, type)
            and issubclass(obj, WeightsEnum)
            and obj is not WeightsEnum
        ):
            if obj.__name__ in str(ann) or ann is inspect.Parameter.empty:
                return obj
    raise ValueError("could not find weights enum")

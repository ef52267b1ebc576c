"""Misc building-block modules (reference ``torchvision/ops/misc.py``).

flax.linen modules, channels-last. Parameter/attribute naming mirrors the
reference so the torch->jax weight converter can map state dicts by name.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "FrozenBatchNorm2d",
    "Conv2dNormActivation",
    "Conv3dNormActivation",
    "SqueezeExcitation",
    "MLP",
    "Permute",
]


class FrozenBatchNorm2d(nn.Module):
    """BatchNorm2d with fixed statistics and affine params
    (reference ``ops/misc.py:14-76``). All four tensors are non-trainable
    constants — stored as variables in the "batch_stats"-like collection
    ``frozen`` so optimizers never touch them."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.variable(
            "frozen", "weight", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        bias = self.variable(
            "frozen", "bias", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        running_mean = self.variable(
            "frozen", "running_mean", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        running_var = self.variable(
            "frozen", "running_var", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        scale = weight * jax.lax.rsqrt(running_var + self.eps)
        shift = bias - running_mean * scale
        return x * scale + shift


class Conv2dNormActivation(nn.Module):
    """Conv2d + norm + activation (reference ``ops/misc.py:126``).

    ``norm_layer`` / ``activation_layer`` are constructors (or None); the
    default norm is BatchNorm, matching the reference.
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    norm_layer: Optional[Callable[..., nn.Module]] = "batch_norm"  # type: ignore[assignment]
    activation_layer: Optional[Callable] = nn.relu
    dilation: int = 1
    bias: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        padding = self.padding
        if padding is None:
            padding = (self.kernel_size - 1) // 2 * self.dilation
        use_bias = self.bias if self.bias is not None else self.norm_layer is None
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(padding, padding)] * 2,
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=use_bias,
            name="0",
        )(x)
        if self.norm_layer is not None:
            if self.norm_layer == "batch_norm":
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name="1",
                )(x)
            else:
                x = self.norm_layer(name="1")(x)
        if self.activation_layer is not None:
            x = self.activation_layer(x)
        return x


class Conv3dNormActivation(nn.Module):
    """3D variant (reference ``ops/misc.py:176``); input [N, T, H, W, C]."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    norm_layer: Optional[Callable[..., nn.Module]] = "batch_norm"  # type: ignore[assignment]
    activation_layer: Optional[Callable] = nn.relu
    dilation: int = 1
    bias: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        ks = (
            (self.kernel_size,) * 3
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        st = (
            (self.stride,) * 3 if isinstance(self.stride, int) else tuple(self.stride)
        )
        if self.padding is None:
            pads = [((k - 1) // 2 * self.dilation,) * 2 for k in ks]
        elif isinstance(self.padding, int):
            pads = [(self.padding, self.padding)] * 3
        else:
            pads = [(p, p) for p in self.padding]
        use_bias = self.bias if self.bias is not None else self.norm_layer is None
        x = nn.Conv(
            self.out_channels,
            ks,
            strides=st,
            padding=pads,
            feature_group_count=self.groups,
            use_bias=use_bias,
            name="0",
        )(x)
        if self.norm_layer is not None:
            if self.norm_layer == "batch_norm":
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name="1",
                )(x)
            else:
                x = self.norm_layer(name="1")(x)
        if self.activation_layer is not None:
            x = self.activation_layer(x)
        return x


class SqueezeExcitation(nn.Module):
    """SE block (reference ``ops/misc.py:225``)."""

    input_channels: int
    squeeze_channels: int
    activation: Callable = nn.relu
    scale_activation: Callable = nn.sigmoid

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = jnp.mean(x, axis=(-3, -2), keepdims=True)
        scale = nn.Conv(self.squeeze_channels, (1, 1), name="fc1")(scale)
        scale = self.activation(scale)
        scale = nn.Conv(self.input_channels, (1, 1), name="fc2")(scale)
        scale = self.scale_activation(scale)
        return x * scale


class MLP(nn.Module):
    """Multi-layer perceptron (reference ``ops/misc.py:264``)."""

    hidden_channels: Sequence[int]
    norm_layer: Optional[Callable[..., nn.Module]] = None
    activation_layer: Optional[Callable] = nn.relu
    use_bias: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = False, key: jax.Array | None = None
    ) -> jax.Array:
        n = len(self.hidden_channels)
        for i, hidden in enumerate(self.hidden_channels):
            x = nn.Dense(hidden, use_bias=self.use_bias, name=str(2 * i))(x)
            if i < n - 1:
                if self.norm_layer is not None:
                    x = self.norm_layer(name=f"norm{i}")(x)
                if self.activation_layer is not None:
                    x = self.activation_layer(x)
            if self.dropout > 0 and train:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Permute(nn.Module):
    """Axis permutation as a module (reference ``ops/misc.py:309``)."""

    dims: Sequence[int]

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.transpose(x, self.dims)

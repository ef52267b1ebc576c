"""RAFT optical flow (reference
``torchvision/models/optical_flow/raft.py``, 947 LoC).

TPU design: the iterative refinement runs as a Python-unrolled loop of
``num_flow_updates`` (static) steps — each step is conv + gather work that
XLA fuses; the all-pairs correlation volume is one big MXU matmul
(fmap1^T fmap2, [B, H*W, H*W]); pyramid indexing is a vmapped bilinear
gather replicating torch grid_sample(align_corners=True).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model, init_variables
from vision_tpu.transforms._presets import OpticalFlow

__all__ = [
    "RAFT",
    "Raft_Large_Weights",
    "Raft_Small_Weights",
    "raft_large",
    "raft_small",
]


def _instance_norm(name):
    # torch InstanceNorm2d default: no affine params, eps 1e-5
    return nn.GroupNorm(
        num_groups=None, group_size=1, epsilon=1e-5, use_bias=False,
        use_scale=False, name=name,
    )


def _bn(train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class _CNA(nn.Module):
    """Conv2dNormActivation with bias=True (RAFT quirk, see reference
    ``raft.py:27`` note)."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: Optional[str] = "instance"  # "instance" | "batch" | None
    act: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=[(p, p)] * 2, use_bias=True, name="0",
        )(x)
        if self.norm == "instance":
            x = _instance_norm("1")(x)
        elif self.norm == "batch":
            x = _bn(train, "1")(x)
        if self.act:
            x = nn.relu(x)
        return x


class BottleneckBlock(nn.Module):
    """reference ``raft.py:74`` (1x1 -> 3x3 -> 1x1, extra relu/biases)."""

    features: int
    stride: int = 1
    norm: Optional[str] = "instance"

    @nn.compact
    def __call__(self, x, train=False):
        f4 = self.features // 4
        y = _CNA(f4, 1, 1, self.norm, name="convnormrelu1")(x, train)
        y = _CNA(f4, 3, self.stride, self.norm, name="convnormrelu2")(y, train)
        y = _CNA(self.features, 1, 1, self.norm, name="convnormrelu3")(y, train)
        if self.stride != 1:
            x = _CNA(
                self.features, 1, self.stride, self.norm, act=False,
                name="downsample",
            )(x, train)
        return nn.relu(x + y)


class ResidualBlock(nn.Module):
    """reference ``raft.py:27``."""

    features: int
    stride: int = 1
    norm: Optional[str] = "instance"

    @nn.compact
    def __call__(self, x, train=False):
        y = _CNA(self.features, 3, self.stride, self.norm, name="convnormrelu1")(
            x, train
        )
        y = _CNA(self.features, 3, 1, self.norm, name="convnormrelu2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = _CNA(
                self.features, 1, self.stride, self.norm, act=False,
                name="downsample",
            )(x, train)
        return nn.relu(x + y)


class FeatureEncoder(nn.Module):
    """reference ``raft.py:116``: downsamples by 8."""

    layers: Tuple[int, ...] = (64, 64, 96, 128, 256)
    norm: Optional[str] = "instance"
    block: str = "residual"  # "residual" | "bottleneck"

    @nn.compact
    def __call__(self, x, train=False):
        blk = ResidualBlock if self.block == "residual" else BottleneckBlock
        x = _CNA(self.layers[0], 7, 2, self.norm, name="convnormrelu")(x, train)
        for i, (feat, stride) in enumerate(
            zip(self.layers[1:4], (1, 2, 2)), start=1
        ):
            x = blk(feat, stride, self.norm, name=f"layer{i}.0")(x, train)
            x = blk(feat, 1, self.norm, name=f"layer{i}.1")(x, train)
        return nn.Conv(self.layers[4], (1, 1), name="conv")(x)


class MotionEncoder(nn.Module):
    """reference ``raft.py:171``."""

    in_channels_corr: int
    corr_layers: Tuple[int, ...] = (256, 192)
    flow_layers: Tuple[int, int] = (128, 64)
    out_channels: int = 128  # includes the 2 appended flow channels

    @nn.compact
    def __call__(self, flow, corr_features):
        corr = _CNA(self.corr_layers[0], 1, norm=None, name="convcorr1")(
            corr_features
        )
        if len(self.corr_layers) == 2:
            corr = _CNA(self.corr_layers[1], 3, norm=None, name="convcorr2")(corr)
        f = _CNA(self.flow_layers[0], 7, norm=None, name="convflow1")(flow)
        f = _CNA(self.flow_layers[1], 3, norm=None, name="convflow2")(f)
        cf = jnp.concatenate([corr, f], axis=-1)
        cf = _CNA(self.out_channels - 2, 3, norm=None, name="conv")(cf)
        return jnp.concatenate([cf, flow], axis=-1)


class ConvGRU(nn.Module):
    """reference ``raft.py:214``."""

    hidden_size: int
    kernel: Tuple[int, int]

    @nn.compact
    def __call__(self, h, x):
        kh, kw = self.kernel
        pad = [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2]
        conv = lambda name: nn.Conv(
            self.hidden_size, (kh, kw), padding=pad, name=name
        )
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv("convz")(hx))
        r = nn.sigmoid(conv("convr")(hx))
        q = jnp.tanh(conv("convq")(jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class UpdateBlock(nn.Module):
    """reference ``raft.py:288``: motion encoder + ConvGRU(s) + flow head."""

    in_channels_corr: int
    hidden_state_size: int = 128
    corr_layers: Tuple[int, ...] = (256, 192)
    flow_layers: Tuple[int, int] = (128, 64)
    motion_out: int = 128
    gru_kernels: Tuple[Tuple[int, int], ...] = ((1, 5), (5, 1))
    flow_head_hidden: int = 256

    @nn.compact
    def __call__(self, hidden_state, context, corr_features, flow):
        motion = MotionEncoder(
            self.in_channels_corr, self.corr_layers, self.flow_layers,
            self.motion_out, name="motion_encoder",
        )(flow, corr_features)
        x = jnp.concatenate([context, motion], axis=-1)
        h = hidden_state
        for gi, kern in enumerate(self.gru_kernels, start=1):
            h = ConvGRU(
                self.hidden_state_size, kern,
                name=f"recurrent_block.convgru{gi}",
            )(h, x)
        d = nn.relu(
            nn.Conv(
                self.flow_head_hidden, (3, 3), padding=[(1, 1)] * 2,
                name="flow_head.conv1",
            )(h)
        )
        delta_flow = nn.Conv(
            2, (3, 3), padding=[(1, 1)] * 2, name="flow_head.conv2"
        )(d)
        return h, delta_flow


class MaskPredictor(nn.Module):
    """reference ``raft.py:311``."""

    hidden_size: int = 256
    multiplier: float = 0.25

    @nn.compact
    def __call__(self, x):
        x = _CNA(self.hidden_size, 3, norm=None, name="convrelu")(x)
        x = nn.Conv(8 * 8 * 9, (1, 1), name="conv")(x)
        return self.multiplier * x


def _axis_tap_weights(centers, deltas, size):
    """Per-query separable bilinear tap weights along one axis.

    grid_sample(align_corners=True, padding=zeros) semantics per sample
    coordinate ``c = centers[q] + deltas[s]``: two taps ``floor(c)`` /
    ``floor(c)+1`` with weights ``1-frac`` / ``frac``; a tap outside
    ``[0, size)`` contributes zero. Because the validity and the weight
    both factor per axis, the 4-corner formula is exactly the outer
    product of these per-axis tap rows.

    centers: [Q]; deltas: [S]. Returns ``w [Q, S, size]`` dense one-hot
    tap weights (f32).
    """
    c = centers[:, None] + deltas[None, :]  # [Q, S]
    lo = jnp.floor(c).astype(jnp.int32)
    frac = c - lo
    v_lo = (lo >= 0) & (lo < size)
    v_hi = (lo + 1 >= 0) & (lo + 1 < size)
    w = jax.nn.one_hot(jnp.clip(lo, 0, size - 1), size) * jnp.where(
        v_lo, 1.0 - frac, 0.0
    )[..., None]
    w += jax.nn.one_hot(jnp.clip(lo + 1, 0, size - 1), size) * jnp.where(
        v_hi, frac, 0.0
    )[..., None]
    return w




class CorrBlock:
    """reference ``raft.py:337``: stateless pyramid build + index."""

    def __init__(self, num_levels: int = 4, radius: int = 4):
        self.num_levels = num_levels
        self.radius = radius
        self.out_channels = num_levels * (2 * radius + 1) ** 2

    def build_pyramid(self, fmap1, fmap2):
        """fmap1/2: [B, H, W, C] -> pyramid of [B*H*W, h_l, w_l, 1]."""
        b, h, w, c = fmap1.shape
        f1 = fmap1.reshape(b, h * w, c)
        f2 = fmap2.reshape(b, h * w, c)
        corr = jnp.einsum(
            "bnc,bmc->bnm", f1, f2, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(c))
        vol = corr.reshape(b * h * w, h, w, 1)
        pyramid = [vol]
        for _ in range(self.num_levels - 1):
            vol = nn.avg_pool(vol, (2, 2), (2, 2))
            pyramid.append(vol)
        return pyramid

    def index_pyramid(self, pyramid, coords):
        """coords: [B, H, W, 2] absolute (x, y) -> [B, H, W, out_channels]."""
        r = self.radius
        side = 2 * r + 1
        b, h, w, _ = coords.shape
        di = jnp.linspace(-r, r, side)
        # The reference adds the raw (di, dj) delta straight onto the (x, y)
        # centroids (``raft.py:405-409``): offset x = di, y = dj. The
        # neighborhood is square so the value SET matches either way, but the
        # channel ORDER feeds learned conv weights — pinned by
        # tests/test_models_oracle2.py::test_raft_corr_block_matches_torch_grid_sample.
        #
        # TPU formulation: the 81 sample points per query form a separable
        # 9x9 grid (x varies with i, y with j), so grid_sample decomposes
        # into two dense per-query tap-weight contractions over each
        # query's own correlation plane. Measured per 12-update loop at
        # 512px b2 (v5e): 4-corner scalar gathers 8.5 s-class (r4), a
        # vmap(dynamic_slice) 10x10-window variant 712 ms (the batched 2D
        # dynamic-slice lowers pathologically inside the loop), this dense
        # batched einsum 58 ms — and it is bit-exact vs the windowed form.
        c = coords.reshape(b * h * w, 2)
        cx, cy = c[:, 0], c[:, 1]
        di_j = jnp.asarray(di, jnp.float32)

        feats = []
        for vol in pyramid:
            q, hl, wl = vol.shape[0], vol.shape[1], vol.shape[2]
            v2 = vol.reshape(q, hl, wl)
            wy = _axis_tap_weights(cy, di_j, hl)  # [Q, side, hl]
            wx = _axis_tap_weights(cx, di_j, wl)  # [Q, side, wl]
            tmp = jnp.einsum("qjy,qyx->qjx", wy, v2)
            sampled = jnp.einsum("qix,qjx->qij", wx, tmp)
            feats.append(sampled.reshape(b, h, w, side * side))
            cx, cy = cx / 2, cy / 2
        return jnp.concatenate(feats, axis=-1)


def upsample_flow(flow, up_mask=None, factor: int = 8):
    """reference ``optical_flow/_utils.py`` upsample_flow; flow [B,h,w,2]."""
    b, h, w, ch = flow.shape
    if up_mask is None:
        from vision_tpu.transforms.v2.functional._resample import resize_2d

        return factor * resize_2d(
            flow, (h * factor, w * factor), mode="bilinear", antialias=False,
            align_corners=True,
        )
    mask = up_mask.reshape(b, h, w, 1, 9, factor, factor)
    mask = jax.nn.softmax(mask, axis=4)
    # unfold 3x3 neighborhoods of factor*flow
    fp = jnp.pad(factor * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [
            fp[:, dy : dy + h, dx : dx + w, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=4,
    )  # [B, h, w, 2, 9]... stack at axis 4 gives [B,h,w,2,9]
    up = jnp.sum(
        mask * neigh[:, :, :, :, :, None, None], axis=4
    )  # [B, h, w, 2, factor, factor]
    up = up.transpose(0, 1, 4, 2, 5, 3)  # [B, h, factor, w, factor, 2]
    return up.reshape(b, h * factor, w * factor, ch)


class RAFT(nn.Module):
    """reference ``raft.py:434``. Inputs [B, H, W, 3] in [-1, 1]."""

    num_flow_updates: int = 12
    use_mask_predictor: bool = True
    feature_layers: Tuple[int, ...] = (64, 64, 96, 128, 256)
    context_layers: Tuple[int, ...] = (64, 64, 96, 128, 256)
    encoder_block: str = "residual"
    context_norm: Optional[str] = "batch"
    corr_radius: int = 4
    hidden_state_size: int = 128
    corr_layers: Tuple[int, ...] = (256, 192)
    flow_layers: Tuple[int, int] = (128, 64)
    motion_out: int = 128
    gru_kernels: Tuple[Tuple[int, int], ...] = ((1, 5), (5, 1))
    flow_head_hidden: int = 256

    @nn.compact
    def __call__(self, image1, image2, num_flow_updates: Optional[int] = None,
                 train: bool = False):
        n_updates = num_flow_updates or self.num_flow_updates
        b, h, w, _ = image1.shape

        fmaps = FeatureEncoder(
            layers=self.feature_layers, norm="instance",
            block=self.encoder_block, name="feature_encoder",
        )(jnp.concatenate([image1, image2], axis=0), train)
        fmap1, fmap2 = fmaps[:b], fmaps[b:]
        corr_block = CorrBlock(radius=self.corr_radius)
        pyramid = corr_block.build_pyramid(fmap1, fmap2)

        context_out = FeatureEncoder(
            layers=self.context_layers, norm=self.context_norm,
            block=self.encoder_block, name="context_encoder",
        )(image1, train)
        hidden_state_size = self.hidden_state_size
        hidden_state = jnp.tanh(context_out[..., :hidden_state_size])
        context = nn.relu(context_out[..., hidden_state_size:])

        h8, w8 = h // 8, w // 8
        ys, xs = jnp.meshgrid(
            jnp.arange(h8, dtype=jnp.float32),
            jnp.arange(w8, dtype=jnp.float32),
            indexing="ij",
        )
        coords0 = jnp.broadcast_to(
            jnp.stack([xs, ys], axis=-1)[None], (b, h8, w8, 2)
        )
        coords1 = coords0

        update_block = UpdateBlock(
            corr_block.out_channels, hidden_state_size,
            corr_layers=self.corr_layers, flow_layers=self.flow_layers,
            motion_out=self.motion_out, gru_kernels=self.gru_kernels,
            flow_head_hidden=self.flow_head_hidden, name="update_block",
        )
        mask_predictor = (
            MaskPredictor(name="mask_predictor") if self.use_mask_predictor else None
        )

        flow_predictions = []
        for _ in range(n_updates):
            coords1 = jax.lax.stop_gradient(coords1)
            corr_features = corr_block.index_pyramid(pyramid, coords1)
            flow = coords1 - coords0
            hidden_state, delta_flow = update_block(
                hidden_state, context, corr_features, flow
            )
            coords1 = coords1 + delta_flow
            up_mask = (
                mask_predictor(hidden_state) if mask_predictor is not None else None
            )
            flow_predictions.append(
                upsample_flow(coords1 - coords0, up_mask)
            )
        return flow_predictions


def _w(url, epe_clean, epe_final, num_params):
    return Weights(
        url=url,
        transforms=OpticalFlow,
        meta={
            "num_params": num_params,
            "_metrics": {
                "Sintel-Train-Cleanpass": {"epe": epe_clean},
                "Sintel-Train-Finalpass": {"epe": epe_final},
            },
        },
    )


class Raft_Large_Weights(WeightsEnum):
    C_T_V1 = _w(
        "https://download.pytorch.org/models/raft_large_C_T_V1-22a6c225.pth",
        1.4411, 2.7894, 5257536,
    )
    C_T_V2 = _w(
        "https://download.pytorch.org/models/raft_large_C_T_V2-1bb1363a.pth",
        1.3822, 2.7161, 5257536,
    )
    C_T_SKHT_V1 = _w(
        "https://download.pytorch.org/models/raft_large_C_T_SKHT_V1-0b8c9e55.pth",
        None, None, 5257536,
    )
    C_T_SKHT_V2 = _w(
        "https://download.pytorch.org/models/raft_large_C_T_SKHT_V2-ff5fadd5.pth",
        None, None, 5257536,
    )
    DEFAULT = C_T_SKHT_V2


@register_model()
def raft_large(*, weights: Optional[Raft_Large_Weights] = None, **kwargs):
    """reference ``raft.py:841`` raft_large builder."""
    weights = Raft_Large_Weights.verify(weights)
    module = RAFT(**kwargs)
    variables = init_variables(module, 
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        num_flow_updates=1,
    )
    preprocess = None
    if weights is not None:
        from vision_tpu._torch_convert import convert_torch_state_dict

        sd = weights.get_state_dict()
        variables = convert_torch_state_dict(sd, dict(variables))
        preprocess = weights.transforms()
    return VisionModel(module=module, variables=variables, preprocess=preprocess)


class Raft_Small_Weights(WeightsEnum):
    C_T_V1 = _w(
        "https://download.pytorch.org/models/raft_small_C_T_V1-ad48884c.pth",
        2.1231, 3.2790, 990162,
    )
    C_T_V2 = _w(
        "https://download.pytorch.org/models/raft_small_C_T_V2-01064c6d.pth",
        1.9901, 3.2831, 990162,
    )
    DEFAULT = C_T_V2


@register_model()
def raft_small(*, weights: Optional[Raft_Small_Weights] = None, **kwargs):
    """reference ``raft.py:897`` raft_small builder."""
    weights = Raft_Small_Weights.verify(weights)
    module = RAFT(
        use_mask_predictor=False,
        feature_layers=(32, 32, 64, 96, 128),
        context_layers=(32, 32, 64, 96, 160),
        encoder_block="bottleneck",
        context_norm=None,
        corr_radius=3,
        hidden_state_size=96,
        corr_layers=(96,),
        flow_layers=(64, 32),
        motion_out=82,
        gru_kernels=((3, 3),),
        flow_head_hidden=128,
        **kwargs,
    )
    variables = init_variables(module, 
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        num_flow_updates=1,
    )
    preprocess = None
    if weights is not None:
        from vision_tpu._torch_convert import convert_torch_state_dict

        sd = weights.get_state_dict()
        variables = convert_torch_state_dict(sd, dict(variables))
        preprocess = weights.transforms()
    return VisionModel(module=module, variables=variables, preprocess=preprocess)

"""Visualization utilities (reference ``torchvision/utils.py``):
make_grid, save_image, draw_bounding_boxes, draw_segmentation_masks,
draw_keypoints, flow_to_image.

Host-side numpy/PIL code (visualization is not a device workload);
channels-last uint8/float arrays.
"""

from __future__ import annotations

import math
import pathlib
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = [
    "make_grid",
    "profile_trace",
    "trace_annotation",
    "save_image",
    "draw_bounding_boxes",
    "draw_segmentation_masks",
    "draw_keypoints",
    "flow_to_image",
    "_log_api_usage_once",
]

_API_USAGE_SEEN = set()
_API_USAGE_LOGGER = None


def set_api_usage_logger(fn) -> None:
    """Subscribe a logger (the reference's
    ``torch._C._log_api_usage_once`` deployment hook, ``utils.py:769``)."""
    global _API_USAGE_LOGGER
    _API_USAGE_LOGGER = fn


def _log_api_usage_once(obj) -> None:
    """Fire once per API per process (reference ``utils.py:769-793``)."""
    module = getattr(obj, "__module__", "vision_tpu")
    name = getattr(obj, "__qualname__", obj.__class__.__name__)
    key = f"{module}.{name}"
    if key in _API_USAGE_SEEN:
        return
    _API_USAGE_SEEN.add(key)
    if _API_USAGE_LOGGER is not None:
        _API_USAGE_LOGGER(key)


def _to_float01(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def make_grid(
    images: Union[np.ndarray, Sequence[np.ndarray]],
    nrow: int = 8,
    padding: int = 2,
    normalize: bool = False,
    value_range: Optional[Tuple[float, float]] = None,
    scale_each: bool = False,
    pad_value: float = 0.0,
) -> np.ndarray:
    """reference ``utils.py:25``; images [N, H, W, C] -> grid [H', W', C]."""
    if isinstance(images, (list, tuple)):
        images = np.stack([np.asarray(i) for i in images])
    images = _to_float01(images)
    if images.ndim == 3:
        images = images[None]
    n, h, w, c = images.shape

    if normalize:
        images = images.copy()

        def norm_range(t, vr):
            lo, hi = (
                vr if vr is not None else (float(t.min()), float(t.max()))
            )
            return np.clip((t - lo) / max(hi - lo, 1e-5), 0, 1)

        if scale_each:
            for i in range(n):
                images[i] = norm_range(images[i], value_range)
        else:
            images = norm_range(images, value_range)

    xmaps = min(nrow, n)
    ymaps = int(math.ceil(n / xmaps))
    gh, gw = h + padding, w + padding
    grid = np.full(
        (ymaps * gh + padding, xmaps * gw + padding, c), pad_value, np.float32
    )
    k = 0
    for y in range(ymaps):
        for x in range(xmaps):
            if k >= n:
                break
            grid[
                y * gh + padding : y * gh + padding + h,
                x * gw + padding : x * gw + padding + w,
            ] = images[k]
            k += 1
    return grid


def save_image(
    images,
    fp: Union[str, pathlib.Path],
    **make_grid_kwargs,
) -> None:
    """reference ``utils.py:257``."""
    from vision_tpu.io.image import write_png

    grid = make_grid(images, **make_grid_kwargs)
    arr = np.clip(np.round(grid * 255.0), 0, 255).astype(np.uint8)
    write_png(arr, fp)


_DEFAULT_COLORS = [
    (255, 99, 71), (65, 105, 225), (60, 179, 113), (255, 215, 0),
    (186, 85, 211), (255, 140, 0), (0, 206, 209), (220, 20, 60),
]


def _parse_color(color, idx=0):
    if color is None:
        return _DEFAULT_COLORS[idx % len(_DEFAULT_COLORS)]
    if isinstance(color, str):
        import PIL.ImageColor

        return PIL.ImageColor.getrgb(color)
    return tuple(color)


def draw_bounding_boxes(
    image: np.ndarray,
    boxes: np.ndarray,
    labels: Optional[List[str]] = None,
    colors=None,
    fill: bool = False,
    width: int = 1,
    font=None,
    font_size: Optional[int] = None,
) -> np.ndarray:
    """reference ``utils.py:285``; image HWC uint8, boxes [N, 4] xyxy."""
    import PIL.Image
    import PIL.ImageDraw

    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
    pil = PIL.Image.fromarray(img.squeeze() if img.shape[-1] == 1 else img).convert(
        "RGBA" if fill else "RGB"
    )
    draw = PIL.ImageDraw.Draw(pil, "RGBA" if fill else None)
    boxes = np.asarray(boxes)
    for i, box in enumerate(boxes):
        color = _parse_color(
            colors[i] if isinstance(colors, (list, tuple)) and not isinstance(colors[0], int)
            else colors,
            i,
        ) if colors is not None else _parse_color(None, i)
        xy = [float(v) for v in box]
        if fill:
            draw.rectangle(xy, outline=color + (255,), fill=color + (100,), width=width)
        else:
            draw.rectangle(xy, outline=color, width=width)
        if labels is not None and i < len(labels) and labels[i]:
            draw.text((xy[0] + width, xy[1] + width), labels[i], fill=color)
    return np.asarray(pil.convert("RGB"))


def draw_segmentation_masks(
    image: np.ndarray,
    masks: np.ndarray,
    alpha: float = 0.8,
    colors=None,
) -> np.ndarray:
    """reference ``utils.py:418``; masks [N, H, W] bool."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
    out = img.astype(np.float32)
    masks = np.asarray(masks)
    if masks.ndim == 2:
        masks = masks[None]
    for i, mask in enumerate(masks):
        color = np.asarray(_parse_color(
            colors[i] if isinstance(colors, list) else colors, i
        ) if colors is not None else _parse_color(None, i), np.float32)
        m = mask.astype(bool)
        out[m] = out[m] * (1 - alpha) + color * alpha
    return np.clip(out, 0, 255).astype(np.uint8)


def draw_keypoints(
    image: np.ndarray,
    keypoints: np.ndarray,
    connectivity: Optional[List[Tuple[int, int]]] = None,
    colors=None,
    radius: int = 2,
    width: int = 3,
    visibility: Optional[np.ndarray] = None,
) -> np.ndarray:
    """reference ``utils.py:487``; keypoints [N_inst, K, 2]."""
    import PIL.Image
    import PIL.ImageDraw

    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
    pil = PIL.Image.fromarray(img)
    draw = PIL.ImageDraw.Draw(pil)
    kps = np.asarray(keypoints)
    if kps.ndim == 2:
        kps = kps[None]
    for inst_idx, inst in enumerate(kps):
        color = _parse_color(colors, inst_idx)
        vis = (
            visibility[inst_idx]
            if visibility is not None
            else np.ones(len(inst), bool)
        )
        for k, (x, y) in enumerate(inst[:, :2]):
            if not vis[k]:
                continue
            draw.ellipse(
                [x - radius, y - radius, x + radius, y + radius], fill=color
            )
        if connectivity:
            for a, b in connectivity:
                if vis[a] and vis[b]:
                    draw.line(
                        [tuple(inst[a, :2]), tuple(inst[b, :2])],
                        fill=color,
                        width=width,
                    )
    return np.asarray(pil)


def _make_colorwheel() -> np.ndarray:
    """Baker et al. flow color wheel (reference ``utils.py:604`` helper)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """reference ``utils.py:604``: flow [H, W, 2] (or [N, H, W, 2]) ->
    uint8 RGB visualization."""
    flow = np.asarray(flow, np.float32)
    if flow.ndim == 4:
        return np.stack([flow_to_image(f) for f in flow])
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u**2 + v**2)
    rad_max = max(rad.max(), 1e-5)
    u, v = u / rad_max, v / rad_max
    rad = np.sqrt(u**2 + v**2)

    wheel = _make_colorwheel()
    ncols = wheel.shape[0]
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros(flow.shape[:2] + (3,), np.uint8)
    for c in range(3):
        col0 = wheel[k0, c] / 255.0
        col1 = wheel[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., c] = np.floor(255 * col)
    return img


# -- profiling (SURVEY §5: jax.profiler annotations + perfetto traces) ----
import contextlib as _contextlib


@_contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in a jax.profiler trace (the TPU-side analog of the
    reference's torch.profiler record_function; shows up in perfetto)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@_contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a perfetto/tensorboard trace of the enclosed block
    (``jax.profiler.start_trace``/``stop_trace``)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

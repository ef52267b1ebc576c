"""Image IO (reference ``torchvision/io/image.py``, 639 LoC over the
native codecs in ``csrc/io/image/cpu``).

Decoding runs on the TPU-VM host through the native shim (libjpeg/libpng/
libwebp via ``vision_tpu/csrc/image_codecs.cpp``), with a PIL fallback.
Arrays are channels-last uint8 HWC (the reference returns CHW; channels-
last is this framework's native layout)."""

from __future__ import annotations

import enum
import io as _io
import pathlib
from typing import Optional, Union

import numpy as np

from vision_tpu.io import _codecs

__all__ = [
    "ImageReadMode",
    "read_file",
    "write_file",
    "decode_avif",
    "decode_heic",
    "decode_image",
    "decode_jpeg",
    "decode_png",
    "decode_png16",
    "decode_gif",
    "decode_webp",
    "encode_jpeg",
    "encode_png",
    "write_jpeg",
    "write_png",
    "read_image",
]


class ImageReadMode(enum.Enum):
    """reference ``io/image.py`` ImageReadMode."""

    UNCHANGED = 0
    GRAY = 1
    GRAY_ALPHA = 2
    RGB = 3
    RGB_ALPHA = 4


def read_file(path: Union[str, pathlib.Path]) -> bytes:
    """reference ``io/image.py:59`` (csrc read_write_file.cpp)."""
    with open(path, "rb") as f:
        return f.read()


def write_file(path: Union[str, pathlib.Path], data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def _apply_mode(arr: np.ndarray, mode: ImageReadMode) -> np.ndarray:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    c = arr.shape[2]
    if mode == ImageReadMode.UNCHANGED:
        return arr
    if mode == ImageReadMode.GRAY:
        if c == 1:
            return arr
        if c == 2:  # gray+alpha: channel 0 is the luma plane
            return arr[:, :, :1]
        rgb = arr[:, :, :3].astype(np.float32)
        l = 0.2989 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        return l.astype(np.uint8)[:, :, None]
    if mode == ImageReadMode.RGB:
        if c == 3:
            return arr
        if c == 1:
            return np.repeat(arr, 3, axis=2)
        if c == 2:  # gray+alpha -> replicate luma, drop alpha
            return np.repeat(arr[:, :, :1], 3, axis=2)
        return arr[:, :, :3]
    if mode == ImageReadMode.RGB_ALPHA:
        if c == 4:
            return arr
        rgb = _apply_mode(arr, ImageReadMode.RGB)
        alpha = (
            arr[:, :, 1:2]
            if c == 2
            else np.full(rgb.shape[:2] + (1,), 255, np.uint8)
        )
        return np.concatenate([rgb, alpha], axis=2)
    if mode == ImageReadMode.GRAY_ALPHA:
        if c == 2:
            return arr
        g = _apply_mode(arr, ImageReadMode.GRAY)
        alpha = (
            arr[:, :, 3:4]
            if c == 4
            else np.full(g.shape[:2] + (1,), 255, np.uint8)
        )
        return np.concatenate([g, alpha], axis=2)
    raise ValueError(f"unsupported mode {mode}")


def _pil_decode(data: bytes) -> np.ndarray:
    import PIL.Image

    with PIL.Image.open(_io.BytesIO(data)) as im:
        arr = np.asarray(im.convert(im.mode if im.mode in ("L", "RGB", "RGBA") else "RGB"))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _exif_orient(
    arr: np.ndarray, data: bytes, container: str, apply: bool
) -> np.ndarray:
    """Apply the container's EXIF orientation tag to a decoded array (the
    reference applies it post-decode, ``io/image.py:96,177``). No-op when
    ``apply`` is False; always returns a contiguous array otherwise."""
    if not apply:
        return arr
    from vision_tpu.io import _exif

    parse = (
        _exif.parse_jpeg_exif_orientation
        if container == "jpeg"
        else _exif.parse_png_exif_orientation
    )
    return np.ascontiguousarray(
        _exif.exif_orientation_transform(arr, parse(bytes(data)))
    )


def decode_jpeg(
    data: bytes,
    mode: ImageReadMode = ImageReadMode.UNCHANGED,
    scale=None,
    device: str = "cpu",
    apply_exif_orientation: bool = False,
) -> np.ndarray:
    """reference ``io/image.py:173``; returns HWC uint8.

    ``apply_exif_orientation`` applies the APP1 orientation tag
    (reference ``io/image.py:177``, ``csrc/io/image/cpu/exif.h``) —
    unlike the reference's CUDA batch path (which silently ignores the
    flag, ``io/image.py:231``), the TPU offload path honors it too.

    ``scale=(num, den)`` decodes at num/den size via libjpeg DCT scaling
    (den=8, num=1..16) — ~(num/den)^2 of the full IDCT cost; the host-side
    analog of nvJPEG scaled decode for pipelines that resize down anyway.

    ``device="tpu"`` (with ``data`` a list of buffers) is the analog of the
    reference's ``device="cuda"`` nvJPEG batch path (``io/image.py:233``):
    host Huffman decode + on-device IDCT/upsample/color via
    ``io/jpeg_tpu.py``; falls back to the host loop when the batch is not
    geometry-uniform or a stream is unsupported. Like the reference's
    CUDA path, it supports ``mode`` RGB/GRAY (UNCHANGED decodes to RGB —
    the device kernel always produces 3 channels) and a LIST input always
    returns a LIST of per-image arrays, whichever path produced them."""
    if device == "tpu":
        from vision_tpu.io.jpeg_tpu import decode_jpeg_batch_tpu

        if mode in (ImageReadMode.GRAY_ALPHA, ImageReadMode.RGB_ALPHA):
            raise ValueError(
                "decode_jpeg(device='tpu') supports UNCHANGED/RGB/GRAY "
                "(JPEG has no alpha; the host path synthesizes it)"
            )
        coef_limit = 0
        if scale is not None:
            if scale[1] != 8 or not 1 <= scale[0] <= 7:
                raise ValueError(
                    "device='tpu' DCT scaling supports scale=(M, 8) with "
                    f"M in 1..7, got {scale}"
                )
            coef_limit = scale[0]
        is_list = isinstance(data, (list, tuple))
        buffers = data if is_list else [data]
        out = decode_jpeg_batch_tpu(buffers, coef_limit=coef_limit)
        if out is not None:
            if mode == ImageReadMode.GRAY:
                import jax.numpy as jnp

                w = jnp.asarray([0.2989, 0.587, 0.114], jnp.float32)
                g = jnp.sum(out.astype(jnp.float32) * w, axis=-1)
                # truncate like _apply_mode / the reference rgb_to_gray
                out = jnp.clip(g, 0, 255).astype(jnp.uint8)[..., None]
            decoded = list(out)
            if apply_exif_orientation:
                from vision_tpu.io._exif import (
                    exif_orientation_transform,
                    parse_jpeg_exif_orientation,
                )

                decoded = [
                    exif_orientation_transform(
                        img, parse_jpeg_exif_orientation(bytes(b))
                    )
                    for img, b in zip(decoded, buffers)
                ]
        else:
            decoded = [
                decode_jpeg(
                    b,
                    mode=ImageReadMode.RGB
                    if mode == ImageReadMode.UNCHANGED
                    else mode,
                    scale=scale,
                    apply_exif_orientation=apply_exif_orientation,
                )
                for b in buffers
            ]
        return decoded if is_list else decoded[0]
    if isinstance(data, (list, tuple)):
        return [
            decode_jpeg(
                b,
                mode=mode,
                scale=scale,
                apply_exif_orientation=apply_exif_orientation,
            )
            for b in data
        ]
    def _orient(arr: np.ndarray) -> np.ndarray:
        return _exif_orient(arr, data, "jpeg", apply_exif_orientation)

    if scale is not None:
        arr = _codecs.decode_jpeg_scaled_native(data, scale[0], scale[1])
        if arr is not None:
            return _orient(_apply_mode(arr, mode))
        # native scaled decode unavailable: decode full size and resample
        # to the scaled dims rather than silently returning full size
        full = _codecs.decode_jpeg_native(data)
        if full is None:
            full = _pil_decode(data)
        import math as _math

        import PIL.Image

        num, den = scale
        nh = _math.ceil(full.shape[0] * num / den)
        nw = _math.ceil(full.shape[1] * num / den)
        squeeze = full.ndim == 3 and full.shape[2] == 1
        pil = PIL.Image.fromarray(full[..., 0] if squeeze else full)
        arr = np.asarray(pil.resize((nw, nh), PIL.Image.BILINEAR))
        if squeeze:
            arr = arr[..., None]
        return _orient(_apply_mode(arr, mode))
    arr = _codecs.decode_jpeg_native(data)
    if arr is None:
        arr = _pil_decode(data)
    return _orient(_apply_mode(arr, mode))


def decode_png(
    data: bytes,
    mode: ImageReadMode = ImageReadMode.UNCHANGED,
    apply_exif_orientation: bool = False,
) -> np.ndarray:
    """reference ``io/image.py:93`` (``apply_exif_orientation`` at
    :96; PNG stores the TIFF block in an eXIf chunk)."""
    arr = _codecs.decode_png_native(data)
    if arr is None:
        arr = _pil_decode(data)
    return _exif_orient(_apply_mode(arr, mode), data, "png", apply_exif_orientation)


def decode_png16(data: bytes) -> np.ndarray:
    """16-bit PNG -> (H, W, C) uint16 (reference ``decode_png`` keeps
    16-bit; used by KITTI/HD1K flow and 16-bit depth maps). Requires the
    native codec — PIL downconverts 16-bit multichannel PNGs."""
    arr = _codecs.decode_png16_native(data)
    if arr is None:
        raise RuntimeError(
            "decode_png16 requires the native codec (not a 16-bit PNG, or "
            "libvtpu_codecs.so unavailable)"
        )
    return arr


def decode_webp(
    data: bytes, mode: ImageReadMode = ImageReadMode.UNCHANGED
) -> np.ndarray:
    """reference ``io/image.py:383``."""
    arr = _codecs.decode_webp_native(data)
    if arr is None:
        arr = _pil_decode(data)
    return _apply_mode(arr, mode)


def decode_gif(data: bytes) -> np.ndarray:
    """reference ``io/image.py:362``: animated GIF -> (N, H, W, 3) uint8.
    Native clean-room decoder (csrc vtpu_decode_gif — the giflib analog of
    reference ``csrc/io/image/cpu/decode_gif.cpp``) with PIL fallback."""
    from vision_tpu.io._codecs import decode_gif_native

    native = decode_gif_native(data)
    if native is not None:
        return native[0] if native.shape[0] == 1 else native
    import PIL.Image

    frames = []
    with PIL.Image.open(_io.BytesIO(data)) as im:
        try:
            while True:
                frames.append(np.asarray(im.convert("RGB")))
                im.seek(im.tell() + 1)
        except EOFError:
            pass
    out = np.stack(frames)
    return out[0] if out.shape[0] == 1 else out


_JPEG_MAGIC = b"\xff\xd8\xff"
_PNG_MAGIC = b"\x89PNG"
_GIF_MAGIC = b"GIF"
_WEBP_RIFF = b"RIFF"


def decode_image(
    data: Union[bytes, np.ndarray],
    mode: ImageReadMode = ImageReadMode.UNCHANGED,
    apply_exif_orientation: bool = False,
) -> np.ndarray:
    """Magic-byte dispatch (reference ``csrc/io/image/cpu/decode_image.cpp:80``).

    ``apply_exif_orientation`` routes to the JPEG/PNG decoders only —
    the reference's GIF/WebP decoders take no such flag either."""
    if isinstance(data, np.ndarray):
        data = data.tobytes()
    if data[:3] == _JPEG_MAGIC:
        return decode_jpeg(
            data, mode, apply_exif_orientation=apply_exif_orientation
        )
    if data[:4] == _PNG_MAGIC:
        return decode_png(
            data, mode, apply_exif_orientation=apply_exif_orientation
        )
    if data[:3] == _GIF_MAGIC:
        out = decode_gif(data)
        return _apply_mode(out, mode) if out.ndim == 3 else out
    if data[:4] == _WEBP_RIFF and data[8:12] == b"WEBP":
        return decode_webp(data, mode)
    raise RuntimeError(
        "Unsupported image format: expected jpeg/png/gif/webp magic bytes"
    )


def encode_jpeg(img: np.ndarray, quality: int = 75) -> bytes:
    """reference ``io/image.py`` encode_jpeg; img HWC uint8, 1 or 3
    channels (the reference's permitted set — grayscale writes a real
    1-component JPEG)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError(
            "encode_jpeg: permitted channel values are 1 or 3, got shape "
            f"{img.shape}"
        )
    out = _codecs.encode_jpeg_native(img, quality)
    if out is not None:
        return out
    import PIL.Image

    buf = _io.BytesIO()
    PIL.Image.fromarray(img.squeeze()).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def encode_png(img: np.ndarray, compression_level: int = 6) -> bytes:
    img = np.asarray(img)
    out = _codecs.encode_png_native(img, compression_level)
    if out is not None:
        return out
    import PIL.Image

    buf = _io.BytesIO()
    PIL.Image.fromarray(img.squeeze()).save(
        buf, format="PNG", compress_level=compression_level
    )
    return buf.getvalue()


def write_jpeg(img: np.ndarray, filename, quality: int = 75) -> None:
    write_file(filename, encode_jpeg(img, quality))


def write_png(img: np.ndarray, filename, compression_level: int = 6) -> None:
    write_file(filename, encode_png(img, compression_level))


def read_image(
    path: Union[str, pathlib.Path],
    mode: ImageReadMode = ImageReadMode.UNCHANGED,
    apply_exif_orientation: bool = False,
) -> np.ndarray:
    """reference ``io/image.py:350``: read + decode."""
    return decode_image(
        read_file(path), mode, apply_exif_orientation=apply_exif_orientation
    )


def _pil_decode_optional(data: bytes, what: str) -> np.ndarray:
    import io as _io2

    try:
        import PIL.Image

        with PIL.Image.open(_io2.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB"))
    except Exception as e:
        raise RuntimeError(
            f"decode_{what} requires an {what.upper()}-capable decoder "
            "(the reference gates this on the optional "
            "torchvision-extra-decoders package; here on PIL plugin support)"
        ) from e


def decode_avif(data: bytes, mode: ImageReadMode = ImageReadMode.UNCHANGED) -> np.ndarray:
    """reference ``io/image.py:464`` (optional-decoder gated)."""
    return _apply_mode(_pil_decode_optional(data, "avif"), mode)


def decode_heic(data: bytes, mode: ImageReadMode = ImageReadMode.UNCHANGED) -> np.ndarray:
    """reference ``io/image.py:501`` (optional-decoder gated)."""
    return _apply_mode(_pil_decode_optional(data, "heic"), mode)

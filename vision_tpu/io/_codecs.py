"""ctypes bindings for the native codec shim (the loader analog of
``torchvision/extension.py`` ``_load_library``).

Compiles ``csrc/image_codecs.cpp`` on first use into the package dir;
falls back to PIL when the toolchain/libs are unavailable (the reference's
no-extension degradation path)."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


class _VtpuImage(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("height", ctypes.c_int),
        ("width", ctypes.c_int),
        ("channels", ctypes.c_int),
    ]


def _build_lib(src: pathlib.Path, out: pathlib.Path) -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", str(src), "-o", str(out),
                "-ljpeg", "-lpng", "-lwebp",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        pkg = pathlib.Path(__file__).resolve().parent.parent
        src = pkg / "csrc" / "image_codecs.cpp"
        so = pkg / "csrc" / "libvtpu_codecs.so"
        # a prebuilt .so without the csrc source (installed wheel, cleaned
        # tree) loads as-is; rebuild only when the source is present and
        # newer
        if not so.exists():
            if not src.exists() or not _build_lib(src, so):
                return None
        elif src.exists() and so.stat().st_mtime < src.stat().st_mtime:
            if not _build_lib(src, so):
                return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        lib.vtpu_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_VtpuImage)
        ]
        lib.vtpu_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_VtpuImage)
        ]
        lib.vtpu_decode_webp.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_VtpuImage)
        ]
        lib.vtpu_decode_png16.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_VtpuImage)
        ]
        lib.vtpu_encode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.vtpu_encode_png.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.vtpu_decode_jpeg_scaled.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(_VtpuImage),
        ]
        lib.vtpu_decode_gif.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vtpu_jpeg_coefficients.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
        ]
        lib.vtpu_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _LIB = lib
        return lib


def has_native() -> bool:
    return _load() is not None


def _decode_with(fn_name: str, data: bytes) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = _VtpuImage()
    rc = getattr(lib, fn_name)(data, len(data), ctypes.byref(img))
    if rc != 0:
        return None
    n = img.height * img.width * img.channels
    arr = np.ctypeslib.as_array(img.data, shape=(n,)).copy()
    lib.vtpu_free(img.data)
    return arr.reshape(img.height, img.width, img.channels)


def decode_jpeg_native(data: bytes) -> Optional[np.ndarray]:
    return _decode_with("vtpu_decode_jpeg", data)


def decode_png_native(data: bytes) -> Optional[np.ndarray]:
    return _decode_with("vtpu_decode_png", data)


def decode_webp_native(data: bytes) -> Optional[np.ndarray]:
    return _decode_with("vtpu_decode_webp", data)


def decode_png16_native(data: bytes) -> Optional[np.ndarray]:
    """16-bit PNG -> (H, W, C) uint16 (reference decode_png keeps 16-bit)."""
    lib = _load()
    if lib is None:
        return None
    img = _VtpuImage()
    rc = lib.vtpu_decode_png16(data, len(data), ctypes.byref(img))
    if rc != 0:
        return None
    n = img.height * img.width * img.channels * 2
    raw = np.ctypeslib.as_array(img.data, shape=(n,)).copy()
    lib.vtpu_free(img.data)
    return raw.view(np.uint16).reshape(img.height, img.width, img.channels)


def encode_jpeg_native(img: np.ndarray, quality: int = 75) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w = img.shape[:2]
    c = img.shape[2]
    if img.ndim != 3 or c not in (1, 3):
        return None  # PIL fallback handles/raises on other layouts
    buf = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.vtpu_encode_jpeg(
        img.tobytes(), h, w, c, quality,
        ctypes.byref(buf), ctypes.byref(out_len),
    )
    if rc != 0:
        return None
    data = bytes(np.ctypeslib.as_array(buf, shape=(out_len.value,)))
    lib.vtpu_free(buf)
    return data


def encode_png_native(img: np.ndarray, compression: int = 6) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    if c not in (1, 2, 3, 4):
        return None
    buf = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.vtpu_encode_png(
        img.tobytes(), h, w, c, compression, ctypes.byref(buf),
        ctypes.byref(out_len),
    )
    if rc != 0:
        return None
    data = bytes(np.ctypeslib.as_array(buf, shape=(out_len.value,)))
    lib.vtpu_free(buf)
    return data


def decode_gif_native(data: bytes) -> Optional[np.ndarray]:
    """Animated GIF -> (N, H, W, 3) uint8 via the clean-room native decoder
    (LZW + interlace + disposal compositing; the reference vendors giflib,
    ``csrc/io/image/cpu/decode_gif.cpp``)."""
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_uint8)()
    n = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.vtpu_decode_gif(
        data, len(data), ctypes.byref(buf), ctypes.byref(n), ctypes.byref(h),
        ctypes.byref(w),
    )
    if rc != 0:
        return None
    total = n.value * h.value * w.value * 3
    arr = np.ctypeslib.as_array(buf, shape=(total,)).copy()
    lib.vtpu_free(buf)
    return arr.reshape(n.value, h.value, w.value, 3)


def decode_jpeg_scaled_native(
    data: bytes, scale_num: int, scale_den: int
) -> Optional[np.ndarray]:
    """JPEG decode at scale_num/scale_den (libjpeg DCT scaling, M/8 with
    M=1..16): ~(M/8)^2 of the full IDCT cost. The input-pipeline fast path
    when the consumer resizes down anyway."""
    lib = _load()
    if lib is None:
        return None
    img = _VtpuImage()
    rc = lib.vtpu_decode_jpeg_scaled(
        data, len(data), scale_num, scale_den, ctypes.byref(img)
    )
    if rc != 0:
        return None
    n = img.height * img.width * img.channels
    arr = np.ctypeslib.as_array(img.data, shape=(n,)).copy()
    lib.vtpu_free(img.data)
    return arr.reshape(img.height, img.width, img.channels)


def jpeg_coefficients_native(data: bytes, coef_limit: int = 0):
    """Entropy-decode a baseline or progressive JPEG to quantized DCT
    coefficients (the
    host half of the TPU-offloaded decode; see csrc vtpu_jpeg_coefficients
    and vision_tpu/io/jpeg_tpu.py for the device half).

    Returns ``(coefs, qtabs, samp, (H, W))`` where ``coefs[ci]`` is an
    int16 array of shape ``(blocks_h, blocks_w, M*M)`` (natural coefficient
    order; M = ``coef_limit`` or 8), ``qtabs[ci]`` a uint16 ``(64,)``
    quantization table and ``samp[ci] = (h_samp, v_samp)``; or None when
    the native lib is absent or the stream is unsupported (>3 components,
    e.g. CMYK; progressive scans ARE supported — libjpeg's
    ``jpeg_read_coefficients`` accumulates successive-approximation and
    spectral-selection passes into the same coefficient buffer, so the
    host/device split point is unchanged). ``coef_limit`` in 1..7 keeps only the
    top-left MxM coefficients per block for M/8-scale device decode.
    """
    lib = _load()
    if lib is None:
        return None
    m = coef_limit if 0 < coef_limit < 8 else 8
    ncomp = ctypes.c_int()
    height = ctypes.c_int()
    width = ctypes.c_int()
    blocks_h = (ctypes.c_int * 3)()
    blocks_w = (ctypes.c_int * 3)()
    samp_h = (ctypes.c_int * 3)()
    samp_v = (ctypes.c_int * 3)()
    qtab = (ctypes.c_uint16 * (3 * 64))()
    coef_ptrs = (ctypes.POINTER(ctypes.c_int16) * 3)()
    rc = lib.vtpu_jpeg_coefficients(
        data, len(data), coef_limit, ctypes.byref(ncomp),
        ctypes.byref(height), ctypes.byref(width), blocks_h, blocks_w,
        samp_h, samp_v, qtab, coef_ptrs,
    )
    if rc != 0:
        return None
    coefs = []
    qtabs = []
    samp = []
    for ci in range(ncomp.value):
        bh, bw = blocks_h[ci], blocks_w[ci]
        arr = np.ctypeslib.as_array(
            coef_ptrs[ci], shape=(bh * bw * m * m,)
        )
        coefs.append(arr.copy().reshape(bh, bw, m * m))
        lib.vtpu_free(
            ctypes.cast(coef_ptrs[ci], ctypes.POINTER(ctypes.c_uint8))
        )
        qtabs.append(np.array(qtab[ci * 64 : (ci + 1) * 64], np.uint16))
        samp.append((samp_h[ci], samp_v[ci]))
    return coefs, qtabs, samp, (height.value, width.value)

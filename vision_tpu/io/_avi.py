"""Clean-room MJPEG-AVI container mux/demux (pure Python RIFF).

The reference's video IO (``torchvision/io/video.py``) is pyav-backed and
simply fails when pyav is absent. This module gives ``vision_tpu.io``
a dependency-free video path for the one codec this framework already
owns end-to-end: Motion-JPEG in an AVI (RIFF) container — every frame is
a baseline JPEG decoded/encoded by the native codec shim
(``csrc/image_codecs.cpp``). It is NOT a general demuxer: exactly one
'vids' stream, MJPG/raw-JPEG compression, no audio.

Layout written (and the subset parsed):

    RIFF <sz> 'AVI '
      LIST <sz> 'hdrl'
        'avih' (56)            — MainAVIHeader
        LIST <sz> 'strl'
          'strh' (56)          — AVIStreamHeader, fccType='vids'
          'strf' (40)          — BITMAPINFOHEADER, biCompression='MJPG'
      LIST <sz> 'movi'
        '00dc' <len> <jpeg>    — one chunk per frame, even-padded
        ...
      'idx1' (16*n)            — AVIOLDINDEX, offsets relative to 'movi'

Reading is a tolerant chunk walk: it scans for the 'movi' LIST and
collects '00dc'/'00db' payloads, so files from other muxers (ffmpeg
MJPEG output, OpenCV VideoWriter with MJPG) parse as long as frames are
self-contained JPEGs. Frame timing comes from strh dwRate/dwScale with
the avih dwMicroSecPerFrame as fallback.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

__all__ = ["is_avi", "demux_avi", "mux_avi", "AviInfo"]


class AviInfo:
    """Parsed stream parameters: fps as a (rate, scale) rational."""

    def __init__(self, width: int, height: int, rate: int, scale: int, n_frames: int):
        self.width = width
        self.height = height
        self.rate = rate
        self.scale = scale
        self.n_frames = n_frames

    @property
    def fps(self) -> float:
        return self.rate / self.scale if self.scale else 0.0

    @property
    def duration(self) -> float:
        return self.n_frames * self.scale / self.rate if self.rate else 0.0


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size, list_type) chunks."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + size > end:
            size = max(0, end - payload)  # truncated file: clamp
        if fourcc in (b"LIST", b"RIFF") and size >= 4:
            yield fourcc, payload, size, data[payload : payload + 4]
        else:
            yield fourcc, payload, size, None
        pos = payload + size + (size & 1)  # chunks are even-aligned


def demux_avi(data: bytes) -> Tuple[List[bytes], AviInfo]:
    """Extract per-frame JPEG buffers + stream info from an AVI blob."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI file")
    frames: List[bytes] = []
    width = height = 0
    rate, scale = 0, 1
    usec_per_frame = 0
    n_declared = 0

    def scan(start, end):
        nonlocal width, height, rate, scale, usec_per_frame, n_declared
        for fourcc, payload, size, ltype in _walk(data, start, end):
            if fourcc in (b"LIST", b"RIFF"):
                if ltype == b"movi":
                    for cid, p, s, _ in _walk(data, payload + 4, payload + size):
                        # 00dc = compressed video, 00db = uncompressed slot
                        # (some MJPEG muxers use it anyway); rec  lists nest
                        if cid[2:] in (b"dc", b"db") and s > 0:
                            frames.append(data[p : p + s])
                        elif cid == b"LIST":
                            scan(p + 4, p + s)
                else:
                    scan(payload + 4, payload + size)
            elif fourcc == b"avih" and size >= 40:
                (usec_per_frame,) = struct.unpack_from("<I", data, payload)
                (n_declared,) = struct.unpack_from("<I", data, payload + 16)
                width, height = struct.unpack_from("<II", data, payload + 32)
            elif fourcc == b"strh" and size >= 32:
                if data[payload : payload + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", data, payload + 20)

    scan(12, len(data))
    if not rate:
        # fall back to the avih frame period
        if usec_per_frame:
            rate, scale = 1_000_000, usec_per_frame
        else:
            rate, scale = 25, 1
    return frames, AviInfo(width, height, rate, scale, len(frames))


def mux_avi(
    jpeg_frames: List[bytes],
    width: int,
    height: int,
    fps_rate: int,
    fps_scale: int = 1,
) -> bytes:
    """Assemble an MJPEG AVI from pre-encoded JPEG frames."""
    n = len(jpeg_frames)
    max_size = max((len(f) for f in jpeg_frames), default=0)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(fps_scale * 1_000_000 / fps_rate) if fps_rate else 0,  # usec/frame
        max_size * fps_rate // max(fps_scale, 1),  # max bytes/sec (advisory)
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        n, 0, 1,  # total frames, initial frames, streams
        max_size, width, height,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIii4h",
        b"vids", b"MJPG",
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        fps_scale, fps_rate,  # dwScale, dwRate: fps = rate/scale
        0, n,  # dwStart, dwLength (frames)
        max_size, -1, 0,  # dwSuggestedBufferSize, dwQuality, dwSampleSize
        0, 0, width, height,  # rcFrame l, t, r, b
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_payload = b"movi"
    index = []
    for f in jpeg_frames:
        # idx1 offsets are relative to the 'movi' fourcc position (the
        # ffmpeg/VfW convention: the first chunk is at offset 4)
        index.append((len(movi_payload), len(f)))
        movi_payload += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_payload)

    idx1 = b"".join(
        struct.pack("<4sIII", b"00dc", 0x10, off, size) for off, size in index
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body

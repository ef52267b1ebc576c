"""Video IO (reference ``torchvision/io/video.py``: pyav-backed).

PyAV is not available in this environment; the API surface is kept with a
clear gate, and two fallbacks are wired:

* pyav, when importable — full codec coverage (the reference's backend);
* a dependency-free MJPEG-AVI path (``io/_avi.py``: clean-room RIFF
  mux/demux + the native JPEG codec from ``csrc/image_codecs.cpp``) for
  ``.avi`` files whose frames are baseline JPEGs — ffmpeg ``-c:v mjpeg``
  and OpenCV ``VideoWriter(..., 'MJPG')`` output parse on this path.

Timestamp semantics on the AVI path: AVI is a fixed-rate container; frame
i has pts = i (in units of the stream time base scale/rate), so
``pts_unit="pts"`` bounds are frame indices and ``"sec"`` bounds are
``i * scale / rate`` — the same values pyav reports for such files.
"""

from __future__ import annotations

import shutil
from typing import Optional

import numpy as np

__all__ = [
    "read_video",
    "write_video",
    "read_video_timestamps",
    "video_backend_available",
]


def _has_av() -> bool:
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        return False


def _has_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def video_backend_available() -> bool:
    return _has_av() or _has_ffmpeg()


def _read_avi(path: str):
    """(frames [T,H,W,3] uint8, pts list (frame indices), AviInfo)."""
    from vision_tpu.io._avi import demux_avi
    from vision_tpu.io.image import decode_jpeg

    with open(path, "rb") as f:
        data = f.read()
    bufs, info = demux_avi(data)
    frames = [decode_jpeg(b) for b in bufs]
    return frames, list(range(len(frames))), info


def _is_avi_file(path: str) -> bool:
    from vision_tpu.io._avi import is_avi

    try:
        with open(path, "rb") as f:
            return is_avi(f.read(12))
    except OSError:
        return False


def read_video(
    path: str,
    start_pts: float = 0.0,
    end_pts: Optional[float] = None,
    pts_unit: str = "pts",
):
    """reference ``io/video.py`` read_video -> (video [T,H,W,C] uint8,
    audio, info). ``pts_unit="pts"`` (the reference's default) bounds in
    raw stream timestamps; ``"sec"`` in seconds."""
    if pts_unit not in ("sec", "pts"):
        raise ValueError(f"pts_unit must be 'sec' or 'pts', got {pts_unit!r}")
    if _has_av():
        import av

        frames = []
        rate = None
        with av.open(path) as container:
            stream = container.streams.video[0]
            rate = float(stream.average_rate)
            if pts_unit == "pts":
                tb = float(stream.time_base)
                start_pts = start_pts * tb
                end_pts = None if end_pts is None else end_pts * tb
            for frame in container.decode(video=0):
                t = float(frame.pts * stream.time_base) if frame.pts else 0.0
                if t < start_pts:
                    continue
                if end_pts is not None and t > end_pts:
                    break
                frames.append(frame.to_ndarray(format="rgb24"))
        video = np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)
        return video, np.zeros((1, 0)), {"video_fps": rate}
    if _is_avi_file(path):
        frames, pts, info = _read_avi(path)
        if pts_unit == "sec":
            tb = info.scale / info.rate if info.rate else 0.0
            ts = [p * tb for p in pts]
        else:
            ts = pts
        kept = [
            f
            for f, t in zip(frames, ts)
            if t >= start_pts and (end_pts is None or t <= end_pts)
        ]
        video = np.stack(kept) if kept else np.zeros((0, 0, 0, 3), np.uint8)
        return video, np.zeros((1, 0)), {"video_fps": info.fps}
    if _has_ffmpeg():
        raise NotImplementedError(
            "ffmpeg-CLI video reading not wired yet; install pyav"
        )
    raise RuntimeError(
        "No video backend available for this file (pyav not installed; "
        "the built-in fallback reads MJPEG .avi only)"
    )


def write_video(path: str, video: np.ndarray, fps: int, **kwargs):
    """reference ``io/video.py`` write_video. Without pyav, writes
    MJPEG-AVI (``video_codec`` must be left default or 'mjpeg'; any
    other codec requires pyav)."""
    video = np.asarray(video)
    if _has_av():
        import av

        with av.open(path, "w") as container:
            stream = container.add_stream(
                kwargs.get("video_codec", "libx264"), rate=fps
            )
            stream.height, stream.width = video.shape[1:3]
            for frame_arr in video:
                frame = av.VideoFrame.from_ndarray(frame_arr, format="rgb24")
                for packet in stream.encode(frame):
                    container.mux(packet)
            for packet in stream.encode():
                container.mux(packet)
        return
    codec = kwargs.get("video_codec", "mjpeg")
    if codec not in ("mjpeg", "mjpg"):
        raise RuntimeError(f"write_video(video_codec={codec!r}) requires pyav")
    from vision_tpu.io._avi import mux_avi
    from vision_tpu.io.image import encode_jpeg

    quality = int(kwargs.get("quality", 90))
    h, w = video.shape[1], video.shape[2]
    bufs = [encode_jpeg(frame, quality=quality) for frame in video]
    # accept integer or rational fps
    rate, scale = (fps, 1) if isinstance(fps, int) else (round(fps * 1000), 1000)
    with open(path, "wb") as f:
        f.write(mux_avi(bufs, w, h, rate, scale))


def read_video_timestamps(path: str, pts_unit: str = "sec"):
    if _has_av():
        import av

        with av.open(path) as container:
            stream = container.streams.video[0]
            pts = [
                float(p.pts * stream.time_base)
                for p in container.demux(stream)
                if p.pts is not None
            ]
        return pts, float(stream.average_rate)
    if _is_avi_file(path):
        from vision_tpu.io._avi import demux_avi

        with open(path, "rb") as f:
            bufs, info = demux_avi(f.read())
        n = len(bufs)
        if pts_unit == "sec":
            tb = info.scale / info.rate if info.rate else 0.0
            return [i * tb for i in range(n)], info.fps
        return list(range(n)), info.fps
    raise RuntimeError("read_video_timestamps requires pyav or an MJPEG .avi")


class Timebase:
    """reference ``io`` Timebase: rational stream time base."""

    def __init__(self, numerator: int = 0, denominator: int = 1):
        self.numerator = numerator
        self.denominator = denominator


class VideoMetaData:
    """reference ``io`` VideoMetaData."""

    def __init__(self):
        self.has_video = False
        self.video_timebase = Timebase()
        self.video_duration = 0.0
        self.video_fps = 0.0
        self.has_audio = False
        self.audio_timebase = Timebase()
        self.audio_duration = 0.0
        self.audio_sample_rate = 0.0


class _AviFrameSource:
    """VideoReader backend over the MJPEG-AVI demuxer (video stream only)."""

    def __init__(self, src: str):
        from vision_tpu.io._avi import demux_avi

        with open(src, "rb") as f:
            self._bufs, self._info = demux_avi(f.read())

    def frames(self, start_s: float):
        from vision_tpu.io.image import decode_jpeg

        tb = self._info.scale / self._info.rate if self._info.rate else 0.0
        for i, buf in enumerate(self._bufs):
            pts = i * tb
            if pts < start_s:
                continue
            yield {"data": decode_jpeg(buf), "pts": pts}

    def metadata(self):
        return {
            "video": {
                "duration": [self._info.duration],
                "fps": [self._info.fps],
            }
        }


class VideoReader:
    """Fine-grained frame iterator (reference ``io`` VideoReader): yields
    {"data": (H, W, C) uint8, "pts": seconds}; ``seek`` + ``get_metadata``.
    pyav-backed, with the MJPEG-AVI fallback for .avi files."""

    def __init__(self, src: str, stream: str = "video"):
        self._stream_kind = stream.split(":")[0]
        self._gen = None
        self._start = 0.0
        self._container = None
        self._avi = None
        if _has_av():
            import av

            self._container = av.open(src)
            return
        if self._stream_kind == "video" and _is_avi_file(src):
            self._avi = _AviFrameSource(src)
            return
        raise RuntimeError(
            "VideoReader requires pyav (built-in fallback reads MJPEG .avi "
            "video streams only)"
        )

    def _frames(self):
        if self._avi is not None:
            yield from self._avi.frames(self._start)
            return
        stream = (
            self._container.streams.video[0]
            if self._stream_kind == "video"
            else self._container.streams.audio[0]
        )
        for frame in self._container.decode(stream):
            pts = float(frame.pts * stream.time_base) if frame.pts else 0.0
            if pts < self._start:
                continue
            data = (
                frame.to_ndarray(format="rgb24")
                if self._stream_kind == "video"
                else frame.to_ndarray()
            )
            yield {"data": data, "pts": pts}

    def __iter__(self):
        self._gen = self._frames()
        return self

    def __next__(self):
        if self._gen is None:
            self._gen = self._frames()
        return next(self._gen)

    def seek(self, time_s: float, keyframes_only: bool = False):
        if self._avi is None:
            # seek on the stream being read (an audio reader must not index
            # streams.video — audio-only files have none, and a muxed file
            # would get the wrong timebase)
            stream = (
                self._container.streams.video[0]
                if self._stream_kind == "video"
                else self._container.streams.audio[0]
            )
            self._container.seek(
                int(time_s / stream.time_base), stream=stream,
                any_frame=not keyframes_only,
            )
        self._start = time_s
        self._gen = None
        return self

    def get_metadata(self):
        if self._avi is not None:
            return self._avi.metadata()
        out = {}
        v = self._container.streams.video
        if v:
            out["video"] = {
                "duration": [float(v[0].duration * v[0].time_base)
                             if v[0].duration else 0.0],
                "fps": [float(v[0].average_rate or 0.0)],
            }
        a = self._container.streams.audio
        if a:
            out["audio"] = {
                "duration": [float(a[0].duration * a[0].time_base)
                             if a[0].duration else 0.0],
                "framerate": [float(a[0].sample_rate or 0.0)],
            }
        return out

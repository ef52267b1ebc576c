"""Video IO (reference ``torchvision/io/video.py``: pyav-backed).

PyAV is not available in this environment; the API surface is kept with a
clear gate so code importing it still works, and any available backend
(imageio/ffmpeg CLI) is used opportunistically."""

from __future__ import annotations

import shutil
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = ["read_video", "write_video", "read_video_timestamps", "video_backend_available"]


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
    if _has_ffmpeg():
        raise NotImplementedError(
            "ffmpeg-CLI video reading not wired yet; install pyav"
        )
    raise RuntimeError(
        "No video backend available (pyav/ffmpeg not installed)"
    )


def write_video(path: str, video: np.ndarray, fps: int, **kwargs):
    if not _has_av():
        raise RuntimeError("write_video requires pyav")
    import av

    with av.open(path, "w") as container:
        stream = container.add_stream("libx264", rate=fps)
        stream.height, stream.width = video.shape[1:3]
        for frame_arr in video:
            frame = av.VideoFrame.from_ndarray(frame_arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)


def read_video_timestamps(path: str, pts_unit: str = "sec"):
    if not _has_av():
        raise RuntimeError("read_video_timestamps requires pyav")
    import av

    with av.open(path) as container:
        stream = container.streams.video[0]
        pts = [
            float(p.pts * stream.time_base)
            for p in container.demux(stream)
            if p.pts is not None
        ]
    return pts, float(stream.average_rate)


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


class VideoReader:
    """Fine-grained frame iterator (reference ``io`` VideoReader): yields
    {"data": (H, W, C) uint8, "pts": seconds}; ``seek`` + ``get_metadata``.
    pyav-backed; raises if no backend is installed."""

    def __init__(self, src: str, stream: str = "video"):
        if not _has_av():
            raise RuntimeError("VideoReader requires pyav")
        import av

        self._container = av.open(src)
        self._stream_kind = stream.split(":")[0]
        self._gen = None
        self._start = 0.0

    def _frames(self):
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

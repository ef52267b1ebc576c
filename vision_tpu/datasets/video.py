"""Video classification datasets (reference ``kinetics.py``, ``hmdb51.py``,
``ucf101.py``): folder-of-class-folders video files indexed by
:class:`~vision_tpu.datasets.video_utils.VideoClips`. Samples are
``(video (T,H,W,C) uint8, audio, label)``."""

from __future__ import annotations

import os
import pathlib
from typing import Any, Dict, Optional

from vision_tpu.datasets.folder import find_classes, make_dataset
from vision_tpu.datasets.utils import verify_str_arg
from vision_tpu.datasets.video_utils import VideoClips
from vision_tpu.datasets.vision import VisionDataset

__all__ = ["Kinetics", "HMDB51", "UCF101"]

_VIDEO_EXTS = (".avi", ".mp4", ".mov", ".mkv", ".webm")


class _VideoClipDataset(VisionDataset):
    """Shared clip-dataset plumbing."""

    def __init__(self, root, frames_per_clip, step_between_clips, frame_rate,
                 transform, _precomputed_metadata, num_workers):
        super().__init__(root, transform=transform)
        self.frames_per_clip = frames_per_clip
        self._clip_args = (
            frames_per_clip, step_between_clips, frame_rate,
            _precomputed_metadata, num_workers,
        )

    def _build_clips(self, video_paths):
        fpc, step, rate, meta, workers = self._clip_args
        return VideoClips(
            video_paths, fpc, step, rate,
            _precomputed_metadata=meta, num_workers=workers,
        )

    @property
    def metadata(self):
        return self.video_clips.metadata

    def __len__(self):
        return self.video_clips.num_clips()

    def __getitem__(self, idx):
        video, audio, _info, video_idx = self.video_clips.get_clip(idx)
        label = self.samples[video_idx][1]
        if self.transform is not None:
            video = self.transform(video)
        return video, audio, label


class Kinetics(_VideoClipDataset):
    """reference ``kinetics.py``: root/<split>/<class>/*.mp4."""

    def __init__(self, root, frames_per_clip, split="train", frame_rate=None,
                 step_between_clips=1, transform=None,
                 _precomputed_metadata=None, num_workers=1, **kwargs):
        verify_str_arg(split, "split", ("train", "val", "test"))
        split_folder = os.path.join(root, split)
        base = split_folder if os.path.isdir(split_folder) else root
        super().__init__(
            base, frames_per_clip, step_between_clips, frame_rate,
            transform, _precomputed_metadata, num_workers,
        )
        self.classes, class_to_idx = find_classes(self.root)
        self.samples = make_dataset(
            self.root, class_to_idx, extensions=_VIDEO_EXTS
        )
        self.video_clips = self._build_clips([s[0] for s in self.samples])


class HMDB51(_VideoClipDataset):
    """reference ``hmdb51.py``: split files
    ``<class>_test_split<fold>.txt`` with flag 1=train, 2=test."""

    TRAIN_TAG = 1
    TEST_TAG = 2

    def __init__(self, root, annotation_path, frames_per_clip,
                 step_between_clips=1, frame_rate=None, fold=1, train=True,
                 transform=None, _precomputed_metadata=None, num_workers=1):
        if fold not in (1, 2, 3):
            raise ValueError(f"fold must be 1..3, got {fold}")
        super().__init__(
            root, frames_per_clip, step_between_clips, frame_rate,
            transform, _precomputed_metadata, num_workers,
        )
        self.classes, class_to_idx = find_classes(self.root)
        all_samples = make_dataset(self.root, class_to_idx, extensions=_VIDEO_EXTS)
        tag = self.TRAIN_TAG if train else self.TEST_TAG
        selected = self._select(annotation_path, fold, tag)
        self.samples = [
            s for s in all_samples if os.path.basename(s[0]) in selected
        ]
        self.fold, self.train = fold, train
        self.video_clips = self._build_clips([s[0] for s in self.samples])

    @staticmethod
    def _select(annotation_path, fold, tag):
        names = set()
        ann = pathlib.Path(annotation_path)
        for split_file in ann.glob(f"*test_split{fold}.txt"):
            with open(split_file) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) == 2 and int(parts[1]) == tag:
                        names.add(parts[0])
        return names


class UCF101(_VideoClipDataset):
    """reference ``ucf101.py``: ucfTrainTestlist ``trainlist0<fold>.txt`` /
    ``testlist0<fold>.txt`` with class-dir-prefixed video names."""

    def __init__(self, root, annotation_path, frames_per_clip,
                 step_between_clips=1, frame_rate=None, fold=1, train=True,
                 transform=None, _precomputed_metadata=None, num_workers=1):
        if fold not in (1, 2, 3):
            raise ValueError(f"fold must be 1..3, got {fold}")
        super().__init__(
            root, frames_per_clip, step_between_clips, frame_rate,
            transform, _precomputed_metadata, num_workers,
        )
        self.classes, class_to_idx = find_classes(self.root)
        all_samples = make_dataset(self.root, class_to_idx, extensions=_VIDEO_EXTS)
        name = f"{'train' if train else 'test'}list{fold:02d}.txt"
        with open(os.path.join(annotation_path, name)) as f:
            selected = {
                os.path.normpath(line.split()[0]) for line in f if line.strip()
            }
        root_path = os.path.normpath(self.root)
        self.samples = [
            s for s in all_samples
            if os.path.normpath(os.path.relpath(s[0], root_path)) in selected
        ]
        self.fold, self.train = fold, train
        self.video_clips = self._build_clips([s[0] for s in self.samples])

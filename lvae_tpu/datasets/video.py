"""Vimeo-90k triplet video dataset (reference: lvae/datasets/video.py:12-43).

Present for capability parity (no video model ships in the reference
snapshot either); supports video_fast_evaluate and future video models.
"""
from pathlib import Path

import numpy as np
from PIL import Image

from lvae_tpu.paths import known_datasets
from lvae_tpu.datasets.image import RandomCropFlip

__all__ = ['Vimeo90k']


class Vimeo90k:
    """Samples a random window of `frames` consecutive frames from each
    Vimeo-90k septuplet sequence, with random time reversal."""

    def __init__(self, root=None, frames=3, transform=None):
        root = Path(root) if root is not None else known_datasets['vimeo-90k']
        self.root = root
        self.frames = frames
        self.transform = transform or RandomCropFlip()
        self.sequence_dirs = sorted(d for d in Path(root).rglob('*')
                                    if d.is_dir() and any(d.glob('*.png')))
        assert len(self.sequence_dirs) > 0, f'no sequences under {root}'

    def __len__(self):
        return len(self.sequence_dirs)

    def get(self, index, rng: np.random.Generator):
        frame_paths = sorted(self.sequence_dirs[index].glob('*.png'))
        n = len(frame_paths)
        assert n >= self.frames, f'{self.sequence_dirs[index]} has {n} frames'
        start = int(rng.integers(0, n - self.frames + 1))
        window = frame_paths[start:start + self.frames]
        if rng.random() < 0.5:  # random time reversal
            window = window[::-1]
        frames = []
        for p in window:
            arr = np.asarray(Image.open(p).convert('RGB'), np.float32) / 255.0
            frames.append(arr)
        # apply one shared crop/flip to keep frames aligned
        stacked = np.concatenate(frames, axis=-1)
        stacked = self.transform(stacked, rng)
        return [stacked[..., 3 * i:3 * (i + 1)] for i in range(self.frames)]

    def __getitem__(self, index):
        return self.get(index, np.random.default_rng())

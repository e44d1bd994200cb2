"""Image dataset + transforms (L5).

TPU-native re-design of reference lvae/datasets/image.py: no torch
dependency — PIL + numpy, producing NHWC float32 batches. The transform
config string ('crop=256,hflip=True') is parsed with a small safe parser
instead of eval() (reference used eval at image.py:39).
"""
from pathlib import Path

import numpy as np
from PIL import Image

from lvae_tpu.paths import known_datasets

__all__ = ['ImageDataset', 'get_image_dateset', 'get_image_dataset',
           'parse_transform_cfg']


def parse_transform_cfg(cfg_str):
    """Parse 'crop=256,hflip=True' into a dict (safe, no eval)."""
    out = {}
    if not cfg_str:
        return out
    for item in cfg_str.split(','):
        item = item.strip()
        if not item:
            continue
        k, _, v = item.partition('=')
        v = v.strip()
        if v.lower() in ('true', 'false'):
            out[k.strip()] = v.lower() == 'true'
        else:
            try:
                out[k.strip()] = int(v)
            except ValueError:
                out[k.strip()] = float(v)
    return out


class RandomCropFlip:
    """Random crop (reflect-pad if needed) + optional horizontal flip,
    matching the reference's torchvision transform semantics
    (reference: image.py:42-47)."""

    def __init__(self, crop=None, hflip=False):
        self.crop = crop
        self.hflip = hflip

    def __call__(self, arr: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if self.crop is not None:
            c = self.crop
            h, w = arr.shape[:2]
            if h < c or w < c:
                pad_h, pad_w = max(0, c - h), max(0, c - w)
                arr = np.pad(arr, ((pad_h // 2, pad_h - pad_h // 2),
                                   (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
                             mode='reflect')
                h, w = arr.shape[:2]
            top = int(rng.integers(0, h - c + 1))
            left = int(rng.integers(0, w - c + 1))
            arr = arr[top:top + c, left:left + c]
        if self.hflip and rng.random() < 0.5:
            arr = arr[:, ::-1]
        return np.ascontiguousarray(arr)

    def __repr__(self):
        return f'RandomCropFlip(crop={self.crop}, hflip={self.hflip})'


class ImageDataset:
    """Recursive-glob folder dataset (reference: image.py:11-33).

    out_dtype=np.uint8 returns raw 0-255 crops — the trainer uses this to
    push 4x fewer bytes to the accelerator and normalizes on device
    (uint8/255 in f32 matches the host normalization)."""

    def __init__(self, root, transform: RandomCropFlip = None,
                 out_dtype=np.float32):
        self.root = root
        self.transform = transform or RandomCropFlip()
        self.out_dtype = np.dtype(out_dtype)
        self.image_paths = sorted(Path(root).rglob('*.*'))
        assert len(self.image_paths) > 0, \
            f'Found {len(self.image_paths)} images in {root}.'

    def __len__(self):
        return len(self.image_paths)

    def get(self, index, rng: np.random.Generator) -> np.ndarray:
        impath = self.image_paths[index]
        img = Image.open(impath).convert('RGB')
        arr = self.transform(np.asarray(img), rng)
        if self.out_dtype == np.uint8:
            return arr
        return arr.astype(np.float32) / 255.0

    def __getitem__(self, index):
        return self.get(index, np.random.default_rng())


def get_image_dateset(name: str, transform_cfg: str = None) -> ImageDataset:
    """Build a dataset from a known name or a path
    (reference: image.py:36-52). The misspelled name is kept for
    API compatibility; prefer get_image_dataset."""
    cfg = parse_transform_cfg(transform_cfg)
    transform = RandomCropFlip(crop=cfg.get('crop'),
                               hflip=cfg.get('hflip', False))
    return ImageDataset(root=known_datasets.get(name, name), transform=transform)


get_image_dataset = get_image_dateset

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


def reflect_pad_to(arr: np.ndarray, c: int) -> np.ndarray:
    """Reflect-pad an HWC image up to at least c x c (no-op when large
    enough). Shared by RandomCropFlip and the device-resident cache so the
    crop-coordinate rng draws see identical (h, w) ranges on both paths."""
    h, w = arr.shape[:2]
    if h >= c and w >= c:
        return arr
    pad_h, pad_w = max(0, c - h), max(0, c - w)
    return np.pad(arr, ((pad_h // 2, pad_h - pad_h // 2),
                        (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
                  mode='reflect')


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
            arr = reflect_pad_to(arr, c)
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
    (uint8/255 in f32 matches the host normalization).

    decode_cache=True pre-decodes every image ONCE into a raw uint8 blob
    (<root>/.lvae_u8cache/) that epochs after the first read back via
    np.memmap — on a 1-core host, per-epoch PNG decode is the training
    loop's largest CPU cost. Disk cost is the raw size (H*W*3 per image),
    so it is opt-in (--data_cache in the train CLIs)."""

    def __init__(self, root, transform: RandomCropFlip = None,
                 out_dtype=np.float32, decode_cache=False):
        self.root = root
        self.transform = transform or RandomCropFlip()
        self.out_dtype = np.dtype(out_dtype)
        from lvae_tpu.utils.coding import IMAGE_SUFFIXES
        self.image_paths = sorted(
            p for p in Path(root).rglob('*.*')
            if p.suffix.lower() in IMAGE_SUFFIXES
            and '.lvae_u8cache' not in p.parts)
        assert len(self.image_paths) > 0, \
            f'Found {len(self.image_paths)} images in {root}.'
        self._blob = None
        if decode_cache:
            self._build_decode_cache()

    def _build_decode_cache(self):
        """Decode all images to <root>/.lvae_u8cache/{blob.bin,index.npz};
        reuse the cache when the sorted file list is unchanged."""
        import hashlib
        cache_dir = Path(self.root) / '.lvae_u8cache'
        cache_dir.mkdir(exist_ok=True)
        # key on names + sizes + mtimes so edits invalidate
        sig = hashlib.sha256()
        for p in self.image_paths:
            st = p.stat()
            sig.update(f'{p.name}:{st.st_size}:{int(st.st_mtime)}'.encode())
        sig = sig.hexdigest()[:16]
        blob_path = cache_dir / 'blob.bin'
        idx_path = cache_dir / 'index.npz'
        if idx_path.is_file():
            idx = np.load(idx_path, allow_pickle=False)
            if str(idx['sig']) == sig and blob_path.is_file():
                self._offsets = idx['offsets']
                self._shapes = idx['shapes']
                self._blob = np.memmap(blob_path, np.uint8, mode='r')
                return
        offsets, shapes = [], []
        off = 0
        with open(blob_path, 'wb') as f:
            for p in self.image_paths:
                arr = np.asarray(Image.open(p).convert('RGB'), np.uint8)
                f.write(arr.tobytes())
                offsets.append(off)
                shapes.append(arr.shape[:2])
                off += arr.nbytes
        self._offsets = np.asarray(offsets, np.int64)
        self._shapes = np.asarray(shapes, np.int32)
        np.savez(idx_path, sig=sig, offsets=self._offsets,
                 shapes=self._shapes)
        self._blob = np.memmap(blob_path, np.uint8, mode='r')

    def __len__(self):
        return len(self.image_paths)

    def _load_u8(self, index) -> np.ndarray:
        if self._blob is not None:
            off = int(self._offsets[index])
            h, w = (int(v) for v in self._shapes[index])
            return np.asarray(self._blob[off:off + h * w * 3]
                              ).reshape(h, w, 3)
        return np.asarray(Image.open(self.image_paths[index]).convert('RGB'))

    def get(self, index, rng: np.random.Generator) -> np.ndarray:
        arr = self.transform(self._load_u8(index), rng)
        if self.out_dtype == np.uint8:
            return arr
        return arr.astype(np.float32) / 255.0

    def __getitem__(self, index):
        return self.get(index, np.random.default_rng())


def get_image_dateset(name: str, transform_cfg: str = None,
                      decode_cache=False) -> ImageDataset:
    """Build a dataset from a known name or a path
    (reference: image.py:36-52). The misspelled name is kept for
    API compatibility; prefer get_image_dataset."""
    cfg = parse_transform_cfg(transform_cfg)
    transform = RandomCropFlip(crop=cfg.get('crop'),
                               hflip=cfg.get('hflip', False))
    return ImageDataset(root=known_datasets.get(name, name),
                        transform=transform, decode_cache=decode_cache)


get_image_dataset = get_image_dateset

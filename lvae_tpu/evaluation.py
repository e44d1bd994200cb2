"""Evaluation harness (L7): true-bitstream and forward-only evaluation.

Mirrors reference lvae/evaluation.py:15-150. Metric conventions match the
reference exactly: bpp = compressed-file bits / pixel count, PSNR in RGB,
per-image metrics averaged over the dataset.
"""
import math
from collections import defaultdict
from pathlib import Path
from tempfile import gettempdir

import numpy as np
from PIL import Image

from lvae_tpu.paths import known_datasets
from lvae_tpu.utils.coding import crop_divisible_by
from lvae_tpu.models.base import image_to_batch

__all__ = ['imcoding_evaluate', 'image_self_evaluate', 'video_fast_evaluate']


class _AverageMeter:
    def __init__(self):
        self.sum, self.count = 0.0, 0

    def update(self, v):
        self.sum += v
        self.count += 1

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def _find_images(dataset):
    from lvae_tpu.utils import coding
    root = known_datasets.get(dataset, Path(dataset))
    img_paths = sorted(p for p in Path(root).rglob('*.*')
                       if p.suffix.lower() in coding.IMAGE_SUFFIXES)
    assert len(img_paths) > 0, f'no images found under {root}'
    return img_paths


def imcoding_evaluate(model, dataset: str, progress=True, shape_buckets=None):
    """True file round-trip: compress_file -> real file bits ->
    decompress_file -> PSNR (reference: evaluation.py:15-67).

    shape_buckets: None = exact /stride padding (reference behavior; one
    XLA compile per distinct shape). An int N pads every image up to one of
    <= N bucket shapes so a mixed-shape dataset (CLIC) compiles O(N)
    programs — bpp still counts real file bits over ORIGINAL pixels, so
    bucketing trades a little rate for bounded compile time."""
    assert hasattr(model, 'compress_file') and hasattr(model, 'decompress_file')
    img_paths = _find_images(dataset)
    buckets = None
    if shape_buckets is not None:
        from lvae_tpu.utils import coding
        div = getattr(getattr(model, 'net', model), 'max_stride', 64)
        sizes = []
        for p in img_paths:
            with Image.open(p) as img:
                sizes.append((img.height, img.width))
        buckets = coding.choose_shape_buckets(sizes, div=div,
                                              max_buckets=int(shape_buckets))
    tmp_bits_dir = Path(gettempdir())
    stats_meters = defaultdict(_AverageMeter)
    compile_shapes = set()
    iterator = img_paths
    if progress:
        try:
            from tqdm import tqdm
            iterator = tqdm(img_paths, ascii=True)
        except ImportError:
            pass
    for impath in iterator:
        tmp_bits_path = tmp_bits_dir / f'{impath.stem}.bits'
        if buckets is not None:
            from lvae_tpu.utils import coding
            with Image.open(impath) as img:
                pad_hw = coding.bucket_for(img.height, img.width, buckets)
            compile_shapes.add(pad_hw)
            model.compress_file(impath, tmp_bits_path, pad_hw=pad_hw)
        else:
            model.compress_file(impath, tmp_bits_path)
        num_bits = tmp_bits_path.stat().st_size * 8
        fake = np.asarray(model.decompress_file(tmp_bits_path))[0]
        tmp_bits_path.unlink()

        real = np.asarray(image_to_batch(Image.open(impath)))[0]
        mse = float(np.mean(np.square(real - fake)))
        psnr = -10 * math.log10(max(mse, 1e-12))
        bpp = num_bits / float(real.shape[0] * real.shape[1])
        stats = {'bpp': float(bpp), 'mse': mse, 'psnr': float(psnr)}
        for k, v in stats.items():
            stats_meters[k].update(v)
        if progress and hasattr(iterator, 'set_description'):
            msg = ', '.join(f'{k}={v:.3f}' for k, v in stats.items())
            iterator.set_description(f'image {impath.stem}: {msg}')
    if buckets is not None:
        import logging
        logging.info(f'imcoding_evaluate shape buckets: {sorted(buckets)}; '
                     f'{len(compile_shapes)} compile shapes used')
    return {k: m.avg for k, m in stats_meters.items()}


def image_self_evaluate(model, dataset: str, progress=True):
    """Forward-only evaluation with crop-to-stride
    (reference: evaluation.py:70-107)."""
    img_paths = _find_images(dataset)
    stats_meters = defaultdict(_AverageMeter)
    iterator = img_paths
    if progress:
        try:
            from tqdm import tqdm
            iterator = tqdm(img_paths, ascii=True)
        except ImportError:
            pass
    for impath in iterator:
        img = Image.open(impath).convert('RGB')
        if hasattr(model, 'max_stride'):
            img = crop_divisible_by(img, div=model.max_stride)
        im = image_to_batch(img)
        stats = model.forward(im)
        assert isinstance(stats, dict)
        for k, v in stats.items():
            if isinstance(v, (int, float)):
                stats_meters[k].update(v)
    return {k: m.avg for k, m in stats_meters.items()}


def video_fast_evaluate(model, dataset='uvg-1080p', max_frames=None):
    """Estimated (no entropy coding) video evaluation
    (reference: evaluation.py:110-150)."""
    root = known_datasets.get(dataset, Path(dataset))
    root = Path(root)
    assert root.is_dir(), f'cannot find {root} as a directory'
    sequence_paths = sorted(p for p in root.iterdir() if p.is_dir())
    accumulated = defaultdict(float)
    count = 0
    from lvae_tpu.utils import coding
    for seq_path in sequence_paths:
        frame_paths = sorted(p for p in seq_path.rglob('*.*')
                             if p.suffix.lower() in coding.IMAGE_SUFFIXES)
        if max_frames is not None:
            frame_paths = frame_paths[:max_frames]
        frames = [np.asarray(image_to_batch(
            crop_divisible_by(Image.open(fp), div=64)))
            for fp in frame_paths]
        stats = model.forward_eval(frames)
        count += 1
        for k, v in stats.items():
            if isinstance(v, (int, float)):
                accumulated[k] += v
    return {k: v / count for k, v in accumulated.items()}

"""Lossless round-trip evaluation: bit-exactness assert + average bpp
(reference: scripts/qresvae/evaluate-lossless.py:13-59; Kodak = 10.369 bpp
with the reference pretrained weights).
"""
import argparse
from pathlib import Path
from tempfile import gettempdir

import numpy as np
from PIL import Image

from lvae_tpu.registry import get_model
from lvae_tpu.paths import known_datasets
from lvae_tpu.training.trainer import parse_model_args


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--model', type=str, default='qres34m_lossless')
    parser.add_argument('-a', '--model_args', type=str, default='')
    parser.add_argument('-n', '--dataset', type=str, default='kodak')
    parser.add_argument('-c', '--coder', type=str, default='fused',
                        choices=['host', 'fused'],
                        help='fused = single-program on-device rANS incl. '
                             'the pixel head; host = per-block C++ rANS')
    args = parser.parse_args()

    model = get_model(args.model, **parse_model_args(args.model_args))
    model.compress_mode(coder=args.coder)

    from lvae_tpu.utils import coding
    root = known_datasets.get(args.dataset, Path(args.dataset))
    img_paths = sorted(p for p in Path(root).rglob('*.*')
                       if p.suffix.lower() in coding.IMAGE_SUFFIXES)
    tmp = Path(gettempdir()) / 'lossless.bits'

    bpps = []
    for p in img_paths:
        model.compress_file(p, tmp)
        num_bits = tmp.stat().st_size * 8
        fake = np.asarray(model.decompress_file(tmp))[0]
        real = np.asarray(Image.open(p).convert('RGB'))
        fake_u8 = np.round(fake * 255).astype(np.uint8)
        assert np.array_equal(real, fake_u8), f'NOT lossless on {p}'
        bpp = num_bits / (real.shape[0] * real.shape[1])
        bpps.append(bpp)
        print(f'{p.name}: bpp = {bpp:.4f} (bit-exact)')
    print(f'\naverage bpp = {np.mean(bpps):.4f} over {len(bpps)} images')


if __name__ == '__main__':
    main()

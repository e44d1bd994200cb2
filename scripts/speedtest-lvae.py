"""Codec speed test: per-image encode/decode wall time on a dataset
(reference: scripts/speedtest-lvae.py:13-92).

Times include the host rANS stage; device work is synchronized by the
host pull inside compress/decompress, so wall time is end-to-end.
"""
import argparse
import json
import time
from pathlib import Path
from tempfile import gettempdir

import numpy as np

from lvae_tpu.registry import get_model
from lvae_tpu.paths import known_datasets
from lvae_tpu.training.trainer import parse_model_args


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--models', type=str, nargs='+',
                        default=['qres34m', 'qarv_base'])
    parser.add_argument('-a', '--model_args', type=str, default='')
    parser.add_argument('-n', '--dataset', type=str, default='kodak')
    parser.add_argument('-w', '--warmup', type=int, default=2)
    args = parser.parse_args()

    root = known_datasets.get(args.dataset, Path(args.dataset))
    img_paths = sorted(Path(root).rglob('*.*'))
    assert img_paths, f'no images under {root}'
    tmp = Path(gettempdir()) / 'speedtest.bits'

    for name in args.models:
        model = get_model(name, **parse_model_args(args.model_args))
        model.compress_mode()
        # warmup (compile)
        for p in img_paths[:args.warmup]:
            model.compress_file(p, tmp)
            model.decompress_file(tmp)
        enc_times, dec_times = [], []
        for p in img_paths:
            t0 = time.perf_counter()
            model.compress_file(p, tmp)
            t1 = time.perf_counter()
            model.decompress_file(tmp)
            t2 = time.perf_counter()
            enc_times.append(t1 - t0)
            dec_times.append(t2 - t1)
        print(json.dumps({
            'model': name,
            'dataset': args.dataset,
            'encode_s': round(float(np.mean(enc_times)), 4),
            'decode_s': round(float(np.mean(dec_times)), 4),
            'images': len(img_paths),
        }))


if __name__ == '__main__':
    main()

"""VTM encode/decode latency on Kodak-sized images.

Counterpart of reference scripts/codecs/speedtest-vtm.py: times EncoderApp
and DecoderApp wall-clock per image at a fixed QP, averaged over the
dataset. Requires VTM binaries (VTM_BIN_DIR).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('-n', '--dataset', type=str, default='kodak')
    ap.add_argument('-q', '--qp', type=int, default=30)
    ap.add_argument('--max_images', type=int, default=24)
    args = ap.parse_args()

    from lvae_tpu.paths import known_datasets
    from vvc import vtm_encode_decode
    root = Path(known_datasets.get(args.dataset, args.dataset))
    img_paths = sorted(root.rglob('*.*'))[:args.max_images]

    times = []
    for p in img_paths:
        t0 = time.perf_counter()
        bpp, psnr = vtm_encode_decode(p, args.qp, intra=True)
        times.append(time.perf_counter() - t0)
        print(f'{p.name}: {times[-1]:.2f}s (bpp {bpp:.4f}, psnr {psnr:.2f})')
    print(f'avg enc+dec wall time @ QP{args.qp}: {np.mean(times):.2f}s '
          f'over {len(times)} images')


if __name__ == '__main__':
    main()

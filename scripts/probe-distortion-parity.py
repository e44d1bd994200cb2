"""Distortion-parity probe: forward-eval recon vs true-coded recon.

The r3 eval-var-rate run showed real-coded PSNR ~25 dB while the forward
lambda-sweep at the same trained weights reported up to ~38 dB. Rate parity
is proven (runs/rate-proof-r3.json) — this probe pinpoints where the
DISTORTION of the coded path diverges from the forward pass, per lambda:

  A. model.forward(im, lmb)            -> stats['psnr']   (eval KL path)
  B. model.reconstruct(im, lmb)        -> PSNR vs original (same z rule)
  C. fused compress -> decompress      -> PSNR vs original
  D. host  compress -> decompress      -> PSNR vs original
  and max|B - C| pixel delta.

Usage: python scripts/probe-distortion-parity.py [--image PATH] [--lmb ...]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def psnr(a, b):
    mse = float(np.mean(np.square(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64))))
    import math
    return -10 * math.log10(max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--image', default='runs/synth-val/syn00000.png')
    ap.add_argument('--weights', default='runs/qarv_base_synth6k_ema.msgpack')
    ap.add_argument('--lmb', type=float, nargs='+', default=[16.0, 2048.0])
    args = ap.parse_args()

    import os
    import jax
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    from lvae_tpu.models.base import image_to_batch
    from PIL import Image

    model = lvae_tpu.get_model('qarv_base')
    model.load_weights(args.weights)
    im = np.asarray(image_to_batch(Image.open(args.image).convert('RGB')))

    for lmb in args.lmb:
        stats = model.forward(im, lmb=lmb)
        rec_fwd = np.asarray(model.reconstruct(
            im, model._expand_lmb(lmb, 1)))

        model.compress_mode(coder='fused')
        bits_f = model.compress(im, lmb=lmb)
        rec_fused = np.asarray(model.decompress(bits_f))

        model.compress_mode(coder='host')
        bits_h = model.compress(im, lmb=lmb)
        rec_host = np.asarray(model.decompress(bits_h))

        print(f'lmb={lmb:g}: forward-eval psnr={stats["psnr"]:.2f} '
              f'(kl bppix={stats.get("bppix", float("nan")):.4f}) | '
              f'reconstruct psnr={psnr(rec_fwd, im):.2f} | '
              f'fused-coded psnr={psnr(rec_fused, im):.2f} '
              f'({len(bits_f) * 8 / im[0].shape[0] / im[0].shape[1]:.4f} '
              f'bpp) | host-coded psnr={psnr(rec_host, im):.2f}',
              flush=True)
        print(f'  max|reconstruct - fused| = '
              f'{float(np.max(np.abs(rec_fwd - rec_fused))):.6f}; '
              f'max|host - fused| = '
              f'{float(np.max(np.abs(rec_host - rec_fused))):.6f}',
              flush=True)


if __name__ == '__main__':
    main()

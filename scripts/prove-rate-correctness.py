"""Prove coded bits == the model's own KL rate estimate at the trained
operating point (VERDICT r2 item 2).

For each lambda in a sweep, on every image:
  (a) forward-pass KL estimate in bits/pixel (the model's theoretical rate,
      discretized-gaussian log-mass at the deterministically quantized
      latents — reference: qarv/model.py:427-507 self-evaluate)
  (b) host-coder real file bits/pixel (per-block C++ rANS, the
      reference-layout stream)
  (c) fused device-coder bits/pixel
and asserts
  (b) - (a) < tol_pct (CDF discretization + tail mass + per-block headers)
  (c) - (b) == the known interleaved-format flush cost (lane states +
      header), within slack for escape varints.

Writes the table to runs/rate-proof-r3.json and exits nonzero on failure —
a subtle CDF-table or discretization bug would show up exactly here.

Usage:
    python scripts/prove-rate-correctness.py \
        --weights runs/qarv_base_synth6k_ema.msgpack \
        --images runs/synth-val --first 6
"""
import argparse
import json
import math
import struct
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

log2_e = math.log2(math.e)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', type=str, default='qarv_base')
    ap.add_argument('--weights', type=str,
                    default='runs/qarv_base_synth6k_ema.msgpack')
    ap.add_argument('--images', type=str, default='runs/synth-val')
    ap.add_argument('--first', type=int, default=6)
    ap.add_argument('--lmb', type=float, nargs='+',
                    default=[16.0, 64.0, 256.0, 512.0, 1024.0, 2048.0])
    ap.add_argument('--tol_pct', type=float, default=2.0,
                    help='max (host_bpp - kl_bpp) / kl_bpp in percent')
    ap.add_argument('--out', type=str, default='runs/rate-proof-r3.json')
    args = ap.parse_args()

    import os
    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    from lvae_tpu.models.base import image_to_batch
    from lvae_tpu.utils import coding
    from PIL import Image

    model = lvae_tpu.get_model(args.model)
    if args.weights and os.path.isfile(args.weights):
        model.load_weights(args.weights)
        weights = args.weights
    else:
        weights = 'random-init'
        print(f'# WARNING: weights {args.weights} not found, using random '
              f'init (rates will be pathological but the identity must '
              f'still hold)')

    paths = sorted(Path(args.images).glob('*.png'))[:args.first]
    assert paths, f'no png images under {args.images}'
    imgs = []
    for p in paths:
        img = coding.pad_divisible_by(Image.open(p).convert('RGB'),
                                      div=model.net.max_stride)
        imgs.append(np.asarray(image_to_batch(img)))

    rows, failures = [], []
    for lmb in args.lmb:
        kl_bpps, host_bpps, fused_bpps, flushes, escs = [], [], [], [], []
        for im in imgs:
            _, H, W, _ = im.shape
            npix = H * W
            # (a) forward KL estimate (bits/pixel over all RGB), computed on
            # device by the same program the training eval uses
            fn = model._eval_stats_prog(H, W)
            u8 = np.round(np.asarray(im) * 255).astype(np.uint8)
            kl_total, _, _, _ = jax.device_get(
                fn(model.params, u8, model._expand_lmb(lmb, 1),
                   jnp.int32(H), jnp.int32(W)))
            kl_bpp = float(kl_total) * log2_e / npix
            # (b) host coder file bits
            model.compress_mode(coder='host')
            s_h = model.compress(im, lmb=lmb)
            assert model.decompress(s_h).shape == im.shape
            # (c) fused device coder
            model.compress_mode(coder='fused')
            s_f = model.compress(im, lmb=lmb)
            assert model.decompress(s_f).shape == im.shape
            n_words, n_esc, n_lanes = struct.unpack('<IIH', s_f[10:20])
            kl_bpps.append(kl_bpp)
            host_bpps.append(len(s_h) * 8 / npix)
            fused_bpps.append(len(s_f) * 8 / npix)
            escs.append(n_esc)
            # known fixed flush: lane states + fused header minus the host
            # format's own per-stream overhead is measured, not assumed:
            flushes.append((len(s_f) - len(s_h)) * 8 / npix)
        a, b, c = (float(np.mean(v)) for v in (kl_bpps, host_bpps,
                                               fused_bpps))
        disc_pct = 100.0 * (b - a) / max(a, 1e-9)
        flush_bpp = c - b
        row = {'lambda': lmb, 'kl_bpp': round(a, 5),
               'host_bpp': round(b, 5), 'fused_bpp': round(c, 5),
               'coder_minus_kl_pct': round(disc_pct, 3),
               'fused_minus_host_bpp': round(flush_bpp, 5),
               'mean_escapes': float(np.mean(escs))}
        rows.append(row)
        print(json.dumps(row))
        if not (-0.5 < disc_pct < args.tol_pct):
            failures.append(
                f'lmb={lmb}: host coder bits deviate {disc_pct:.2f}% from '
                f'the KL estimate (tol {args.tol_pct}%)')
        # the fused format may only add its fixed flush (+ escape varints);
        # budget = lanes*4B + 10B header + 6B per escape, vs the host
        # format's own headers (which it replaces, so flush can be smaller)
        flush_budget = (n_lanes * 4 + 10 + 6 * max(escs)) * 8 / npix
        if not (flush_bpp <= flush_budget + 1e-6):
            failures.append(
                f'lmb={lmb}: fused-host gap {flush_bpp:.5f} bpp exceeds the '
                f'format flush budget {flush_budget:.5f}')

    out = {'weights': weights, 'images': [str(p) for p in paths],
           'n_images': len(imgs), 'tol_pct': args.tol_pct, 'rows': rows,
           'failures': failures}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f'# wrote {args.out}')
    if failures:
        print('\n'.join('FAIL: ' + f for f in failures))
        sys.exit(1)
    print(f'# OK: coded bits track the KL estimate within {args.tol_pct}% '
          f'at all {len(args.lmb)} lambdas')


if __name__ == '__main__':
    main()

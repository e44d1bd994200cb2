"""Measure the device-coder (fused) rate overhead vs the host coder at a
realistic operating point (trained weights), per VERDICT round-1 item 4.

Both coders see the same prior/posterior floats (same compiled stage
interfaces), so the bpp difference is exactly the interleaved-format cost:
N lane states (4B each) + varint escape records + in-band escape-bin mass.

Usage:
    python scripts/measure-rate-overhead.py --ckpt runs/<run>/last \
        --images runs/synth-val --lmb 256 1024 --first 8
"""
import argparse
import json
from pathlib import Path

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', type=str, default='qarv_base')
    ap.add_argument('--ckpt', type=str, default=None,
                    help='orbax run checkpoint (runs/<run>/last); '
                         'omit for random init')
    ap.add_argument('--ema', action='store_true', help='use EMA params')
    ap.add_argument('--weights', type=str, default=None,
                    help='flat msgpack weights (e.g. the exported EMA '
                         'runs/qarv_base_synth6k_ema.msgpack)')
    ap.add_argument('--images', type=str, required=True)
    ap.add_argument('--lmb', type=float, nargs='+',
                    default=[16.0, 64.0, 256.0, 1024.0])
    ap.add_argument('--first', type=int, default=8)
    args = ap.parse_args()

    import os
    import jax
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    from lvae_tpu.models.base import image_to_batch
    from lvae_tpu.utils import coding
    from PIL import Image

    model = lvae_tpu.get_model(args.model)
    if args.weights:
        model.load_weights(args.weights)
        print(f'# loaded weights {args.weights}')
    elif args.ckpt:
        from lvae_tpu.training import checkpoint as ckpt
        from lvae_tpu.training.optim import create_train_state
        state, _ = create_train_state(model.params, optimizer='adam',
                                      ema=True)
        template = {'state': state, 'iter': 0, 'epoch': 0.0,
                    'best_loss': float('inf')}
        restored = ckpt.load_checkpoint(args.ckpt, template)
        st = restored['state']
        model.params = st.ema_params if (args.ema and
                                         st.ema_params is not None) \
            else st.params
        print(f'# loaded {args.ckpt} at iter {restored["iter"]} '
              f'(ema={args.ema})')

    paths = sorted(Path(args.images).glob('*.png'))[:args.first]
    assert paths, f'no png images under {args.images}'

    out = {}
    for lmb in args.lmb:
        bpp_h, bpp_f, n_escs = [], [], []
        for p in paths:
            img = coding.pad_divisible_by(Image.open(p).convert('RGB'),
                                          div=model.net.max_stride)
            im = np.asarray(image_to_batch(img))
            npix = im.shape[1] * im.shape[2]
            model.compress_mode(coder='host')
            s_h = model.compress(im, lmb=lmb)
            model.compress_mode(coder='fused', num_lanes='auto')
            s_f = model.compress(im, lmb=lmb)
            assert (model.decompress(s_f)).shape == im.shape
            import struct
            n_esc = struct.unpack('<IIH', s_f[10:20])[1]
            bpp_h.append(len(s_h) * 8 / npix)
            bpp_f.append(len(s_f) * 8 / npix)
            n_escs.append(n_esc)
        h, f = float(np.mean(bpp_h)), float(np.mean(bpp_f))
        out[f'lmb{lmb:g}'] = {
            'host_bpp': round(h, 5), 'fused_bpp': round(f, 5),
            'overhead_bpp': round(f - h, 5),
            'overhead_pct': round(100 * (f - h) / h, 3),
            'mean_escapes': float(np.mean(n_escs)),
        }
        print(json.dumps({f'lmb{lmb:g}': out[f'lmb{lmb:g}']}))
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

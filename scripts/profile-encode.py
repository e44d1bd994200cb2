"""Break down fused-encode latency on real TPU: program execution vs
payload pull vs python/dispatch, in f32 and bf16.

Usage: python scripts/profile-encode.py
"""
import struct
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def med(v):
    return float(sorted(v)[len(v) // 2] * 1e3)


def main():
    import jax
    import jax.numpy as jnp
    import os
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    from scipy.ndimage import gaussian_filter

    model = lvae_tpu.get_model('qarv_base')
    rng = np.random.default_rng(0)
    H, W = 512, 768
    im = gaussian_filter(rng.uniform(0, 1, (H, W, 3)), sigma=(4, 4, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = (np.round(im * 255) / 255).astype(np.float32)[None]
    lmb = 512.0

    for cd in [None, 'bfloat16']:
        model.compress_mode(coder='fused', esc_cap=1 << 18, compute_dtype=cd)
        imj = jnp.asarray(im)
        lmb_arr = jnp.full((1,), lmb, jnp.float32)
        fused = model._fused
        codec_fn = fused._codec(H, W)
        dm = fused._dummies(H, W)

        def enc_fn(params, im, lmb):
            p, _ = codec_fn(params, im, dm['enc'], dm['off'], dm['states'],
                            dm['packed'], dm['esc_pos'], dm['esc_val'], lmb)
            return p
        payload = enc_fn(model.params, imj, lmb_arr)
        np.asarray(payload[:4])  # warm + prepay first fetch
        bits = model.compress(im, lmb=lmb)
        _ = model.decompress(bits)

        prog_t, head_t, full_t, comp_t = [], [], [], []
        for _ in range(7):
            # (a) program execution only: dispatch + tiny sync
            t0 = time.perf_counter()
            payload = enc_fn(model.params, imj, lmb_arr)
            np.asarray(payload[:4])
            t1 = time.perf_counter()
            prog_t.append(t1 - t0)
            # (b) header+words pull given result already materialized
            n_words = int(np.asarray(payload[0]))
            n_esc = int(np.asarray(payload[1]))
            t2 = time.perf_counter()
            _ = np.asarray(payload[:3 + fused.N + (n_words + 1) // 2])
            t3 = time.perf_counter()
            head_t.append(t3 - t2)
            # (c) end-to-end compress (the bench's encode)
            t4 = time.perf_counter()
            bits = model.compress(im, lmb=lmb)
            t5 = time.perf_counter()
            comp_t.append(t5 - t4)
        dec_t = []
        for _ in range(7):
            lmb_v, = struct.unpack('f', bits[:4])
            nB, nH, nW = struct.unpack('3H', bits[4:10])
            t0 = time.perf_counter()
            img_dev = model.decompress_to_device(lmb_v, nB, nH, nW, bits[10:])
            np.asarray(img_dev[0, :1, :1, 0])
            dec_t.append(time.perf_counter() - t0)
        print(f'--- compute_dtype={cd} ---')
        print(f'  enc program+sync : {med(prog_t):8.1f} ms')
        print(f'  words pull       : {med(head_t):8.1f} ms '
              f'(n_words={n_words}, n_esc={n_esc})')
        print(f'  compress() total : {med(comp_t):8.1f} ms '
              f'({len(bits)} bytes, {len(bits) * 8 / H / W:.3f} bpp)')
        print(f'  decode+sync      : {med(dec_t):8.1f} ms')


if __name__ == '__main__':
    main()

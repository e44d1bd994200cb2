"""Measure the optimization_barrier cost in the FULL fused programs:
monolithic encode and decode with barriers vs with ob=identity.
(Barriers measured harmless in the isolated latent loop; this checks the
composed programs, where ~35 ms is unattributed.)

Usage: python scripts/profile-barrier-cost.py [--dtype bf16|f32]
"""
import argparse
import struct
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    args = ap.parse_args()
    cd = 'bfloat16' if args.dtype == 'bf16' else None

    import os
    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    from lvae_tpu.models import fused_base
    from lvae_tpu.models.qarv import fused as qf
    from scipy.ndimage import gaussian_filter

    model = lvae_tpu.get_model('qarv_base')
    w = 'runs/qarv_base_synth6k_ema.msgpack'
    if os.path.isfile(w):
        model.load_weights(w)
    model.params = jax.device_put(model.params)
    jax.block_until_ready(jax.tree.leaves(model.params)[0])

    H, W = 512, 768
    rng = np.random.default_rng(0)
    im = gaussian_filter(rng.uniform(0, 1, (H, W, 3)), sigma=(4, 4, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = (np.round(im * 255) / 255).astype(np.float32)[None]
    imj = jnp.asarray(im)
    lmb_arr = jnp.full((1,), 512.0, jnp.float32)
    np.asarray(imj[0, :1, :1, 0])

    def bench(fn, *a, k=6):
        r = fn(*a)
        np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])

        def run(kk):
            t0 = time.perf_counter()
            out = None
            for _ in range(kk):
                out = fn(*a)
            np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
            return time.perf_counter() - t0
        run(1)
        return min((run(k) - run(1)) / (k - 1) for _ in range(3)) * 1e3

    # HISTORICAL (r3): this probe compared the pre-unified-codec encode and
    # decode programs with/without barriers; the codec is now ONE program
    # (qarv/fused.py) and the old builders are gone.
    raise SystemExit('obsolete: predates the unified codec (see qarv/fused.py)')
    model.compress_mode(coder='fused', esc_cap=8192, compute_dtype=cd)
    fused = model._fused
    enc = fused._build_encode(H, W)
    print(f'ENC with barriers    : '
          f'{bench(enc, model.params, imj, lmb_arr):7.1f} ms', flush=True)
    bits = model.compress(imj, lmb=512.0)
    nB, nH, nW = struct.unpack('3H', bits[4:10])
    states, packed, esc_pos, esc_val = fused.parse_payload(bits[10:])
    dev = (jnp.asarray(states), jnp.asarray(packed), jnp.asarray(esc_pos),
           jnp.asarray(esc_val))
    dec = fused._build_decode(nH, nW)
    print(f'DEC with barriers    : '
          f'{bench(dec, model.params, *dev, lmb_arr):7.1f} ms', flush=True)

    # disable barriers globally in the fused modules and rebuild
    ident = lambda x: x
    fused_base._ob = ident
    qf._ob = ident
    model.compress_mode(coder='fused', esc_cap=8192, compute_dtype=cd)
    fused2 = model._fused
    enc2 = fused2._build_encode(H, W)
    print(f'ENC NO barriers      : '
          f'{bench(enc2, model.params, imj, lmb_arr):7.1f} ms', flush=True)
    dec2 = fused2._build_decode(nH, nW)
    print(f'DEC NO barriers      : '
          f'{bench(dec2, model.params, *dev, lmb_arr):7.1f} ms', flush=True)


if __name__ == '__main__':
    main()

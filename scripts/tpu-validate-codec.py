"""Validate the fused single-program codec ON REAL TPU HARDWARE.

The fused encode and decode are two different XLA programs; bit-exactness of
their shared stages is enforced with optimization_barriers but must be
validated empirically per compiler version (CLAUDE.md invariant). This
script round-trips qarv_base at 512x768 on the real chip and checks:
  1. fused stream decodes to EXACTLY the host-coder reconstruction
  2. fused encode is deterministic
  3. timing decomposition (encode wall, decode wall, transfers)

Run: python scripts/tpu-validate-codec.py [--bf16] [--lanes N]
"""
import argparse
import struct
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='qarv_base')
    ap.add_argument('--hw', type=int, nargs=2, default=(512, 768))
    ap.add_argument('--lanes', type=int, default=128)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--lmb', type=float, default=1024.0)
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--weights', type=str, default=None,
                    help='flat msgpack weights: validates the PRODUCTION '
                         'config (trained stats, esc_cap 8192) instead of '
                         'the random-init escape stress case')
    ap.add_argument('--esc_cap', type=int, default=1 << 18,
                    help='fused escape capacity; use 8192 with --weights '
                         'to validate the production decode binary '
                         '(esc_cap shapes the canonical escape buffer)')
    args = ap.parse_args()

    import os
    import jax
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    print('backend:', jax.default_backend())
    H, W = args.hw
    rng = np.random.default_rng(0)
    im = (rng.integers(0, 256, (1, H, W, 3)) / 255.0).astype(np.float32)

    model = lvae_tpu.get_model(args.model)
    if args.weights:
        model.load_weights(args.weights)
        print(f'loaded {args.weights}')
    cd = 'bfloat16' if args.bf16 else None

    # --- reference recon via the staged device coder (round-1 oracle) ----
    model.compress_mode(coder='device')
    t0 = time.perf_counter()
    obj_dev = model.compress(im, lmb=args.lmb)
    rec_dev = model.decompress(obj_dev)
    print(f'staged device coder roundtrip: {time.perf_counter()-t0:.1f}s '
          f'({len(obj_dev)} bytes)')

    # --- fused codec ------------------------------------------------------
    import jax.numpy as jnp
    model.compress_mode(coder='fused', num_lanes=args.lanes,
                        esc_cap=args.esc_cap, compute_dtype=cd)
    lmb_f32 = struct.unpack('f', struct.pack('f', args.lmb))[0]
    lmb_arr = jnp.full((1,), lmb_f32, jnp.float32)
    t0 = time.perf_counter()
    obj = model.compress(im, lmb=args.lmb)
    print(f'fused encode compile+run: {time.perf_counter()-t0:.1f}s, '
          f'{len(obj)} bytes')
    body = obj[10:]
    nw, ne, lanes = struct.unpack('<IIH', body[:10])
    print(f'fused stream: {nw} words, {ne} escapes, {lanes} lanes')
    t0 = time.perf_counter()
    rec = model.decompress(obj)
    print(f'fused decode compile+run: {time.perf_counter()-t0:.1f}s')

    obj2 = model.compress(im, lmb=args.lmb)
    print('fused encode deterministic:', obj == obj2)

    # THE invariant: decode must reproduce the encode program's own
    # reconstruction bitwise (encode-side symbols through the same fuse/tail)
    t0 = time.perf_counter()
    body_chk, img_enc = model._fused.encode_check(
        model.params, jnp.asarray(im), lmb_arr)
    print(f'selfcheck encode compile+run: {time.perf_counter()-t0:.1f}s')
    # the selfcheck program is a different XLA program: tie-level stream
    # drift vs the plain encode is possible and fine (both self-consistent)
    print('selfcheck stream identical to plain encode:', body_chk == body)
    nH, nW = im.shape[1] // 64, im.shape[2] // 64
    img_dec = np.asarray(model._fused.decode_to_device(
        model.params, body_chk, nH, nW, lmb_arr))
    exact = bool((img_dec == img_enc).all())
    print('fused decode BIT-EXACT vs encode-side recon:', exact)
    if not exact:
        diff = np.abs(img_dec.astype(np.float32) - img_enc.astype(np.float32))
        print(f'  max abs diff {diff.max():.3e} at '
              f'{int((diff > 0).sum())} pixels — INVARIANT BROKEN')
        sys.exit(1)

    # informational: vs the staged coder (rounding-tie symbol flips between
    # two valid encoders are expected; both streams are self-consistent)
    diff = np.abs(rec - rec_dev)
    print(f'fused vs staged recon: {int((diff > 0).sum())} differing pixels '
          f'(max {diff.max():.3e}) — tie-flip level is normal')

    # --- timing ----------------------------------------------------------
    encs, decs, dec_syncs = [], [], []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        obj = model.compress(im, lmb=args.lmb)
        encs.append(time.perf_counter() - t0)
        lmb_v, = struct.unpack('f', obj[:4])
        nB, nH, nW = struct.unpack('3H', obj[4:10])
        t0 = time.perf_counter()
        img_dev = model.decompress_to_device(lmb_v, nB, nH, nW, obj[10:])
        np.asarray(img_dev[0, :1, :1, 0])  # tiny sync fetch
        dec_syncs.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(img_dev)
        decs.append(time.perf_counter() - t0)
    med = lambda v: sorted(v)[len(v) // 2] * 1e3
    print(f'encode wall (stream on host):    med {med(encs):.1f} ms')
    print(f'decode wall (image on device):   med {med(dec_syncs):.1f} ms')
    print(f'  + full image pull:             med {med(decs):.1f} ms')
    print(f'enc+dec (device-resident image): {med(encs)+med(dec_syncs):.1f} ms')


if __name__ == '__main__':
    main()

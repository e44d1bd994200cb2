"""Attribute EVERY millisecond of the fused codec's wall time on real TPU.

Separates, per direction:
  - host-side dispatch (argument marshaling; scales with buffer count on
    the tunneled runtime — measured by timing the jit call WITHOUT sync)
  - device execution (chained-run trick: (t(k) - t(1)) / (k-1); on axon
    block_until_ready does not wait, only fetches sync)
  - the payload pull / stream push host traffic
  - host numpy glue (_payload_to_bytes / parse_payload)
and runs a dispatch-cost experiment: trivial program taking the full
907-leaf qarv_base tree vs a single fused buffer.

Usage: python scripts/profile-fused-attrib.py [--dtype bf16|f32]
"""
import argparse
import struct
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def med(v):
    return float(sorted(v)[len(v) // 2] * 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    ap.add_argument('--word_cap', type=int, default=None,
                    help='capped word buffers (compress_mode word_cap)')
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
    from scipy.ndimage import gaussian_filter

    model = lvae_tpu.get_model('qarv_base')
    for w in ('runs/qarv_base_synth6k_ema.msgpack',
              'checkpoints/qarv_base_synth6k_ema_f16.msgpack'):
        if os.path.isfile(w):
            model.load_weights(w)
            print(f'weights: {w}', flush=True)
            break
    model.params = jax.device_put(model.params)
    jax.block_until_ready(jax.tree.leaves(model.params)[0])

    rng = np.random.default_rng(0)
    H, W = 512, 768
    im = gaussian_filter(rng.uniform(0, 1, (H, W, 3)), sigma=(4, 4, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = (np.round(im * 255) / 255).astype(np.float32)[None]
    lmb = 512.0
    lmb_arr = jnp.full((1,), lmb, jnp.float32)
    imj = jnp.asarray(im)
    np.asarray(imj[0, :1, :1, 0])

    # ---------------- dispatch-cost experiment ---------------------------
    leaves = jax.tree.leaves(model.params)
    print(f'param leaves: {len(leaves)}')

    @jax.jit
    def tiny_tree(params, x):
        return x + params['bias'].reshape(-1)[0]

    @jax.jit
    def tiny_one(buf, x):
        return x + buf[0]

    flat = jnp.concatenate([l.reshape(-1).astype(jnp.float32)
                            for l in leaves])
    x0 = jnp.zeros(())
    np.asarray(tiny_tree(model.params, x0))
    np.asarray(tiny_one(flat, x0))

    def time_dispatch(fn, *a, k=20):
        # host-side cost of k dispatches, NO sync: pure marshal + enqueue
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*a)
        t1 = time.perf_counter()
        np.asarray(r)  # drain the queue before the next experiment
        return (t1 - t0) / k * 1e3

    d_tree = min(time_dispatch(tiny_tree, model.params, x0)
                 for _ in range(3))
    d_one = min(time_dispatch(tiny_one, flat, x0) for _ in range(3))
    print(f'dispatch cost, trivial prog: full tree {d_tree:7.2f} ms | '
          f'one buffer {d_one:7.2f} ms')

    # ---------------- fused encode ---------------------------------------
    model.compress_mode(coder='fused', esc_cap=8192, compute_dtype=cd,
                        word_cap=args.word_cap)
    fused = model._fused
    key = (H, W)
    codec_fn = fused._codec(H, W)
    dm = fused._dummies(H, W)

    def enc_fn(params, im, lmb):
        p, _ = codec_fn(params, im, dm['enc'], dm['off'], dm['states'],
                        dm['packed'], dm['esc_pos'], dm['esc_val'], lmb)
        return p
    payload = enc_fn(model.params, imj, lmb_arr)
    np.asarray(payload[:4])
    bits = model.compress(imj, lmb=lmb)
    _ = model.decompress(bits)

    # (a) host dispatch cost of the enc program (no sync)
    enc_disp = min(time_dispatch(enc_fn, model.params, imj, lmb_arr, k=8)
                   for _ in range(3))
    # (b) device exec per iter: chained k + tiny sync
    def run_enc(k):
        t0 = time.perf_counter()
        p = None
        for _ in range(k):
            p = enc_fn(model.params, imj, lmb_arr)
        np.asarray(p[:4])
        return time.perf_counter() - t0
    run_enc(1)
    enc_exec = min((run_enc(6) - run_enc(1)) / 5 for _ in range(3)) * 1e3
    # (c) single run incl. tiny sync (= exec + sync floor + 1 dispatch)
    enc_single = min(run_enc(1) for _ in range(5)) * 1e3
    # (d) full compress() end to end
    comp_t = []
    for _ in range(7):
        t0 = time.perf_counter()
        bits = model.compress(imj, lmb=lmb)
        comp_t.append(time.perf_counter() - t0)
    # (e) payload->bytes glue alone (payload already materialized)
    n_words = int(np.asarray(payload[0]))
    glue_t = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = fused._payload_to_bytes(payload, key)
        glue_t.append(time.perf_counter() - t0)
    print(f'ENC dispatch(no sync) {enc_disp:7.1f} ms | exec/iter '
          f'{enc_exec:7.1f} ms | single+sync {enc_single:7.1f} ms')
    print(f'ENC compress() e2e    {med(comp_t):7.1f} ms | payload_to_bytes '
          f'{med(glue_t):7.1f} ms (n_words={n_words})')

    # ---------------- fused decode ---------------------------------------
    lmb_v, = struct.unpack('f', bits[:4])
    nB, nH, nW = struct.unpack('3H', bits[4:10])
    body = bits[10:]
    states, packed, esc_pos, esc_val = fused.parse_payload(body)

    def dec_fn(params, sj, pj, ej, vj, lmb):
        _, img = codec_fn(params, dm['im'], dm['dec'], dm['on'],
                          sj, pj, ej, vj, lmb)
        return img

    parse_t = []
    for _ in range(5):
        t0 = time.perf_counter()
        fused.parse_payload(body)
        parse_t.append(time.perf_counter() - t0)

    # H2D push cost of the stream arrays
    push_t = []
    for _ in range(5):
        t0 = time.perf_counter()
        a = jnp.asarray(states); b = jnp.asarray(packed)
        c = jnp.asarray(esc_pos); d = jnp.asarray(esc_val)
        np.asarray(a[0, :1])
        push_t.append(time.perf_counter() - t0)
    # pad to the canonical static shapes the unified program expects
    PK, EB = fused._canon_sizes(nH, nW)
    pk_c = np.zeros(PK, np.int32); pk_c[:packed.size] = packed
    ep_c = np.full(EB, -1, np.int32); ep_c[:esc_pos.size] = esc_pos
    ev_c = np.zeros(EB, np.int32); ev_c[:esc_val.size] = esc_val
    sj, pj, ej, vj = (jnp.asarray(states), jnp.asarray(pk_c),
                      jnp.asarray(ep_c), jnp.asarray(ev_c))

    dec_disp = min(time_dispatch(dec_fn, model.params, sj, pj, ej, vj,
                                 lmb_arr, k=8) for _ in range(3))
    def run_dec(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = dec_fn(model.params, sj, pj, ej, vj, lmb_arr)
        np.asarray(r[0, :1, :1, 0])
        return time.perf_counter() - t0
    run_dec(1)
    dec_exec = min((run_dec(6) - run_dec(1)) / 5 for _ in range(3)) * 1e3
    dec_single = min(run_dec(1) for _ in range(5)) * 1e3
    dec_t = []
    for _ in range(7):
        t0 = time.perf_counter()
        img = model.decompress_to_device(lmb_v, nB, nH, nW, body)
        np.asarray(img[0, :1, :1, 0])
        dec_t.append(time.perf_counter() - t0)
    print(f'DEC dispatch(no sync) {dec_disp:7.1f} ms | exec/iter '
          f'{dec_exec:7.1f} ms | single+sync {dec_single:7.1f} ms')
    print(f'DEC e2e+sync          {med(dec_t):7.1f} ms | parse '
          f'{med(parse_t):7.1f} ms | push+sync {med(push_t):7.1f} ms')

    # ---------------- tiny-sync floor ------------------------------------
    zz = jnp.zeros((4,))
    np.asarray(zz)
    sync_t = []
    for _ in range(7):
        y = zz + 1.0
        t0 = time.perf_counter()
        np.asarray(y[:1])
        sync_t.append(time.perf_counter() - t0)
    print(f'tiny fetch floor      {med(sync_t):7.1f} ms')


if __name__ == '__main__':
    main()

"""Why does the rANS decode kernel chain cost ~42 ms inside the fused
decode program but ~6 ms in the standalone microbenchmark?

Probes (all on the REAL payload of a trained-weights compress):
  K1. standalone kernel chain, microbench-style: idx rows as device inputs,
      real words/states — isolates data distribution
  K2. same but words produced by unpack_words(packed) inside the program
  K3. fused decode WITHOUT _patch_escapes
  K4. fused decode where the kernel consumes INPUT idx rows (priors still
      computed but their indexes unused) — isolates kernel<->conv
      interleaving
  K5. full fused decode (reference point)

Usage: python scripts/profile-decode-kernel.py [--dtype bf16|f32]
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
    from lvae_tpu.models import common
    from lvae_tpu.models.fused_base import cast_tree, _ob
    from lvae_tpu.ops.pallas import rans_decode as prd
    from lvae_tpu.models.qarv.model import _patch_escapes
    from scipy.ndimage import gaussian_filter

    model = lvae_tpu.get_model('qarv_base')
    w = 'runs/qarv_base_synth6k_ema.msgpack'
    if os.path.isfile(w):
        model.load_weights(w)
    model.params = jax.device_put(model.params)
    jax.block_until_ready(jax.tree.leaves(model.params)[0])
    model.compress_mode(coder='fused', esc_cap=8192, compute_dtype=cd)
    fused = model._fused
    net = fused.net
    N = fused.N

    H, W = 512, 768
    rng = np.random.default_rng(0)
    im = gaussian_filter(rng.uniform(0, 1, (H, W, 3)), sigma=(4, 4, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = (np.round(im * 255) / 255).astype(np.float32)[None]
    imj = jnp.asarray(im)
    np.asarray(imj[0, :1, :1, 0])

    bits = model.compress(imj, lmb=512.0)
    lmb_v, = struct.unpack('f', bits[:4])
    nB, nH, nW = struct.unpack('3H', bits[4:10])
    states, packed, esc_pos, esc_val = fused.parse_payload(bits[10:])
    sj, pj, ej, vj = (jnp.asarray(states), jnp.asarray(packed),
                      jnp.asarray(esc_pos), jnp.asarray(esc_val))
    lmb_arr = jnp.full((1,), lmb_v, jnp.float32)
    sizes = fused._block_sizes(nH, nW)

    # real idx rows: re-derive from the decode program itself (host pull of
    # per-block indexes via a probe program)
    def idx_probe(params, states, packed, esc_pos, esc_val, lmb):
        cparams = cast_tree(params, cd)
        emb = _ob(fused._emb_stage(params, lmb))
        emb_c = emb.astype(jnp.float32 if cd is None else jnp.dtype(cd))
        words = fused.unpack_words(packed)
        bias = cparams['bias']
        feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
        ptr = jnp.int32(0)
        li = 0
        gstart = 0
        idx_list = []
        for kk, blk in enumerate(net.dec_blocks):
            bp = cparams.get(f'dec_blocks_{kk}', {})
            if getattr(blk, 'is_latent_block', False):
                f_mid, pm, indexes = fused._prior(blk, bp, feature, emb_c)
                nsym = sizes[li]
                T = max((nsym + N - 1) // N, 1)
                idx_rows = jnp.pad(indexes.reshape(-1).astype(jnp.int32),
                                   (0, T * N - nsym)).reshape(T, N)
                idx_list.append(idx_rows)
                syms_TN, states, ptr = prd.rans_decode_block(
                    idx_rows, states, ptr, words, fused.cdfs,
                    jnp.asarray(fused.offsets_np), jnp.int32(nsym),
                    num_lanes=N, interpret=fused.interpret)
                z = syms_TN.reshape(-1)[:nsym].reshape(indexes.shape)
                z = _patch_escapes(z, esc_pos, esc_val, jnp.int32(gstart))
                z = _ob(z)
                feature = fused._fuse(blk, bp, f_mid, pm, z, emb_c)
                gstart += nsym
                li += 1
            elif isinstance(blk, common.CompressionStopFlag):
                break
            else:
                feature = fused._plain(blk, bp, feature, emb_c)
        return idx_list
    idx_rows_all = jax.jit(idx_probe)(model.params, sj, pj, ej, vj, lmb_arr)
    idx_cat = jnp.concatenate(idx_rows_all)
    jax.block_until_ready(idx_cat)

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

    offs = jnp.asarray(fused.offsets_np)

    # K1: standalone chain, idx as inputs, unpacked words as input
    words_in = fused.unpack_words(pj)
    jax.block_until_ready(words_in)

    def k1(idx_cat, states, words):
        ptr = jnp.int32(0)
        row0 = 0
        acc = jnp.int32(0)
        for s in sizes:
            T = max((s + N - 1) // N, 1)
            idx_b = jax.lax.dynamic_slice_in_dim(idx_cat, row0, T)
            syms, states, ptr = prd.rans_decode_block(
                idx_b, states, ptr, words, fused.cdfs, offs, jnp.int32(s),
                num_lanes=N, interpret=fused.interpret)
            acc = acc + jnp.sum(syms)
            row0 += T
        return acc
    print(f'K1 standalone chain, real data : '
          f'{bench(jax.jit(k1), idx_cat, sj, words_in):7.1f} ms', flush=True)

    # K2: same but unpack inside
    def k2(idx_cat, states, packed):
        return k1(idx_cat, states, fused.unpack_words(packed))
    print(f'K2 + in-program unpack_words   : '
          f'{bench(jax.jit(k2), idx_cat, sj, pj):7.1f} ms', flush=True)

    # K4: full conv structure, kernel fed by INPUT idx rows
    def k4(params, idx_cat, states, packed, esc_pos, esc_val, lmb):
        cparams = cast_tree(params, cd)
        emb = _ob(fused._emb_stage(params, lmb))
        emb_c = emb.astype(jnp.float32 if cd is None else jnp.dtype(cd))
        words = fused.unpack_words(packed)
        bias = cparams['bias']
        feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
        ptr = jnp.int32(0)
        li = 0
        row0 = 0
        for kk, blk in enumerate(net.dec_blocks):
            bp = cparams.get(f'dec_blocks_{kk}', {})
            if getattr(blk, 'is_latent_block', False):
                f_mid, pm, indexes = fused._prior(blk, bp, feature, emb_c)
                nsym = sizes[li]
                T = max((nsym + N - 1) // N, 1)
                idx_b = jax.lax.dynamic_slice_in_dim(idx_cat, row0, T)
                syms_TN, states, ptr = prd.rans_decode_block(
                    idx_b, states, ptr, words, fused.cdfs, offs,
                    jnp.int32(nsym), num_lanes=N, interpret=fused.interpret)
                z = syms_TN.reshape(-1)[:nsym].reshape(indexes.shape)
                z = _ob(z)
                feature = fused._fuse(blk, bp, f_mid, pm, z, emb_c)
                row0 += T
                li += 1
            elif isinstance(blk, common.CompressionStopFlag):
                continue
            else:
                feature = fused._plain(blk, bp, feature, emb_c)
        im_out = jnp.clip(feature.astype(jnp.float32), -1, 1) * 0.5 + 0.5
        return im_out.astype(jnp.float16)
    print(f'K4 convs + kernel, input idx   : '
          f'{bench(jax.jit(k4), model.params, idx_cat, sj, pj, ej, vj, lmb_arr):7.1f} ms',
          flush=True)

    # K5: the production unified codec in decode mode
    ms = fused.net.max_stride
    codec_fn = fused._codec(nH * ms, nW * ms)
    dm = fused._dummies(nH * ms, nW * ms)

    def dec_fn(params, s, p, e, v, lmb):
        _, img = codec_fn(params, dm['im'], dm['dec'], dm['on'],
                          s, p, e, v, lmb)
        return img
    # pad the parsed (bucket-sized) arrays to the canonical static shapes
    PK, EB = fused._canon_sizes(nH, nW)
    import numpy as _np
    pk_c = _np.zeros(PK, _np.int32); pk_c[:packed.size] = packed
    ep_c = _np.full(EB, -1, _np.int32); ep_c[:esc_pos.size] = esc_pos
    ev_c = _np.zeros(EB, _np.int32); ev_c[:esc_val.size] = esc_val
    print(f'K5 production fused decode     : '
          f'{bench(dec_fn, model.params, sj, jnp.asarray(pk_c), jnp.asarray(ep_c), jnp.asarray(ev_c), lmb_arr):7.1f} ms',
          flush=True)


if __name__ == '__main__':
    main()

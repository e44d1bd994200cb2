"""Isolate WHY the latent-stage loop costs ~40 ms on TPU: barriers?
bf16 casts? posterior branch? per-block cost split.

Variants of the encode-side latent loop (backbone excluded by reusing its
output as a constant input):
  A. full loop as the fused program runs it (barriers, prior+post+fuse)
  B. same but optimization_barrier = identity (fusion allowed)
  C. barriers, prior+fuse only (posterior replaced by zeros symbols)
  D. one program PER LATENT LEVEL to split cost by resolution

Usage: python scripts/profile-latent-stages.py [--dtype bf16|f32]
"""
import argparse
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
    from lvae_tpu.models.fused_base import cast_tree

    model = lvae_tpu.get_model('qarv_base')
    model.params = jax.device_put(model.params)
    jax.block_until_ready(jax.tree.leaves(model.params)[0])
    model.compress_mode(coder='fused', esc_cap=8192, compute_dtype=cd)
    fused = model._fused
    net = fused.net

    H, W = 512, 768
    rng = np.random.default_rng(0)
    im = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    imj = jnp.asarray(im)
    lmb_arr = jnp.full((1,), 512.0, jnp.float32)
    np.asarray(imj[0, :1, :1, 0])

    # precompute enc features ONCE (device-resident inputs to the loop)
    @jax.jit
    def backbone(params, im, lmb):
        cparams = cast_tree(params, cd)
        emb = fused._emb_stage(params, lmb)
        emb_c = emb.astype(im.dtype if cd is None else jnp.dtype(cd))
        x = net.preprocess_input(im if cd is None else im.astype(cd))
        enc_features = {}
        for i, blk in enumerate(net.enc_blocks):
            bp = cparams.get(f'enc_blocks_{i}', {})
            if isinstance(blk, common.SetKey):
                enc_features[blk.key] = x
            elif getattr(blk, 'requires_embedding', False):
                x = blk.apply({'params': bp}, x, emb_c)
            else:
                x = blk.apply({'params': bp}, x) if bp else blk(x)
        return enc_features, emb_c

    enc_features, emb_c = backbone(model.params, imj, lmb_arr)
    enc_features = jax.tree.map(lambda x: x, enc_features)
    jax.block_until_ready(jax.tree.leaves(enc_features)[0])
    np.asarray(emb_c[:1])

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

    def make_loop(use_barrier, use_posterior, only_blocks=None):
        ob = jax.lax.optimization_barrier if use_barrier else (lambda x: x)

        def loop(params, enc_features, emb_c):
            cparams = cast_tree(params, cd)
            nH, nW = H // net.max_stride, W // net.max_stride
            bias = cparams['bias']
            feature = ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
            acc = jnp.float32(0)
            li = 0
            for kk, blk in enumerate(net.dec_blocks):
                bp = cparams.get(f'dec_blocks_{kk}', {})
                if getattr(blk, 'is_latent_block', False):
                    run_this = only_blocks is None or li in only_blocks
                    li += 1
                    if not run_this:
                        continue
                    f_mid, pm, indexes = ob(blk.apply(
                        {'params': bp}, feature, emb_c,
                        method='prior_stage'))[0:3]
                    if use_posterior:
                        qm = blk.apply({'params': bp}, f_mid,
                                       enc_features[blk.enc_key], emb_c,
                                       method='posterior_qm')
                        syms = jnp.round(
                            qm.astype(jnp.float32) -
                            pm.astype(jnp.float32)).astype(jnp.int32)
                        syms = ob(syms)
                    else:
                        syms = jnp.zeros(pm.shape, jnp.int32)
                    feature = ob(blk.apply({'params': bp}, f_mid, pm, syms,
                                           emb_c, method='fuse_stage'))
                    acc = acc + jnp.sum(indexes) + jnp.sum(syms)
                elif isinstance(blk, common.CompressionStopFlag):
                    break
                else:
                    if getattr(blk, 'requires_embedding', False):
                        out = blk.apply({'params': bp}, feature, emb_c)
                    elif bp:
                        out = blk.apply({'params': bp}, feature)
                    else:
                        out = blk(feature)
                    feature = ob(out)
            return acc + jnp.sum(feature.astype(jnp.float32))
        return jax.jit(loop)

    a = bench(make_loop(True, True), model.params, enc_features, emb_c)
    print(f'latent loop, barriers, post    : {a:7.1f} ms', flush=True)
    b = bench(make_loop(False, True), model.params, enc_features, emb_c)
    print(f'latent loop, NO barriers, post : {b:7.1f} ms '
          f'(barrier cost {a - b:+5.1f})', flush=True)
    c = bench(make_loop(True, False), model.params, enc_features, emb_c)
    print(f'latent loop, barriers, NO post : {c:7.1f} ms '
          f'(posterior cost {a - c:+5.1f})', flush=True)
    nlat = sum(1 for blk in net.dec_blocks
               if getattr(blk, 'is_latent_block', False))
    for lo in range(0, nlat, 3):
        blocks = set(range(lo, min(lo + 3, nlat)))
        d = bench(make_loop(True, True, blocks), model.params,
                  enc_features, emb_c)
        print(f'latent loop, only blocks {sorted(blocks)}: {d:7.1f} ms',
              flush=True)


if __name__ == '__main__':
    main()

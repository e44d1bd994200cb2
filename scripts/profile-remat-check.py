"""Check whether XLA duplicates (rematerializes) the encode backbone when
it is composed with the latent loop in one program: compare cost-analysis
FLOPs of backbone-only, loop-only, and the composed program. If
flops(composed) >> flops(backbone) + flops(loop), the scheduler is
recomputing the backbone features per use site.

Usage: python scripts/profile-remat-check.py [--dtype bf16|f32]
"""
import argparse

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
    import lvae_tpu
    from lvae_tpu.models import common
    from lvae_tpu.models.fused_base import cast_tree, _ob

    model = lvae_tpu.get_model('qarv_base')
    model.compress_mode(coder='fused', esc_cap=8192, compute_dtype=cd)
    fused = model._fused
    net = fused.net

    H, W = 512, 768
    im = np.zeros((1, H, W, 3), np.float32)
    imj = jnp.asarray(im)
    lmb_arr = jnp.full((1,), 512.0, jnp.float32)

    def backbone_body(params, im, lmb):
        cparams = cast_tree(params, cd)
        emb = _ob(fused._emb_stage(params, lmb))
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

    def loop_body(params, enc_features, emb_c):
        cparams = cast_tree(params, cd)
        nH, nW = H // net.max_stride, W // net.max_stride
        bias = cparams['bias']
        feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
        acc = jnp.float32(0)
        for kk, blk in enumerate(net.dec_blocks):
            bp = cparams.get(f'dec_blocks_{kk}', {})
            if getattr(blk, 'is_latent_block', False):
                f_mid, pm, indexes = fused._prior(blk, bp, feature, emb_c)
                qm = blk.apply({'params': bp}, f_mid,
                               enc_features[blk.enc_key], emb_c,
                               method='posterior_qm')
                syms = jnp.round(qm.astype(jnp.float32) -
                                 pm.astype(jnp.float32)).astype(jnp.int32)
                syms = _ob(syms)
                feature = fused._fuse(blk, bp, f_mid, pm, syms, emb_c)
                acc = acc + jnp.sum(syms) + jnp.sum(indexes)
            elif isinstance(blk, common.CompressionStopFlag):
                break
            else:
                feature = fused._plain(blk, bp, feature, emb_c)
        return acc + jnp.sum(feature.astype(jnp.float32))

    def composed(params, im, lmb):
        enc_features, emb_c = backbone_body(params, im, lmb)
        return loop_body(params, enc_features, emb_c)

    def flops_of(fn, *a):
        c = jax.jit(fn).lower(*a).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get('flops', float('nan'))), \
            float(ca.get('bytes accessed', float('nan')))

    fb, bb = flops_of(lambda p, i, l: jax.tree.map(
        jnp.sum, backbone_body(p, i, l)[0]), model.params, imj, lmb_arr)
    print(f'backbone only : {fb / 1e9:8.2f} GFLOP  {bb / 1e6:9.1f} MB')

    ef, emb_c = jax.eval_shape(backbone_body, model.params, imj, lmb_arr)
    enc_in = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), ef)
    emb_in = jnp.zeros(emb_c.shape, emb_c.dtype)
    fl, bl = flops_of(loop_body, model.params, enc_in, emb_in)
    print(f'loop only     : {fl / 1e9:8.2f} GFLOP  {bl / 1e6:9.1f} MB')

    fc, bc = flops_of(composed, model.params, imj, lmb_arr)
    print(f'composed      : {fc / 1e9:8.2f} GFLOP  {bc / 1e6:9.1f} MB')
    print(f'duplication   : {fc / max(fb + fl, 1):.2f}x flops, '
          f'{bc / max(bb + bl, 1):.2f}x bytes')


if __name__ == '__main__':
    main()

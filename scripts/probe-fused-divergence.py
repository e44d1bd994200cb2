"""Locate WHERE the fused encode diverges from the staged/host path on TPU.

probe-distortion-parity showed (trained weights, f32): host-coded recon
== forward-eval PSNR exactly, but fused-coded recon is 7-10 dB worse at
near-identical rate. CPU runs are bit-identical, so the divergence is
TPU-compilation-specific. This probe jits an INSTRUMENTED clone of the
fused encode program (same codec stage helpers, same barriers) that
returns every per-block tensor, and compares against the staged stage-fn
path tensor by tensor:

  per latent block k: max|pm_fused - pm_staged|, max|qm_f - qm_s|,
                      #(syms_f != syms_s)
  plus the two synthesis-tail recons from IDENTICAL z sequences.

Usage: python scripts/probe-fused-divergence.py [--lmb 2048]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--image', default='runs/synth-val/syn00000.png')
    ap.add_argument('--weights', default='runs/qarv_base_synth6k_ema.msgpack')
    ap.add_argument('--lmb', type=float, default=2048.0)
    args = ap.parse_args()

    import os
    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    from lvae_tpu.models import common
    from lvae_tpu.models.base import image_to_batch
    from PIL import Image

    model = lvae_tpu.get_model('qarv_base')
    model.load_weights(args.weights)
    model.compress_mode(coder='fused')
    codec = model._fused
    net = model.net
    im = np.asarray(image_to_batch(Image.open(args.image).convert('RGB')))
    _, imH, imW, _ = im.shape
    lmb_arr = jnp.full((1,), float(args.lmb), jnp.float32)

    # ---- instrumented clone of the fused encode path (f32; the production
    # codec is now ONE unified program, see qarv/fused.py) -----------------
    def dbg_prog(params, im, lmb):
        from lvae_tpu.models.fused_base import _ob
        emb = _ob(codec._emb_stage(params, lmb))
        emb_c = emb.astype(jnp.float32)
        x = net.preprocess_input(im)
        enc_features = {}
        for i, blk in enumerate(net.enc_blocks):
            bp = params.get(f'enc_blocks_{i}', {})
            if isinstance(blk, common.SetKey):
                enc_features[blk.key] = x.astype(jnp.float32)
            elif getattr(blk, 'requires_embedding', False):
                x = blk.apply({'params': bp}, x, emb_c)
            else:
                x = blk.apply({'params': bp}, x) if bp else blk(x)
        nH, nW = imH // net.max_stride, imW // net.max_stride
        bias = params['bias']
        feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
        out = []
        for k, blk in enumerate(net.dec_blocks):
            bp = params.get(f'dec_blocks_{k}', {})
            if getattr(blk, 'is_latent_block', False):
                f_mid, pm, indexes = codec._prior(blk, bp, feature, emb_c)
                qm = blk.apply({'params': bp}, f_mid,
                               enc_features[blk.enc_key], emb_c,
                               method='posterior_qm')
                syms = jnp.round(qm.astype(jnp.float32) -
                                 pm.astype(jnp.float32)).astype(jnp.int32)
                syms = _ob(syms)
                feature = codec._fuse(blk, bp, f_mid, pm, syms, emb_c)
                out.append((pm, qm, syms, indexes))
            elif isinstance(blk, common.CompressionStopFlag):
                continue   # selfcheck mode: run the tail too
            else:
                feature = codec._plain(blk, bp, feature, emb_c)
        rec = jnp.clip(feature.astype(jnp.float32), -1, 1) * 0.5 + 0.5
        return out, rec

    fused_out, fused_rec = jax.jit(dbg_prog)(model.params, jnp.asarray(im),
                                             lmb_arr)
    fused_out = [[np.asarray(t) for t in blk] for blk in fused_out]
    fused_rec = np.asarray(fused_rec)

    # ---- staged path (exactly what the host coder drives) ----------------
    fns, params = model._stage_fns, model.params
    emb = fns['emb'](params['lmb_embed_0'], params['lmb_embed_1'], lmb_arr)
    enc_features = fns['backbone'](params, jnp.asarray(im), emb)
    nH, nW = imH // net.max_stride, imW // net.max_stride
    feature = jnp.broadcast_to(params['bias'],
                               (1, nH, nW, params['bias'].shape[-1]))
    staged = []
    li = 0
    for k, block in enumerate(net.dec_blocks):
        bp = model._block_params(k)
        if getattr(block, 'is_latent_block', False):
            f_mid, pm, pv, indexes = fns['prior'](block, bp, feature, emb)
            qm = block.apply({'params': bp}, f_mid,
                             enc_features[block.enc_key], emb,
                             method='posterior_qm')
            _, sym32 = fns['post_sym'](
                block, bp, f_mid, enc_features[block.enc_key], pm, emb)
            feature = fns['fuse'](block, bp, f_mid, pm, sym32, emb)
            staged.append((np.asarray(pm), np.asarray(qm),
                           np.asarray(sym32), np.asarray(indexes)))
            li += 1
        elif isinstance(block, common.CompressionStopFlag):
            continue   # keep going: compare the tail recon too
        else:
            feature = fns['plain'](block, bp, feature, emb)
    staged_rec = np.asarray(
        jnp.clip(feature.astype(jnp.float32), -1, 1) * 0.5 + 0.5)

    # ---- compare ---------------------------------------------------------
    print(f'lmb={args.lmb:g}  image={args.image}')
    for k, ((pmf, qmf, syf, ixf), (pms, qms, sys_, ixs)) in enumerate(
            zip(fused_out, staged)):
        print(f'block {k}: max|pm|={np.abs(pmf - pms).max():.3e} '
              f'max|qm|={np.abs(qmf - qms).max():.3e} '
              f'sym_diff={(syf != sys_).sum()}/{syf.size} '
              f'idx_diff={(ixf != ixs).sum()}/{ixf.size}', flush=True)
    d = np.abs(fused_rec - staged_rec)
    print(f'tail recon: max|fused-staged|={d.max():.3e} '
          f'ndiff(>1e-3)={(d > 1e-3).sum()}/{d.size}')

    def psnr(a, b):
        import math
        mse = float(np.mean(np.square(a.astype(np.float64)
                                      - b.astype(np.float64))))
        return -10 * math.log10(max(mse, 1e-12))
    print(f'PSNR vs original: fused-instrumented={psnr(fused_rec, im):.2f} '
          f'staged={psnr(staged_rec, im):.2f}')

    # the REAL compiled selfcheck program (instrumentation can change the
    # compilation, so also compare the production path's own recon)
    _, real_img = codec.encode_check(model.params, jnp.asarray(im), lmb_arr)
    real_img = real_img.astype(np.float32)
    print(f'real encode_check recon: psnr_vs_orig={psnr(real_img, im):.2f} '
          f'max|real-staged|={np.abs(real_img - staged_rec).max():.3e} '
          f'max|real-instr|={np.abs(real_img - fused_rec).max():.3e}')


if __name__ == '__main__':
    main()

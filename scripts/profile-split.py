"""Compare the monolithic fused-encode program against multi-dispatch
splits with device-resident intermediates (NO host sync between parts).

Dispatch cost on this runtime is ~1.5 ms (profile-fused-attrib), so if the
composition penalty (~37 ms: parts sum to ~34 ms, monolith measures 71.6)
comes from XLA scheduling/layout pathologies, splitting wins big while
preserving the single-host-pull property.

Variants:
  M : monolithic encode (reference point)
  S2: backbone+emb | rest (loop+inband+rows+kernel+assembly)
  S3: backbone+emb | loop->syms | rans tail (inband+rows+kernel+assembly)
  R : loop+tail only, enc_features as inputs (isolates which side carries
      the composition penalty)

Usage: python scripts/profile-split.py [--dtype bf16|f32]
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
    from lvae_tpu.models.fused_base import cast_tree, _ob
    from lvae_tpu.ops.pallas import rans_encode as pre
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
    lmb_arr = jnp.full((1,), 512.0, jnp.float32)
    np.asarray(imj[0, :1, :1, 0])

    # ---------------- pieces ---------------------------------------------
    def backbone_fn(params, im, lmb):
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

    def loop_fn(params, enc_features, emb_c):
        cparams = cast_tree(params, cd)
        nH, nW = H // net.max_stride, W // net.max_stride
        bias = cparams['bias']
        feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
        syms_flat, idx_flat = [], []
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
                syms_flat.append(syms.reshape(-1))
                idx_flat.append(indexes.reshape(-1).astype(jnp.int32))
            elif isinstance(blk, common.CompressionStopFlag):
                break
            else:
                feature = fused._plain(blk, bp, feature, emb_c)
        return syms_flat, idx_flat

    def tail_fn(syms_flat, idx_flat):
        return fused.pack_payload(list(syms_flat), list(idx_flat))

    # ---------------- timing helpers --------------------------------------
    def bench_seq(fns_and_args_builder, k=6):
        """fns_and_args_builder() runs the whole chain once (dispatches
        only); time k chained executions + one tiny sync."""
        out = fns_and_args_builder()
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])

        def run(kk):
            t0 = time.perf_counter()
            o = None
            for _ in range(kk):
                o = fns_and_args_builder()
            np.asarray(jax.tree.leaves(o)[0].reshape(-1)[:1])
            return time.perf_counter() - t0
        run(1)
        return min((run(k) - run(1)) / (k - 1) for _ in range(3)) * 1e3

    # M: monolith
    def mono(params, im, lmb):
        enc_features, emb_c = backbone_fn(params, im, lmb)
        s, i = loop_fn(params, enc_features, emb_c)
        return tail_fn(s, i)
    mono_j = jax.jit(mono)
    ms = bench_seq(lambda: mono_j(model.params, imj, lmb_arr))
    print(f'M  monolith               : {ms:7.1f} ms', flush=True)

    # S2
    bb_j = jax.jit(backbone_fn)
    def rest(params, enc_features, emb_c):
        s, i = loop_fn(params, enc_features, emb_c)
        return tail_fn(s, i)
    rest_j = jax.jit(rest)

    def s2():
        ef, emb_c = bb_j(model.params, imj, lmb_arr)
        return rest_j(model.params, ef, emb_c)
    ms = bench_seq(s2)
    print(f'S2 backbone | rest        : {ms:7.1f} ms', flush=True)

    # S3
    loop_j = jax.jit(loop_fn)
    tail_j = jax.jit(tail_fn)

    def s3():
        ef, emb_c = bb_j(model.params, imj, lmb_arr)
        s, i = loop_j(model.params, ef, emb_c)
        return tail_j(s, i)
    ms = bench_seq(s3)
    print(f'S3 backbone | loop | tail : {ms:7.1f} ms', flush=True)

    # R: rest-only with input features (composition penalty locator)
    ef, emb_c = bb_j(model.params, imj, lmb_arr)
    ef = jax.tree.map(lambda x: x, ef)
    jax.block_until_ready(jax.tree.leaves(ef)[0])
    ms = bench_seq(lambda: rest_j(model.params, ef, emb_c))
    print(f'R  loop+tail, input feats : {ms:7.1f} ms', flush=True)


if __name__ == '__main__':
    main()

"""Stage-by-stage device-exec attribution of the fused codec programs.

Builds truncated variants of the fused encode/decode programs (backbone
only; + latent stages; + escape glue; + row layout; full) and times each
with the chained-run trick, so the per-stage device cost is the delta
between variants. Run after profile-fused-attrib.py said WHERE the time is
(inside the programs); this says WHICH stage.

Usage: python scripts/profile-fused-stages.py [--dtype bf16|f32]
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
    from scipy.ndimage import gaussian_filter
    from lvae_tpu.ops.pallas import rans_encode as pre

    model = lvae_tpu.get_model('qarv_base')
    w = 'runs/qarv_base_synth6k_ema.msgpack'
    if os.path.isfile(w):
        model.load_weights(w)
    model.params = jax.device_put(model.params)
    jax.block_until_ready(jax.tree.leaves(model.params)[0])

    rng = np.random.default_rng(0)
    H, W = 512, 768
    im = gaussian_filter(rng.uniform(0, 1, (H, W, 3)), sigma=(4, 4, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = (np.round(im * 255) / 255).astype(np.float32)[None]
    lmb_arr = jnp.full((1,), 512.0, jnp.float32)
    imj = jnp.asarray(im)
    np.asarray(imj[0, :1, :1, 0])

    model.compress_mode(coder='fused', esc_cap=8192, compute_dtype=cd)
    fused = model._fused
    net = fused.net
    N = fused.N

    def bench(fn, *a, k=6):
        r = fn(*a)
        jax.tree.map(lambda x: np.asarray(x.reshape(-1)[:1]), r)

        def run(kk):
            t0 = time.perf_counter()
            out = None
            for _ in range(kk):
                out = fn(*a)
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf.reshape(-1)[:1])
            return time.perf_counter() - t0
        run(1)
        return min((run(k) - run(1)) / (k - 1) for _ in range(3)) * 1e3

    # ---------- encode variants ------------------------------------------
    def make_enc(stop):
        """stop: 'backbone' | 'latents' | 'inband' | 'rows' | 'full'"""
        def enc_prog(params, im, lmb):
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
            if stop == 'backbone':
                return sum(jnp.sum(v) for v in enc_features.values())
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
            if stop == 'latents':
                return (sum(jnp.sum(v) for v in syms_flat) +
                        sum(jnp.sum(v) for v in idx_flat))
            # ---- pack_payload pieces, truncatable ----
            esc_cap = fused.esc_cap
            offsets = jnp.asarray(fused.offsets_np)
            lengths = jnp.asarray(fused.lengths_np)
            values = jnp.concatenate(syms_flat)
            idx_all = jnp.concatenate(idx_flat)
            inband, esc_mask = pre.prepare_inband(values, idx_all,
                                                  offsets, lengths)
            mask_i = esc_mask.astype(jnp.int32)
            n_esc_true = jnp.sum(mask_i)
            rank = jnp.cumsum(mask_i) - 1
            slot = jnp.where(esc_mask, rank, esc_cap)
            pos_iota = jnp.arange(values.shape[0], dtype=jnp.int32)
            esc_pos = jnp.full((esc_cap,), -1, jnp.int32).at[slot].set(
                pos_iota, mode='drop')
            esc_val = jnp.where(esc_pos >= 0,
                                values[jnp.clip(esc_pos, 0, None)], 0)
            if stop == 'inband':
                return (jnp.sum(inband) + n_esc_true + jnp.sum(esc_pos) +
                        jnp.sum(esc_val))
            sym_rows, idx_rows, row_ns = [], [], []
            off = 0
            for s in [v.shape[0] for v in syms_flat]:
                Tb = max((s + N - 1) // N, 1)
                pad = Tb * N - s
                sym_rows.append(jnp.pad(jax.lax.dynamic_slice_in_dim(
                    inband, off, s), (0, pad)).reshape(Tb, N))
                idx_rows.append(jnp.pad(jax.lax.dynamic_slice_in_dim(
                    idx_all, off, s), (0, pad)).reshape(Tb, N))
                rn = np.full(Tb, N, np.int32)
                rn[-1] = s - (Tb - 1) * N
                row_ns.append(rn)
                off += s
            sym_cat = jnp.concatenate(sym_rows)
            idx_cat = jnp.concatenate(idx_rows)
            if stop == 'rows':
                return jnp.sum(sym_cat) + jnp.sum(idx_cat) + jnp.sum(esc_pos)
            buf, n_words, states = pre.rans_encode_all(
                sym_cat, idx_cat, np.concatenate(row_ns), fused.cdfs,
                num_lanes=N, interpret=fused.interpret)
            if stop == 'kernel':
                return n_words + jnp.sum(states)
            half = buf.shape[0] // 2
            packed = (buf[0::2][:half] & 0xFFFF) | \
                     ((buf[1::2][:half] & 0xFFFF) << 16)
            head = jnp.concatenate([
                jnp.stack([n_words, n_esc_true, jnp.int32(N)]),
                states.reshape(-1)])
            esc_pairs = jnp.stack([esc_pos.astype(jnp.int32),
                                   esc_val.astype(jnp.int32)],
                                  axis=1).reshape(-1)
            body = jnp.concatenate([packed,
                                    jnp.zeros(esc_pairs.shape[0], jnp.int32)])
            body = jax.lax.dynamic_update_slice(
                body, esc_pairs, ((n_words + 1) // 2,))
            return jnp.concatenate([head, body])
        return jax.jit(enc_prog)

    prev = 0.0
    for stop in ['backbone', 'latents', 'inband', 'rows', 'kernel', 'full']:
        ms = bench(make_enc(stop), model.params, imj, lmb_arr)
        print(f'ENC through {stop:<9s}: {ms:7.1f} ms  (+{ms - prev:6.1f})',
              flush=True)
        prev = ms

    # ---------- decode variants ------------------------------------------
    bits = model.compress(imj, lmb=512.0)
    import struct
    lmb_v, = struct.unpack('f', bits[:4])
    nB, nH, nW = struct.unpack('3H', bits[4:10])
    states, packed, esc_pos, esc_val = fused.parse_payload(bits[10:])
    sj, pj, ej, vj = (jnp.asarray(states), jnp.asarray(packed),
                      jnp.asarray(esc_pos), jnp.asarray(esc_val))

    from lvae_tpu.ops.pallas import rans_decode as prd
    from lvae_tpu.models.qarv.model import _patch_escapes
    sizes = fused._block_sizes(nH, nW)

    def make_dec(use_kernel, full_synth=True):
        def dec_prog(params, states, packed, esc_pos, esc_val, lmb):
            cparams = cast_tree(params, cd)
            emb = _ob(fused._emb_stage(params, lmb))
            emb_c = emb.astype(jnp.float32 if cd is None else jnp.dtype(cd))
            words = fused.unpack_words(packed)
            bias = cparams['bias']
            feature = _ob(jnp.broadcast_to(bias,
                                           (1, nH, nW, bias.shape[-1])))
            ptr = jnp.int32(0)
            li = 0
            gstart = 0
            for kk, blk in enumerate(net.dec_blocks):
                bp = cparams.get(f'dec_blocks_{kk}', {})
                if getattr(blk, 'is_latent_block', False):
                    f_mid, pm, indexes = fused._prior(blk, bp, feature,
                                                      emb_c)
                    nsym = sizes[li]
                    T = max((nsym + N - 1) // N, 1)
                    if use_kernel:
                        idx_rows = jnp.pad(
                            indexes.reshape(-1).astype(jnp.int32),
                            (0, T * N - nsym)).reshape(T, N)
                        syms_TN, states, ptr = prd.rans_decode_block(
                            idx_rows, states, ptr, words, fused.cdfs,
                            jnp.asarray(fused.offsets_np), jnp.int32(nsym),
                            num_lanes=N, interpret=fused.interpret)
                        z = syms_TN.reshape(-1)[:nsym].reshape(indexes.shape)
                    else:
                        z = jnp.zeros(indexes.shape, jnp.int32)
                    z = _patch_escapes(z, esc_pos, esc_val,
                                       jnp.int32(gstart))
                    z = _ob(z)
                    feature = fused._fuse(blk, bp, f_mid, pm, z, emb_c)
                    gstart += nsym
                    li += 1
                elif isinstance(blk, common.CompressionStopFlag):
                    continue
                else:
                    if not full_synth:
                        break
                    feature = fused._plain(blk, bp, feature, emb_c)
            im_out = jnp.clip(feature.astype(jnp.float32), -1.0, 1.0) * 0.5 \
                + 0.5
            return im_out.astype(jnp.float16)
        return jax.jit(dec_prog)

    a = bench(make_dec(False, False), model.params, sj, pj, ej, vj, lmb_arr)
    print(f'DEC convs (no kernel, no synth):  {a:7.1f} ms', flush=True)
    b = bench(make_dec(False, True), model.params, sj, pj, ej, vj, lmb_arr)
    print(f'DEC convs+synth (no kernel):      {b:7.1f} ms  '
          f'(synth +{b - a:5.1f})', flush=True)
    c = bench(make_dec(True, True), model.params, sj, pj, ej, vj, lmb_arr)
    print(f'DEC full (kernel+convs+synth):    {c:7.1f} ms  '
          f'(kernel +{c - b:5.1f})', flush=True)


if __name__ == '__main__':
    main()

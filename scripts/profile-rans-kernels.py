"""Microbenchmark the Pallas rANS kernels in isolation on the real TPU.

Times the encode kernel (one call, all rows) and the decode kernel chained
per block, at the qarv_base 512x768 operating shape (T ~= 4824 rows of
N=128 lanes), using the chained-run trick to subtract the tunnel's fixed
sync cost (block_until_ready does not wait on axon; only fetches sync).

Usage: python scripts/profile-rans-kernels.py
"""
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import os
    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from lvae_tpu.ops.cdf import build_cdf_table, default_gaussian_scale_table
    from lvae_tpu.ops.pallas import rans_encode as pre
    from lvae_tpu.ops.pallas import rans_decode as prd

    table = build_cdf_table(default_gaussian_scale_table())
    cdfs_np, offs_np = prd.prepare_device_cdf(table)
    cdfs = jnp.asarray(cdfs_np)
    offs = jnp.asarray(offs_np)

    N = 128
    # qarv_base @ 512x768 block sizes (symbols per latent block)
    sizes = [3072] + [12288] * 2 + [147456] * 3 + [49152] * 3
    rng = np.random.default_rng(0)
    sym_blocks = [rng.integers(-8, 8, s).astype(np.int32) for s in sizes]
    idx_blocks = [rng.integers(8, 40, s).astype(np.int32) for s in sizes]
    offsets = offs_np
    vals = [s - offsets[i][0] if False else s for s in sym_blocks]

    syms_rows, idx_rows, row_n = pre.blocks_to_rows(sym_blocks, idx_blocks, N)
    # in-band clip
    inband, _ = pre.prepare_inband(jnp.asarray(np.concatenate(sym_blocks)),
                                   jnp.asarray(np.concatenate(idx_blocks)),
                                   jnp.asarray(offs_np),
                                   jnp.asarray(table.cdf_lengths.astype(np.int32)))
    inband = np.asarray(inband)
    off2 = 0
    sb = []
    for s in sizes:
        Tb = max((s + N - 1) // N, 1)
        pad = Tb * N - s
        sb.append(np.pad(inband[off2:off2 + s], (0, pad)).reshape(Tb, N))
        off2 += s
    syms_rows = np.concatenate(sb)
    T = syms_rows.shape[0]
    print(f'T = {T} rows, {sum(sizes)} symbols')

    syms_d = jnp.asarray(syms_rows)
    idx_d = jnp.asarray(idx_rows)

    def enc_once(syms, idxs):
        buf, n_words, states = pre.rans_encode_all(
            syms, idxs, row_n, cdfs, num_lanes=N)
        return n_words, states

    nw, states = enc_once(syms_d, idx_d)
    print('n_words =', int(np.asarray(nw)))

    def run_enc(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = enc_once(syms_d, idx_d)
        np.asarray(out[0])
        return time.perf_counter() - t0
    run_enc(1)
    enc_ms = min((run_enc(4) - run_enc(1)) / 3 for _ in range(3)) * 1e3
    print(f'encode kernel (all rows, one call): {enc_ms:8.1f} ms')

    # decode: chained per-block calls like the fused decode program
    buf, n_words, states = pre.rans_encode_all(syms_d, idx_d, row_n, cdfs,
                                               num_lanes=N)
    nwi = int(np.asarray(n_words))
    words = np.asarray(buf)[:nwi][::-1].astype(np.int32)
    stream = jnp.asarray(np.ascontiguousarray(words))
    states_j = states

    import functools

    @functools.partial(jax.jit, static_argnames=('sizes_t',))
    def dec_all(stream, states, idx_rows_d, sizes_t):
        ptr = jnp.int32(0)
        row0 = 0
        outs = []
        for s in sizes_t:
            Tb = max((s + N - 1) // N, 1)
            idx_b = jax.lax.dynamic_slice_in_dim(idx_rows_d, row0, Tb)
            syms, states, ptr = prd.rans_decode_block(
                idx_b, states, ptr, stream, cdfs, offs, jnp.int32(s),
                num_lanes=N)
            outs.append(jnp.sum(syms))
            row0 += Tb
        return sum(outs)

    sizes_t = tuple(sizes)
    r = dec_all(stream, states_j, idx_d, sizes_t)
    np.asarray(r)

    def run_dec(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = dec_all(stream, states_j, idx_d, sizes_t)
        np.asarray(out)
        return time.perf_counter() - t0
    run_dec(1)
    dec_ms = min((run_dec(4) - run_dec(1)) / 3 for _ in range(3)) * 1e3
    print(f'decode kernels (chained blocks):    {dec_ms:8.1f} ms')


if __name__ == '__main__':
    main()

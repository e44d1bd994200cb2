"""Multi-image decode kernel: bit-identity vs per-image decode chains.

rans_decode_block_multi stacks B images' independent lane-state chains on
the VPU sublane dimension (one kernel invocation per latent block instead
of B), the decode-side mirror of rans_encode_all_multi. Every arithmetic
op per image is the same exact int32/f32 op as the single-image kernel,
so symbols/states/pointers must match bitwise — these tests pin that in
interpret mode; the hardware suite covers the Mosaic lowering.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lvae_tpu.ops.cdf import build_cdf_table, default_gaussian_scale_table
from lvae_tpu.ops.pallas import rans_decode as prd
from lvae_tpu.ops.pallas import rans_encode as pre


def _table():
    return build_cdf_table(default_gaussian_scale_table())


def _encode_streams(B, blocks_T, N, seed=0):
    """Encode B images' multi-block symbol layouts with the single-image
    encode kernel; return per-image (words, states0, idx_rows, syms_rows,
    row_n) in DECODE orientation."""
    table = _table()
    cdfs_np, offs_np = prd.prepare_device_cdf(table)
    cdfs = jnp.asarray(cdfs_np)
    rng = np.random.default_rng(seed)
    # the ragged tail is a property of the (shared) image shape — all
    # images in a batch have identical row layout, only content differs
    block_n = [T * N - int(rng.integers(0, N)) for T in blocks_T]
    out = []
    for b in range(B):
        sym_rows, idx_rows, row_ns = [], [], []
        for T, n in zip(blocks_T, block_n):
            idx = rng.integers(0, len(table.offsets), n).astype('int32')
            # in-band symbols: sample within each scale's support
            val = np.minimum(rng.integers(0, 6, n),
                             table.cdf_lengths[idx] - 2).astype('int32')
            sym_rows.append(prd.pad_rows(val, N))
            idx_rows.append(prd.pad_rows(idx, N))
            rn = np.full(T, N, 'int32')
            rn[-1] = n - (T - 1) * N if n > (T - 1) * N else N
            row_ns.append(rn)
        syms = np.concatenate(sym_rows)
        idxs = np.concatenate(idx_rows)
        row_n = np.concatenate(row_ns)
        inband, _ = pre.prepare_inband(
            jnp.asarray(syms), jnp.asarray(idxs),
            table.offsets, table.cdf_lengths)
        buf, n_words, states = pre.rans_encode_all(
            jnp.asarray(inband), jnp.asarray(idxs), row_n, cdfs,
            num_lanes=N, interpret=True)
        words = pre.pairs_to_words_np(buf, int(n_words))[::-1]  # stream order
        out.append(dict(words=np.ascontiguousarray(words).astype(np.int32),
                        states=np.asarray(states, np.int32),
                        idx=idxs, syms=syms, row_n=row_n))
    return out, cdfs_np, offs_np


@pytest.mark.parametrize('B', [2, 3])
def test_multi_matches_per_image_chains(B):
    N = 128
    blocks_T = [3, 5, 2]
    enc, cdfs_np, offs_np = _encode_streams(B, blocks_T, N, seed=B)
    cdfs = jnp.asarray(cdfs_np)
    offs = jnp.asarray(offs_np)
    W = max(e['words'].size for e in enc)
    streams = np.zeros((B, W), np.int32)
    for b, e in enumerate(enc):
        streams[b, :e['words'].size] = e['words']

    # reference: B independent single-image chains across all blocks
    ref_syms = [[] for _ in range(B)]
    st_ref = [jnp.asarray(e['states']).reshape(1, N) for e in enc]
    pt_ref = [jnp.int32(0) for _ in range(B)]
    row0 = 0
    for T in blocks_T:
        for b, e in enumerate(enc):
            nsym = int(e['row_n'][row0:row0 + T].sum())
            s, st, p = prd.rans_decode_block(
                jnp.asarray(e['idx'][row0:row0 + T]), st_ref[b], pt_ref[b],
                jnp.asarray(streams[b]), cdfs, offs, jnp.int32(nsym),
                num_lanes=N, interpret=True)
            ref_syms[b].append(np.asarray(s))
            st_ref[b], pt_ref[b] = st, p
        row0 += T

    # multi kernel: same chain, one grouped call per block
    st_m = jnp.asarray(np.concatenate([e['states'] for e in enc]))
    pt_m = jnp.zeros((B,), jnp.int32)
    row0 = 0
    for bi, T in enumerate(blocks_T):
        nsym = int(enc[0]['row_n'][row0:row0 + T].sum())
        # same-shape batch invariant: identical row layout across images
        for e in enc:
            assert int(e['row_n'][row0:row0 + T].sum()) == nsym
        idx_b = jnp.asarray(np.stack(
            [e['idx'][row0:row0 + T] for e in enc]))
        s, st_m, pt_m = prd.rans_decode_block_multi(
            idx_b, st_m, pt_m, jnp.asarray(streams), cdfs, offs,
            jnp.int32(nsym), num_lanes=N, interpret=True)
        for b in range(B):
            np.testing.assert_array_equal(np.asarray(s[b]),
                                          ref_syms[b][bi])
        row0 += T

    for b in range(B):
        np.testing.assert_array_equal(np.asarray(st_m[b]),
                                      np.asarray(st_ref[b]).reshape(N))
        assert int(pt_m[b]) == int(pt_ref[b])


def test_vmem_group_split_matches_single_group():
    """Force the VMEM grouping path (g < B) and check bit-identity."""
    N = 128
    B, T = 3, 4
    enc, cdfs_np, offs_np = _encode_streams(B, [T], N, seed=9)
    cdfs = jnp.asarray(cdfs_np)
    offs = jnp.asarray(offs_np)
    W = max(e['words'].size for e in enc)
    streams = np.zeros((B, W), np.int32)
    for b, e in enumerate(enc):
        streams[b, :e['words'].size] = e['words']
    idx_b = jnp.asarray(np.stack([e['idx'][:T] for e in enc]))
    st = jnp.asarray(np.concatenate([e['states'] for e in enc]))
    pt = jnp.zeros((B,), jnp.int32)
    nsym = jnp.int32(int(enc[0]['row_n'][:T].sum()))

    s1, st1, pt1 = prd.rans_decode_block_multi(
        idx_b, st, pt, jnp.asarray(streams), cdfs, offs, nsym,
        num_lanes=N, interpret=True)
    orig = prd._DEC_VMEM_BUDGET
    try:
        prd._DEC_VMEM_BUDGET = 1          # one image per group
        s2, st2, pt2 = prd.rans_decode_block_multi(
            idx_b, st, pt, jnp.asarray(streams), cdfs, offs, nsym,
            num_lanes=N, interpret=True)
    finally:
        prd._DEC_VMEM_BUDGET = orig
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(st1), np.asarray(st2))
    np.testing.assert_array_equal(np.asarray(pt1), np.asarray(pt2))

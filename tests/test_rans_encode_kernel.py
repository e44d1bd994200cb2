"""Pallas interleaved-rANS ENCODE kernel vs the numpy/C++ oracle.

Byte-identical streams are required: the decoder (host or Pallas) consumes
whatever the encoder emits, and `decompress_file` parity depends on it
(SURVEY §7 north star). Runs in interpret mode on CPU; the same kernel is
validated on real TPU hardware by scripts/tpu-validate-codec.py.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from lvae_tpu.ops.cdf import build_cdf_table, default_gaussian_scale_table
from lvae_tpu.ops.rans_interleaved import InterleavedEncoder, decode_interleaved
from lvae_tpu.ops.pallas import rans_encode as pre
from lvae_tpu.ops.pallas import rans_decode as prd


@pytest.fixture(scope='module')
def table():
    return build_cdf_table(default_gaussian_scale_table())


def _random_blocks(rng, sizes, esc_rate=0.01):
    vals, idxs = [], []
    st = np.asarray(default_gaussian_scale_table())
    for sz in sizes:
        idx = rng.integers(0, 64, sz).astype(np.int32)
        v = np.round(rng.normal(0, st[idx] * 1.5)).astype(np.int32)
        esc = rng.random(sz) < esc_rate
        v[esc] = rng.integers(-500, 500, esc.sum())
        vals.append(v)
        idxs.append(idx)
    return vals, idxs


def _kernel_encode(table, vals, idxs, N=128):
    cdfs_d, _ = prd.prepare_device_cdf(table)
    sym_rows, idx_rows, row_n = pre.blocks_to_rows(vals, idxs, N)
    inband, esc = pre.prepare_inband(jnp.asarray(sym_rows),
                                     jnp.asarray(idx_rows),
                                     table.offsets, table.cdf_lengths)
    buf, n_words, st = pre.rans_encode_all(
        inband, jnp.asarray(idx_rows), row_n, jnp.asarray(cdfs_d),
        num_lanes=N, interpret=True)
    # the kernel emits wire-packed pairs in push order; the stream is the
    # word-level reversal
    words = pre.pairs_to_words_np(buf, int(n_words))[::-1]
    states = np.asarray(st).reshape(-1).view(np.uint32)
    return words, states


@pytest.mark.parametrize('sizes,esc_rate,N', [
    ([5], 0.0, 128),
    ([300, 7, 129], 0.02, 128),
    ([1000, 999, 128, 1], 0.01, 128),
    ([256, 256], 0.0, 128),      # exact full rows
    # rate-adaptive lane counts (num_lanes='auto'): byte-identity must
    # hold at every N the auto policy can pick
    ([300, 7, 129], 0.02, 16),
    ([1000, 999, 128, 1], 0.01, 32),
    ([300, 7, 129], 0.0, 64),
])
def test_encode_kernel_matches_oracle(table, sizes, esc_rate, N):
    rng = np.random.default_rng(sum(sizes))
    vals, idxs = _random_blocks(rng, sizes, esc_rate)
    enc = InterleavedEncoder(table, N)
    for v, ix in zip(vals, idxs):
        enc.append_block(v, ix)
    st_ref, words_ref, _ = enc.finish()
    words, states = _kernel_encode(table, vals, idxs, N=N)
    assert np.array_equal(words_ref, words)
    assert np.array_equal(st_ref, states)


def test_encode_kernel_roundtrip(table):
    """Kernel-encoded stream decodes back to the values (numpy decoder)."""
    rng = np.random.default_rng(7)
    vals, idxs = _random_blocks(rng, [777, 131], esc_rate=0.03)
    enc = InterleavedEncoder(table, 128)
    for v, ix in zip(vals, idxs):
        enc.append_block(v, ix)
    _, _, escapes = enc.finish()
    words, states = _kernel_encode(table, vals, idxs)
    out = decode_interleaved(states, words, idxs, table, escapes=escapes)
    for v, o in zip(vals, out):
        assert np.array_equal(v, o)


@pytest.mark.parametrize('B,sizes,esc_rate,N', [
    (2, [300, 7, 129], 0.02, 128),
    (2, [1000, 999, 128, 1], 0.01, 128),
    (3, [256, 256], 0.0, 128),
    (2, [300, 7, 129], 0.02, 32),
])
def test_encode_kernel_multi_matches_single(table, B, sizes, esc_rate, N):
    """The B-image kernel must emit byte-identical words/states to B
    independent single-image kernel runs (and hence to the oracle):
    the state math is the same exact ops, just sublane-stacked."""
    cdfs_d, _ = prd.prepare_device_cdf(table)
    per_image = []
    for b in range(B):
        rng = np.random.default_rng(100 * b + sum(sizes))
        vals, idxs = _random_blocks(rng, sizes, esc_rate)
        sym_rows, idx_rows, row_n = pre.blocks_to_rows(vals, idxs, N)
        inband, _ = pre.prepare_inband(jnp.asarray(sym_rows),
                                       jnp.asarray(idx_rows),
                                       table.offsets, table.cdf_lengths)
        per_image.append((np.asarray(inband), idx_rows, row_n))
    row_n = per_image[0][2]
    syms_b = jnp.asarray(np.stack([p[0] for p in per_image]))
    idx_b = jnp.asarray(np.stack([p[1] for p in per_image]))
    words_b, n_b, states_b = pre.rans_encode_all_multi(
        syms_b, idx_b, row_n, jnp.asarray(cdfs_d), num_lanes=N,
        interpret=True)
    for b in range(B):
        buf1, n1, st1 = pre.rans_encode_all(
            syms_b[b], idx_b[b], row_n, jnp.asarray(cdfs_d),
            num_lanes=N, interpret=True)
        n1 = int(n1)
        assert int(n_b[b]) == n1
        assert np.array_equal(pre.pairs_to_words_np(words_b[b], n1),
                              pre.pairs_to_words_np(buf1, n1))
        assert np.array_equal(np.asarray(states_b[b]),
                              np.asarray(st1).reshape(-1))


def test_prepare_inband_escape_extraction(table):
    """prepare_inband's escape mask marks exactly the oracle's escapes."""
    rng = np.random.default_rng(3)
    vals, idxs = _random_blocks(rng, [450], esc_rate=0.05)
    enc = InterleavedEncoder(table, 128)
    enc.append_block(vals[0], idxs[0])
    _, _, escapes = enc.finish()
    _, esc = pre.prepare_inband(jnp.asarray(vals[0]), jnp.asarray(idxs[0]),
                                table.offsets, table.cdf_lengths)
    got_pos = np.nonzero(np.asarray(esc))[0]
    assert np.array_equal(got_pos, escapes[:, 0])
    assert np.array_equal(vals[0][got_pos], escapes[:, 1])

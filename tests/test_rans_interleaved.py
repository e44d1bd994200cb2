"""Tests for the N-lane interleaved rANS format + the Pallas TPU decoder
(run in interpret mode on CPU; the same kernel lowers to TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvae_tpu.ops.cdf import (build_cdf_table, default_gaussian_scale_table,
                              build_indexes_np)
from lvae_tpu.ops.rans_interleaved import InterleavedEncoder, decode_interleaved
from lvae_tpu.ops.pallas.rans_decode import (rans_decode_block, pad_rows,
                                             prepare_device_cdf)


@pytest.fixture(scope='module')
def table():
    return build_cdf_table(default_gaussian_scale_table(), 'gaussian')


def _make_blocks(rng, specs, table):
    blocks_v, blocks_i = [], []
    for nb, hi in specs:
        scales = np.exp(rng.uniform(np.log(0.05), np.log(hi), nb))
        idx = build_indexes_np(scales, table.scale_table)
        vals = np.round(rng.normal(0, scales)).astype(np.int32)
        blocks_v.append(vals)
        blocks_i.append(idx)
    return blocks_v, blocks_i


@pytest.mark.parametrize('N', [8, 128])
def test_interleaved_roundtrip_numpy(N, table):
    rng = np.random.default_rng(0)
    blocks_v, blocks_i = _make_blocks(rng, [(313, 3), (1025, 8), (64, 1.2), (7, 20)], table)
    blocks_v[1][:3] = [99999, -88888, 70000]  # escapes
    enc = InterleavedEncoder(table, num_lanes=N)
    for v, ix in zip(blocks_v, blocks_i):
        enc.append_block(v, ix)
    states, words, escapes = enc.finish()
    assert len(escapes) == 3
    dec = decode_interleaved(states, words, blocks_i, table, escapes, num_lanes=N)
    for a, b in zip(dec, blocks_v):
        assert np.array_equal(a, b)


def test_pallas_decoder_matches_encoder(table):
    N = 128
    rng = np.random.default_rng(1)
    blocks_v, blocks_i = _make_blocks(rng, [(301, 3), (517, 8), (128, 1.5)], table)
    enc = InterleavedEncoder(table, num_lanes=N)
    for v, ix in zip(blocks_v, blocks_i):
        enc.append_block(v, ix)
    states, words, escapes = enc.finish()
    assert len(escapes) == 0

    stream = np.zeros(words.size + N, np.int32)
    stream[:words.size] = words
    st = jnp.asarray(states.view(np.int32).reshape(1, N))
    ptr = jnp.int32(0)
    c_np, o_np = prepare_device_cdf(table)
    cdfs, offs = jnp.asarray(c_np), jnp.asarray(o_np)
    for vals, idx in zip(blocks_v, blocks_i):
        idx_rows = jnp.asarray(pad_rows(idx.astype(np.int32), N))
        syms, st, ptr = rans_decode_block(
            idx_rows, st, ptr, jnp.asarray(stream), cdfs, offs,
            jnp.int32(idx.size), num_lanes=N, interpret=True)
        got = np.asarray(syms).reshape(-1)[:idx.size]
        assert np.array_equal(got, vals)
    # all words consumed exactly
    assert int(ptr) == words.size


def test_pallas_decoder_escape_positions(table):
    """Escapes decode as the escape-bin value in-band; positions must be
    patchable from the side table."""
    N = 128
    rng = np.random.default_rng(2)
    blocks_v, blocks_i = _make_blocks(rng, [(260, 2)], table)
    blocks_v[0][[5, 99]] = [50000, -60000]
    enc = InterleavedEncoder(table, num_lanes=N)
    enc.append_block(blocks_v[0], blocks_i[0])
    states, words, escapes = enc.finish()
    assert len(escapes) == 2

    stream = np.zeros(words.size + N, np.int32)
    stream[:words.size] = words
    c_np, o_np = prepare_device_cdf(table)
    syms, st, ptr = rans_decode_block(
        jnp.asarray(pad_rows(blocks_i[0].astype(np.int32), N)),
        jnp.asarray(states.view(np.int32).reshape(1, N)), jnp.int32(0),
        jnp.asarray(stream), jnp.asarray(c_np), jnp.asarray(o_np),
        jnp.int32(blocks_i[0].size), num_lanes=N, interpret=True)
    got = np.asarray(syms).reshape(-1)[:blocks_i[0].size].astype(np.int64)
    for pos, val in escapes:
        got[pos] = val
    assert np.array_equal(got, blocks_v[0])

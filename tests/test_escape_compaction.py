"""Escape-compaction branch equivalence (fused_base pack_payload).

The fused encode extracts (position, value) pairs for out-of-table
symbols with one of three branches picked at RUNTIME (lax.switch):
constants (no escapes), the scatter-free chunked compaction (sparse —
all trained operating points), or the full-range scatter (dense).
Stream bytes must not depend on the branch taken, so the branches must
produce bit-identical outputs on their shared domains. Reference
scatter semantics: ascending positions of set mask bits in the first
min(n_esc, esc_cap) slots, -1 elsewhere; values at those positions,
0 elsewhere (fused_base.pack_payload _extract_esc).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvae_tpu.models.fused_base import (
    _compact_escapes_chunked, _escape_chunk_counts, _ESC_CHUNK,
    _ESC_CHUNK_CAP)


def _scatter_reference(mask, values, esc_cap):
    pos = np.nonzero(mask)[0].astype(np.int32)[:esc_cap]
    esc_pos = np.full(esc_cap, -1, np.int32)
    esc_pos[:pos.size] = pos
    esc_val = np.zeros(esc_cap, np.int32)
    esc_val[:pos.size] = values[pos]
    return esc_pos, esc_val


def _case(rng, S, n_esc, esc_cap, place=None):
    mask = np.zeros(S, bool)
    if place is None:
        place = rng.choice(S, size=n_esc, replace=False)
    mask[np.asarray(place, int)] = True
    values = rng.integers(-1000, 1000, S).astype(np.int32)
    return mask, values


@pytest.mark.parametrize('S,n_esc,esc_cap', [
    (617_472, 0, 8192),        # flagship symbol count, no escapes
    (617_472, 123, 8192),      # the trained qarv_base operating point
    (4_000, 37, 64),           # tiny cap
    (1024, 5, 32),             # exactly one chunk
    (1000, 3, 16),             # padded final chunk
])
def test_chunked_matches_scatter(S, n_esc, esc_cap):
    rng = np.random.default_rng(S + n_esc)
    mask, values = _case(rng, S, n_esc, esc_cap)
    assert _escape_chunk_counts(
        jnp.asarray(mask, jnp.int32)).max() <= _ESC_CHUNK_CAP
    got_p, got_v = jax.jit(
        lambda m, v: _compact_escapes_chunked(m, v, esc_cap))(
            jnp.asarray(mask), jnp.asarray(values))
    want_p, want_v = _scatter_reference(mask, values, esc_cap)
    np.testing.assert_array_equal(np.asarray(got_p), want_p)
    np.testing.assert_array_equal(np.asarray(got_v), want_v)


def test_chunk_boundaries_and_full_chunks():
    """Escapes packed to the chunk-cap limit at chunk edges: first/last
    slot of a chunk, chunk_cap consecutive escapes straddling a boundary,
    a maximally-full chunk, and a zero-escape chunk between two full ones
    (exercises the shared-base tie-break in the slot->chunk inversion)."""
    rng = np.random.default_rng(7)
    S, esc_cap = 5 * _ESC_CHUNK, 256
    place = np.concatenate([
        np.arange(_ESC_CHUNK_CAP // 2),                          # chunk 0 head
        _ESC_CHUNK - np.arange(1, _ESC_CHUNK_CAP // 2 + 1),      # chunk 0 tail
        _ESC_CHUNK + np.arange(_ESC_CHUNK_CAP // 2),             # chunk 1 head
        # chunk 2 empty
        3 * _ESC_CHUNK + rng.choice(_ESC_CHUNK, _ESC_CHUNK_CAP,
                                    replace=False),              # chunk 3 full
        np.asarray([5 * _ESC_CHUNK - 1]),                        # last symbol
    ])
    place = np.unique(place)
    cnts = np.bincount(place // _ESC_CHUNK, minlength=5)
    assert cnts.max() <= _ESC_CHUNK_CAP and cnts[2] == 0
    assert cnts[0] == _ESC_CHUNK_CAP and cnts[3] == _ESC_CHUNK_CAP
    mask, values = _case(rng, S, None, esc_cap, place=place)
    got_p, got_v = _compact_escapes_chunked(
        jnp.asarray(mask), jnp.asarray(values), esc_cap)
    want_p, want_v = _scatter_reference(mask, values, esc_cap)
    np.testing.assert_array_equal(np.asarray(got_p), want_p)
    np.testing.assert_array_equal(np.asarray(got_v), want_v)


def test_overflow_keeps_first_cap_escapes():
    """n_esc > esc_cap (host raises later, but the device outputs must
    still match the scatter branch: first esc_cap escapes kept)."""
    rng = np.random.default_rng(11)
    S, esc_cap = 8 * _ESC_CHUNK, 32
    place = np.arange(3 * esc_cap) * (S // (3 * esc_cap))  # ~12 per chunk
    mask, values = _case(rng, S, None, esc_cap, place=place)
    assert _escape_chunk_counts(
        jnp.asarray(mask, jnp.int32)).max() <= _ESC_CHUNK_CAP
    got_p, got_v = _compact_escapes_chunked(
        jnp.asarray(mask), jnp.asarray(values), esc_cap)
    want_p, want_v = _scatter_reference(mask, values, esc_cap)
    np.testing.assert_array_equal(np.asarray(got_p), want_p)
    np.testing.assert_array_equal(np.asarray(got_v), want_v)


def test_vmapped_batch_matches_per_image():
    rng = np.random.default_rng(3)
    B, S, esc_cap = 3, 16 * _ESC_CHUNK, 64
    masks, vals = zip(*[_case(rng, S, k, esc_cap) for k in (0, 9, 40)])
    assert max(_escape_chunk_counts(jnp.asarray(np.stack(masks),
                                                jnp.int32)).max(),
               0) <= _ESC_CHUNK_CAP
    masks = np.stack(masks)
    vals = np.stack(vals)
    got_p, got_v = jax.vmap(
        lambda m, v: _compact_escapes_chunked(m, v, esc_cap))(
            jnp.asarray(masks), jnp.asarray(vals))
    for b in range(B):
        want_p, want_v = _scatter_reference(masks[b], vals[b], esc_cap)
        np.testing.assert_array_equal(np.asarray(got_p[b]), want_p)
        np.testing.assert_array_equal(np.asarray(got_v[b]), want_v)

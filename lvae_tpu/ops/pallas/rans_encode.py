"""Pallas TPU kernel: N-lane interleaved rANS ENCODE.

Produces streams byte-identical to ops/rans_interleaved.InterleavedEncoder /
ops/crans interleaved_encode, entirely on device — encode-side symbols never
cross the device->host link (SURVEY §7 north star; replaces the reference's
CPU-resident compressai coder, reference qarv/model.py:104-113).

Construction (mirrors the decode kernel in rans_decode.py):
  * rows of N symbols processed in REVERSE row order (rANS encodes backwards)
  * (start, freq) per symbol are gathered IN-KERNEL from the byte-split
    CDF tables with lane-oriented one-hot MXU dots (the decode kernel's
    construction): the XLA gather that previously hoisted them out cost
    ~6.3 ms/image at ~10 ns/element (xplane r4), while the round-1
    in-kernel version was only slow because it ran in the pre-r3 (N,1)
    orientation
  * renorm flag = (state >> 16) >= freq; flagged lanes emit their low 16 bits
  * word placement: the scalar encoder pushes words lane-DESCENDING within a
    reversed row and finally reverses the whole list. The kernel writes in
    PUSH order — forward from position 0, lane-descending within each
    reversed row — so the final stream is REVERSE(buf[:n_words]); the host
    (or any consumer) does the cheap contiguous flip. (A device-side flip
    would be a dynamic-length gather — slow on TPU.)
  * scatter = two-stage one-hot matmuls into an aligned 2048-word window
    (positions are unique, the window is previously untouched -> add works)
  * 32-bit state / 16-bit freq division with exact f32 arithmetic: base-256
    long division, every intermediate < 2^24 (f32-exact; quotient floor is
    provably safe: the 0.5-ulp division error is < the 1/freq gap to the
    next integer)

Escapes are handled OUTSIDE the kernel (plain vectorized JAX): out-of-range
values are clipped to the escape bin before the kernel, and their (position,
value) pairs are extracted with a fixed-capacity jnp.nonzero.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK16 = (1 << 16) - 1


def _srl(x, n):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def _exact_divmod_u32(st, freq):
    """(st // freq, st % freq) for uint32 bit patterns in int32, freq in
    [1, 2^16]. Base-256 long division: all intermediates < 2^24, computed in
    f32 where division+floor is exact-safe (see module docstring)."""
    freq_f = freq.astype(jnp.float32)
    acc = jnp.zeros_like(st)
    q = jnp.zeros_like(st)
    for shift in (24, 16, 8, 0):
        digit = _srl(st, shift) & 255
        acc = acc * 256 + digit                          # < freq * 256 <= 2^24
        qd = jnp.floor(acc.astype(jnp.float32) / freq_f).astype(jnp.int32)
        r = acc - qd * freq
        # TPU f32 division is reciprocal-based (not correctly rounded):
        # correct a possible +/-1 quotient error with exact integer checks
        qd = qd + (r >= freq).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        acc = acc - qd * freq
        q = q * 256 + qd
    return q, acc


_KROWS = 8  # rows per loop iteration (8*128 emitted words fit one window)


def _encode_kernel(end_in_ref, row_n_ref,                # scalar prefetch (SMEM)
                   states_in_ref, ps_ref, cdf_lo_ref, cdf_hi_ref,
                   words_ref, states_out_ref, end_out_ref,
                   *, N, T, S, L):
    # (start, freq) per symbol are gathered IN-KERNEL from the byte-split
    # CDF tables with the decode kernel's lane-oriented one-hot MXU dots
    # ((L,S)@(S,N) + two (L,N) selects per sub-row, exact int math).
    # History: round 1 did in-kernel gathers in the old (N,1) orientation
    # and they dominated the kernel; round 3 hoisted them into one XLA
    # gather, but that gather itself cost ~6.3 ms/image at ~10 ns/element
    # (r4 trace, %fusion.1) — the LANE-oriented in-kernel gather (the
    # decode kernel runs the same dots for the same row count inside a
    # ~2 ms loop) beats both. (index, symbol) arrive packed in one int32
    # ref (idx | sym<<16), so per-image VMEM is unchanged.
    #
    # Round-3 rework, two layout facts about TPU (8,128) tiling:
    #   * the per-lane state chain (divmod is ~45 vector ops/row) runs in
    #     (1,N) orientation — one tile per op. The previous (N,1) layout
    #     used 1 of 128 lanes across 16 sublane-tiles (16x the work) and
    #     dominated the kernel's runtime.
    #   * rows are processed K=8 per loop iteration: the scatter windows of
    #     the 8 sub-rows are accumulated in f32 registers (positions are
    #     unique across the batch, each window cell receives <= one byte
    #     value, so f32 adds are exact) and flushed with ONE 2048-word
    #     read-modify-write. local_start < 1024 and the batch emits at most
    #     8*128 = 1024 words, so every target stays inside the window.
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)         # (1,N)
    crow16 = jax.lax.broadcasted_iota(jnp.int32, (16, N), 0)          # (16,N)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)           # (N,128)
    # rank among flagged lanes, lane-DESCENDING (= scalar push order within
    # a reversed row): rank_l = sum_{j>l} flags_j = (flags @ M), M[j,l]=[j>l]
    tri_desc = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) >
                jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)).astype(jnp.float32)
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0)             # (S,N)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (L, N), 0)             # (L,N)
    cdf_lo_t = cdf_lo_ref[:].astype(jnp.float32)                      # (L,S)
    cdf_hi_t = cdf_hi_ref[:].astype(jnp.float32)

    def gather_sf(ps):
        """(1,N) packed idx|sym<<16 -> (start, freq), exact (decode-kernel
        byte-split one-hot construction)."""
        idx = ps & MASK16
        sym = _srl(ps, 16)
        onehot_s = (srow == idx).astype(jnp.float32)                  # (S,N)
        rows_lo = jnp.dot(cdf_lo_t, onehot_s,
                          preferred_element_type=jnp.float32)         # (L,N)
        rows_hi = jnp.dot(cdf_hi_t, onehot_s,
                          preferred_element_type=jnp.float32)
        rows = rows_hi.astype(jnp.int32) * 256 + rows_lo.astype(jnp.int32)
        start = jnp.sum(jnp.where(lrow == sym, rows, 0), axis=0,
                        keepdims=True)                                # (1,N)
        nxt = jnp.sum(jnp.where(lrow == (sym + 1), rows, 0), axis=0,
                      keepdims=True)
        return start, nxt - start

    TB = (T + _KROWS - 1) // _KROWS

    def body(i, carry):
        states, ptr = carry                                            # (1,N)
        # ptr counts WORDS; the buffer holds PAIRS (word 2j | word 2j+1<<16
        # in one int32 — the exact wire packing, so no XLA-side strided
        # re-pack is ever needed). The window is 2048 pairs = 4096 words;
        # pbase is in pair units, 1024-pair-aligned (Mosaic 1-D slices).
        # The clamp keeps overflow past a caller-supplied w_cap
        # well-defined: extra words pile into the final window (garbage),
        # but the word COUNT stays exact, so the host detects the
        # overflow from n_words and raises.
        pcap = words_ref.shape[0]
        pbase = pl.multiple_of(
            jnp.minimum((ptr // 2048) * 1024, pcap - 2048), 1024)
        local = ptr - 2 * pbase                       # word offset in window
        add_b = [jnp.zeros((16, 128), jnp.float32) for _ in range(4)]
        c_total = jnp.int32(0)

        for k in range(_KROWS):                           # unrolled sub-rows
            t = T - 1 - (i * _KROWS + k)                               # reverse
            tt = jnp.maximum(t, 0)
            active = jnp.logical_and(lane_row < row_n_ref[tt], t >= 0)  # (1,N)
            start, freq = gather_sf(ps_ref[tt, :].reshape(1, N))
            freq = jnp.where(active, freq, 1)  # keep inactive lanes benign

            st = states
            flags = jnp.logical_and(_srl(st, 16) >= freq, active)
            flags_f = flags.astype(jnp.float32)
            c = jnp.sum(flags.astype(jnp.int32))

            rank = jnp.dot(flags_f, tri_desc,
                           preferred_element_type=jnp.float32).astype(jnp.int32)
            target = local + rank                    # (1,N) word position
            word = jnp.where(flags, st & MASK16, 0)                    # (1,N)
            pair = _srl(target, 1)                   # pair index in window
            parity = target & 1                      # lo/hi half of the pair
            # chunk selector (16,N): the pair's 128-pair chunk in the window
            sel_c_f = (pair // 128 == crow16).astype(jnp.float32) * flags_f
            within_c = (pair - (pair // 128) * 128).reshape(N, 1)
            in_f = (within_c == wcol).astype(jnp.float32)              # (N,128)
            # four byte planes: parity picks bytes 0/1 vs 2/3 of the pair.
            # each plane value <= 255, every (pair, byte) written at most
            # once across the whole stream, so the f32 one-hot dots and the
            # cross-batch RMW adds are exact.
            par_f = parity.astype(jnp.float32).reshape(N, 1)
            lo_f = (word & 255).astype(jnp.float32).reshape(N, 1)
            hi_f = _srl(word, 8).astype(jnp.float32).reshape(N, 1)
            planes = (lo_f * (1.0 - par_f), hi_f * (1.0 - par_f),
                      lo_f * par_f, hi_f * par_f)
            for j in range(4):
                add_b[j] = add_b[j] + jnp.dot(
                    sel_c_f, in_f * planes[j],
                    preferred_element_type=jnp.float32)

            st = jnp.where(flags, _srl(st, 16), st)
            q, r = _exact_divmod_u32(st, freq)
            new_st = (q << 16) | (r + start)
            states = jnp.where(active, new_st, states)
            local = local + c
            c_total = c_total + c

        @pl.when(c_total > 0)   # batches with no renorm skip the RMW
        def write_words():
            add = (add_b[0].astype(jnp.int32)
                   | (add_b[1].astype(jnp.int32) << 8)
                   | (add_b[2].astype(jnp.int32) << 16)
                   | (add_b[3].astype(jnp.int32) << 24))
            cur = words_ref[pl.ds(pbase, 2048)].reshape(16, 128)
            words_ref[pl.ds(pbase, 2048)] = (cur + add).reshape(2048)

        return states, ptr + c_total

    # zero the word buffer: the scatter is add-based (each position written
    # exactly once, but on top of whatever was in the uninitialized output)
    W_cap = words_ref.shape[0]

    def zero_chunk(i, _):
        words_ref[pl.ds(pl.multiple_of(i * 2048, 1024), 2048)] = \
            jnp.zeros((2048,), jnp.int32)
        return 0
    jax.lax.fori_loop(0, W_cap // 2048, zero_chunk, 0)

    states0 = states_in_ref[:].reshape(1, N)
    states, ptr = jax.lax.fori_loop(0, TB, body, (states0, jnp.int32(0)))
    states_out_ref[:] = states.reshape(states_out_ref.shape)
    end_out_ref[0] = ptr


@functools.partial(jax.jit, static_argnames=('num_lanes', 'w_cap', 'interpret'))
def rans_encode_all(syms, indexes, row_n, cdfs, num_lanes=128,
                    w_cap=None, interpret=False):
    """Encode ALL of an image's symbol rows (all latent blocks concatenated,
    each block starting on a fresh row — per-block lane restart) on device.

    Args:
        syms:    (T, N) int32 in-band symbols (offset-subtracted, escape bin
                 already substituted for out-of-range values)
        indexes: (T, N) int32 scale indexes
        row_n:   (T,) int32 active lanes per row (N except at block tails)
        cdfs:    (S, L) int32 sentinel-padded CDF rows (prepare_device_cdf)
    Returns:
        (pair_buf (P,) int32 — pair j = word 2j | word 2j+1 << 16, i.e. the
         WIRE packing (u16 little-endian view = push-order words; the
         stream is the word-level reversal, done by the host after the
         pull), n_words int32 (in 16-bit words), states (1, N) int32 —
         the decoder's initial states)
    """
    T, N = syms.shape
    S, L = cdfs.shape
    assert N == num_lanes
    # the K-row batch flushes ONE 2048-pair window per batch; a batch may
    # emit up to local0 (<2048) + K*N words, so lane counts past 128 would
    # silently drop words past the window
    assert _KROWS * N <= 1024, f'num_lanes {N} > {1024 // _KROWS} unsupported'
    if w_cap is None:
        w_cap = T * N  # worst case: one word per symbol
    W_cap = pair_capacity(w_cap)
    states0 = jnp.full((1, N), 1 << 16, jnp.int32)

    # (index, symbol) packed into one int32 ref; (start, freq) are gathered
    # IN-KERNEL from the byte-split CDF tables (see _encode_kernel — the
    # out-of-kernel XLA gather this replaces cost ~6.3 ms/image at
    # ~10 ns/element). freq <= 65535 is guaranteed by the CDF builder
    # (every in-band bin has mass >= 1 and the total is 2^16 over >= 2
    # bins); in-band symbols satisfy sym + 1 < cdf_length, so the
    # sentinel-padded tail is never selected on active lanes.
    ps = indexes | (syms << 16)                                       # (T,N)
    cdf_lo = (cdfs & 255).T                                           # (L,S)
    cdf_hi = _srl(cdfs, 8).T

    kernel = functools.partial(_encode_kernel, N=N, T=T, S=S, L=L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # words buffer
            pl.BlockSpec(memory_space=pltpu.VMEM),   # states out
            pl.BlockSpec(memory_space=pltpu.SMEM),   # end out
        ],
    )
    words, states, end = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((W_cap,), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray([0], jnp.int32), jnp.asarray(row_n, jnp.int32),
      states0, ps, cdf_lo, cdf_hi)
    return words, end[0], states


def _encode_kernel_multi(end_in_ref, row_n_ref,           # scalar prefetch
                         states_in_ref, *refs, N, T, B, W_cap, S, L):
    """B-image variant of _encode_kernel: the per-lane state chains of B
    same-shape images are independent, so ALL the state math (renorm
    flags, the ~45-op exact divmod, state updates) runs stacked as (B,N)
    on the VPU's sublane dimension — one instruction stream drives B
    images (the single-image kernel uses 1 of 8 sublanes per op). Only
    the word scatters are inherently per-image: each image keeps its own
    2048-word window into its region of ONE 1-D word buffer (per-image
    region at b*W_cap — 2-D refs would make the window slice a minor-dim
    dynamic slice, which TPU tiling does not support; 1-D slices stay
    1024-aligned). (index|symbol<<16) arrive packed in one int32 ref per
    image; (start, freq) are gathered in-kernel from the shared byte-split
    CDF tables (see _encode_kernel — same VMEM budget as the former
    packed-sf refs). Word/state outputs are byte-identical to B runs of
    _encode_kernel: every arithmetic op per image is the same exact
    int32/f32 op."""
    ps_refs = refs[:B]
    cdf_lo_ref, cdf_hi_ref = refs[B], refs[B + 1]
    words_ref, states_out_ref, end_out_ref = refs[B + 2:]

    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)         # (1,N)
    crow16 = jax.lax.broadcasted_iota(jnp.int32, (16, N), 0)          # (16,N)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)           # (N,128)
    tri_desc = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) >
                jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)).astype(jnp.float32)
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0)             # (S,N)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (L, N), 0)             # (L,N)
    cdf_lo_t = cdf_lo_ref[:].astype(jnp.float32)                      # (L,S)
    cdf_hi_t = cdf_hi_ref[:].astype(jnp.float32)

    def gather_sf(ps):
        idx = ps & MASK16
        sym = _srl(ps, 16)
        onehot_s = (srow == idx).astype(jnp.float32)                  # (S,N)
        rows_lo = jnp.dot(cdf_lo_t, onehot_s,
                          preferred_element_type=jnp.float32)         # (L,N)
        rows_hi = jnp.dot(cdf_hi_t, onehot_s,
                          preferred_element_type=jnp.float32)
        rows = rows_hi.astype(jnp.int32) * 256 + rows_lo.astype(jnp.int32)
        start = jnp.sum(jnp.where(lrow == sym, rows, 0), axis=0,
                        keepdims=True)
        nxt = jnp.sum(jnp.where(lrow == (sym + 1), rows, 0), axis=0,
                      keepdims=True)
        return start, nxt - start

    TB = (T + _KROWS - 1) // _KROWS

    def body(i, carry):
        states = carry[0]                                              # (B,N)
        ptrs = list(carry[1:])                             # B scalars (WORDS)
        # pair-unit windows (2048 pairs = 4096 words), 1024-pair-aligned —
        # see _encode_kernel: the buffer holds the exact wire packing
        # (clamped so w_cap overflow stays in-bounds; count stays exact)
        pbases = [pl.multiple_of(
            jnp.minimum((p // 2048) * 1024, W_cap - 2048), 1024)
            for p in ptrs]
        locs = [p - 2 * pb for p, pb in zip(ptrs, pbases)]
        add_b = [[jnp.zeros((16, 128), jnp.float32) for _ in range(4)]
                 for _ in range(B)]
        c_tot = [jnp.int32(0) for _ in range(B)]

        for k in range(_KROWS):                           # unrolled sub-rows
            t = T - 1 - (i * _KROWS + k)                               # reverse
            tt = jnp.maximum(t, 0)
            active = jnp.logical_and(lane_row < row_n_ref[tt], t >= 0)  # (1,N)
            sf_b = [gather_sf(ps_refs[b][tt, :].reshape(1, N))
                    for b in range(B)]
            start = jnp.concatenate([s for s, _ in sf_b], axis=0)      # (B,N)
            freq = jnp.concatenate([f for _, f in sf_b], axis=0)
            freq = jnp.where(active, freq, 1)

            st = states
            flags = jnp.logical_and(_srl(st, 16) >= freq, active)      # (B,N)
            flags_f = flags.astype(jnp.float32)
            flags_i = flags.astype(jnp.int32)
            rank = jnp.dot(flags_f, tri_desc,
                           preferred_element_type=jnp.float32).astype(jnp.int32)
            word = jnp.where(flags, st & MASK16, 0)                    # (B,N)

            for b in range(B):                        # per-image word scatter
                c_b = jnp.sum(flags_i[b:b + 1, :])
                target = locs[b] + rank[b:b + 1, :]      # (1,N) word position
                pair = _srl(target, 1)
                parity = target & 1
                sel_c_f = ((pair // 128 == crow16).astype(jnp.float32) *
                           flags_f[b:b + 1, :])                        # (16,N)
                within_c = (pair - (pair // 128) * 128).reshape(N, 1)
                in_f = (within_c == wcol).astype(jnp.float32)          # (N,128)
                par_f = parity.astype(jnp.float32).reshape(N, 1)
                lo_f = (word[b:b + 1, :] & 255).astype(
                    jnp.float32).reshape(N, 1)
                hi_f = _srl(word[b:b + 1, :], 8).astype(
                    jnp.float32).reshape(N, 1)
                planes = (lo_f * (1.0 - par_f), hi_f * (1.0 - par_f),
                          lo_f * par_f, hi_f * par_f)
                for j in range(4):
                    add_b[b][j] = add_b[b][j] + jnp.dot(
                        sel_c_f, in_f * planes[j],
                        preferred_element_type=jnp.float32)
                locs[b] = locs[b] + c_b
                c_tot[b] = c_tot[b] + c_b

            st = jnp.where(flags, _srl(st, 16), st)
            q, r = _exact_divmod_u32(st, freq)         # (B,N) — shared chain
            new_st = (q << 16) | (r + start)
            states = jnp.where(active, new_st, states)

        for b in range(B):
            @pl.when(c_tot[b] > 0)
            def write_words(b=b):
                add = (add_b[b][0].astype(jnp.int32)
                       | (add_b[b][1].astype(jnp.int32) << 8)
                       | (add_b[b][2].astype(jnp.int32) << 16)
                       | (add_b[b][3].astype(jnp.int32) << 24))
                off = b * W_cap + pbases[b]
                cur = words_ref[pl.ds(off, 2048)].reshape(16, 128)
                words_ref[pl.ds(off, 2048)] = (cur + add).reshape(2048)

        return (states,) + tuple(p + c for p, c in zip(ptrs, c_tot))

    def zero_chunk(i, _):
        words_ref[pl.ds(pl.multiple_of(i * 2048, 1024), 2048)] = \
            jnp.zeros((2048,), jnp.int32)
        return 0
    jax.lax.fori_loop(0, (B * W_cap) // 2048, zero_chunk, 0)

    states0 = states_in_ref[:].reshape(B, N)
    out = jax.lax.fori_loop(0, TB, body,
                            (states0,) + (jnp.int32(0),) * B)
    states_out_ref[:] = out[0].reshape(states_out_ref.shape)
    for b in range(B):
        end_out_ref[b] = out[1 + b]


@functools.partial(jax.jit, static_argnames=('num_lanes', 'w_cap', 'interpret'))
def rans_encode_all_multi(syms, indexes, row_n, cdfs, num_lanes=128,
                          w_cap=None, interpret=False):
    """Encode B same-layout images' symbol rows in ONE kernel pass (see
    _encode_kernel_multi). Streams are byte-identical to B independent
    rans_encode_all calls (tests/test_rans_encode_kernel.py).

    Args:
        syms:    (B, T, N) int32 in-band symbols (per image, same row
                 layout: the batch codec guarantees same image shape)
        indexes: (B, T, N) int32 scale indexes
        row_n:   (T,) int32 active lanes per row (shared across images)
        cdfs:    (S, L) int32 sentinel-padded CDF rows
    Returns:
        (pair_buf (B, P) int32 — image b's pairs, wire packing (see
         rans_encode_all), n_words (B,) int32, states (B, N) int32)
    VMEM note: per image, the packed (index|symbol) table + pair region
    cost 1.5 * T * N * 4 bytes; the grouping budget lives in
    fused_base.pack_payload_batch.
    """
    B, T, N = syms.shape
    S, L = cdfs.shape
    assert N == num_lanes
    assert _KROWS * N <= 1024, f'num_lanes {N} > {1024 // _KROWS} unsupported'
    if w_cap is None:
        w_cap = T * N
    W_cap = pair_capacity(w_cap)
    states0 = jnp.full((B, N), 1 << 16, jnp.int32)

    ps = indexes | (syms << 16)                                     # (B,T,N)
    cdf_lo = (cdfs & 255).T                                         # (L,S)
    cdf_hi = _srl(cdfs, 8).T

    kernel = functools.partial(_encode_kernel_multi, N=N, T=T, B=B,
                               W_cap=W_cap, S=S, L=L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + B),
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # words buffer (B*W,)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # states out
            pl.BlockSpec(memory_space=pltpu.SMEM),   # end out (B,)
        ],
    )
    words, states, end = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * W_cap,), jnp.int32),
            jax.ShapeDtypeStruct((B, N), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray([0], jnp.int32), jnp.asarray(row_n, jnp.int32),
      states0, *[ps[b] for b in range(B)], cdf_lo, cdf_hi)
    return words.reshape(B, W_cap), end, states


def pair_capacity(w_cap):
    """Pair-buffer length (int32 elements) a kernel allocates for a word
    capacity of `w_cap` 16-bit words — the single source of truth shared
    with fused_base's VMEM grouping estimate. Includes the 1024-aligned
    write window's +2048 overhang pad."""
    return (((w_cap + 1) // 2 + 2047) // 2048) * 2048 + 2048


def pairs_to_words_np(pair_buf, n_words):
    """Host-side view of a kernel pair buffer as push-order 16-bit words.

    pair j = word 2j | word 2j+1 << 16 (little-endian u16 view), which is
    also the wire packing — the stream is the word-level reversal."""
    return np.ascontiguousarray(
        np.asarray(pair_buf, dtype='<i4')).view('<u2')[:int(n_words)]


def blocks_to_rows(values_per_block, indexes_per_block, N):
    """Host-side helper (oracle/tests): lay out per-block flat symbol arrays
    as (T, N) rows with per-block lane restart, returning
    (syms_rows, idx_rows, row_n). Escape substitution is NOT done here."""
    sym_rows, idx_rows, row_ns = [], [], []
    for v, ix in zip(values_per_block, indexes_per_block):
        v = np.asarray(v, np.int32).ravel()
        ix = np.asarray(ix, np.int32).ravel()
        Tb = max((v.size + N - 1) // N, 1)
        sv = np.zeros(Tb * N, np.int32)
        si = np.zeros(Tb * N, np.int32)
        sv[:v.size] = v
        si[:ix.size] = ix
        rn = np.full(Tb, N, np.int32)
        rn[-1] = v.size - (Tb - 1) * N if v.size else 0
        sym_rows.append(sv.reshape(Tb, N))
        idx_rows.append(si.reshape(Tb, N))
        row_ns.append(rn)
    return (np.concatenate(sym_rows), np.concatenate(idx_rows),
            np.concatenate(row_ns))


def prepare_inband(values, indexes, offsets, lengths):
    """Vectorized escape handling (outside the kernel): returns
    (inband_sym, esc_mask) where inband_sym = clip-to-escape-bin symbol
    (already offset-subtracted).

    The per-symbol (offset, length) lookup is an UNROLLED
    select-accumulate over the static (<=192-entry) table rather than a
    jnp.take: XLA gathers run ~10 ns/element on TPU, so the single packed
    gather cost ~6 ms for a 617k-symbol qarv_base image — the largest
    single op in the encode envelope (runs/fused-attrib-r5.txt
    %cond.186) — while the 64-192 fused compare-selects are VPU
    elementwise and effectively free (same lesson as
    entropy_coding.build_indexes, round 3). offsets/lengths must be
    trace-time constants (numpy or concrete arrays) for the unroll."""
    off_np = np.asarray(offsets).astype(np.int64)
    len_np = np.asarray(lengths).astype(np.int64)
    # offsets < 2^15 (checked in FusedCodecBase._check_table) and lengths
    # < 2^15, so the packed value always fits a non-negative int32
    packed_np = (off_np + (1 << 15)) | (len_np << 16)
    assert packed_np.max() < (1 << 31)
    p = jnp.zeros(indexes.shape, jnp.int32)
    for i, v in enumerate(packed_np.tolist()):
        p = p + jnp.where(indexes == i, jnp.int32(v), 0)
    off = (p & MASK16) - (1 << 15)
    max_sym = _srl(p, 16) - 2
    sym = values - off
    esc = (sym < 0) | (sym >= max_sym)
    return jnp.where(esc, max_sym, sym), esc

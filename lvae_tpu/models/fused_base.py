"""Shared machinery for the single-program (fused) codecs.

Each model family subclasses FusedCodecBase with its own _build_codec chain
builder; the payload layout, adaptive single-pull logic, and stream parsing
are family-independent. See qarv/fused.py for the design rationale (ONE
compiled executable serving encode, selfcheck-encode AND decode via a
runtime mode operand — the bit-exactness discipline), and for the wire
format.
"""
import struct

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.ops.pallas import rans_decode as prd
from lvae_tpu.models import common
from lvae_tpu.utils import coding

_ob = jax.lax.optimization_barrier


def cast_tree(params, dtype):
    if dtype is None:
        return params
    dt = jnp.dtype(dtype)
    return jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, params)


# escape compaction, sparse path: chunk geometry. Any stream whose every
# `_ESC_CHUNK`-symbol slice carries <= `_ESC_CHUNK_CAP` escapes takes the
# scatter-free branch below (trained operating points: ~100 escapes over
# ~600 chunks). Denser streams (random-init stress: ~1 escape per 6
# symbols) fall back to the full scatter.
_ESC_CHUNK = 1024
_ESC_CHUNK_CAP = 16


def _escape_chunk_counts(mask_i, chunk=_ESC_CHUNK):
    """Per-chunk escape counts (..., C) for a (..., S) int mask."""
    S = mask_i.shape[-1]
    C = -(-S // chunk)
    pad = [(0, 0)] * (mask_i.ndim - 1) + [(0, C * chunk - S)]
    return jnp.pad(mask_i, pad).reshape(*mask_i.shape[:-1], C, chunk).sum(-1)


def _compact_escapes_chunked(esc_mask, values, esc_cap, chunk=_ESC_CHUNK,
                             chunk_cap=_ESC_CHUNK_CAP):
    """Scatter-free escape compaction, exact equal to the scatter branch
    whenever every `chunk`-symbol slice holds <= `chunk_cap` escapes (the
    caller's branch predicate; see pack_payload).

    The scatter `.at[slot].set(pos, mode='drop')` over the full symbol
    range cost ~5.9 ms/image on v5e even for ~100 live escapes
    (runs/suite2-r5.json attrib_enc %cond.92 + %fusion.10) because the
    update count is the SYMBOL count, not the escape count. Here the
    j-th escape of each chunk is found with a masked min/sum reduction
    (chunk_cap elementwise passes, VPU-cheap), and the global slot ->
    (chunk, j) inversion is a broadcast-compare over the (esc_cap, C)
    prefix table plus two tiny gathers — same no-gather/no-scatter
    lesson as entropy_coding.build_indexes (round 3)."""
    S = esc_mask.shape[0]
    C = -(-S // chunk)
    pad = C * chunk - S
    m2 = jnp.pad(esc_mask, (0, pad)).reshape(C, chunk)
    v2 = jnp.pad(values, (0, pad)).reshape(C, chunk)
    rank = jnp.cumsum(m2.astype(jnp.int32), axis=1)   # 1-based at set bits
    gpos = (jnp.arange(C, dtype=jnp.int32)[:, None] * chunk
            + jax.lax.broadcasted_iota(jnp.int32, (C, chunk), 1))
    big = jnp.int32(1 << 30)
    cp, cv = [], []
    for j in range(chunk_cap):
        sel = m2 & (rank == (j + 1))                  # <=1 hit per chunk row
        cp.append(jnp.min(jnp.where(sel, gpos, big), axis=1))
        cv.append(jnp.sum(jnp.where(sel, v2, 0), axis=1))
    cpos = jnp.stack(cp, axis=1)                      # (C, chunk_cap)
    cval = jnp.stack(cv, axis=1)
    cnt = rank[:, -1]                                 # (C,)
    base = jnp.cumsum(cnt) - cnt                      # exclusive prefix
    n_esc = jnp.sum(cnt)
    s_iota = jnp.arange(esc_cap, dtype=jnp.int32)
    # owner chunk of global slot s: the LAST chunk with base <= s (chunks
    # with zero escapes share base with their successor and lose the tie)
    c_of_s = jnp.sum((base[None, :] <= s_iota[:, None]).astype(jnp.int32),
                     axis=1) - 1
    j_of_s = jnp.clip(s_iota - base[c_of_s], 0, chunk_cap - 1)
    valid = s_iota < jnp.minimum(n_esc, esc_cap)
    esc_pos = jnp.where(valid, cpos[c_of_s, j_of_s], -1)
    esc_val = jnp.where(valid, cval[c_of_s, j_of_s], 0)
    return esc_pos, esc_val


class FusedCodecBase:
    #: subclasses that implement the portable (cross-executable
    #: bitwise-deterministic) trunk set this True
    supports_portable = False

    def __init__(self, net, cdf_table, num_lanes=128, esc_cap=8192,
                 compute_dtype=None, interpret=False, head_cdf_table=None,
                 portable=False, max_program_batch=None, word_cap=None):
        if portable and not self.supports_portable:
            raise NotImplementedError(
                f'{type(self).__name__} has no portable trunk yet')
        self.portable = bool(portable)
        # serving batches larger than this run as balanced chunks through
        # smaller per-chunk executables (see _chunk_sizes): the B=8 binary
        # cliffs ~2x per image vs B<=6 on v5e (runs/suite13-r3.json), so a
        # B=8 request is better served as two pipelined B=4 programs
        self.max_program_batch = max_program_batch
        self.net = net
        self.table = cdf_table
        cdfs_np, offs_np = prd.prepare_device_cdf(cdf_table)
        self.cdfs = jnp.asarray(cdfs_np)
        self.offsets_np = cdf_table.offsets.astype(np.int32)
        self.lengths_np = cdf_table.cdf_lengths.astype(np.int32)
        self._check_table(cdf_table)
        # encode-side tables: the encode kernel's hoisted gathers take ONE
        # table for all symbols, so a lossless pixel head's table is
        # CONCATENATED after the latent-block rows (head indexes biased by
        # head_index_base on the encode side only; the decode kernel gets
        # the separate per-block table + unbiased indexes, keeping its
        # one-hot matmuls at the block table's width)
        if head_cdf_table is not None:
            self._check_table(head_cdf_table)
            h_np, _ = prd.prepare_device_cdf(head_cdf_table)
            L = max(cdfs_np.shape[1], h_np.shape[1])

            def pad_l(a):
                return np.pad(a, ((0, 0), (0, L - a.shape[1])),
                              constant_values=prd._SENTINEL)
            self.head_index_base = cdfs_np.shape[0]
            self.enc_cdfs = jnp.asarray(
                np.concatenate([pad_l(cdfs_np), pad_l(h_np)], axis=0))
            self.enc_offsets_np = np.concatenate(
                [self.offsets_np, head_cdf_table.offsets.astype(np.int32)])
            self.enc_lengths_np = np.concatenate(
                [self.lengths_np,
                 head_cdf_table.cdf_lengths.astype(np.int32)])
            self.head_cdfs = jnp.asarray(h_np)
            self.head_offsets_np = head_cdf_table.offsets.astype(np.int32)
        else:
            self.head_index_base = None
            self.enc_cdfs = self.cdfs
            self.enc_offsets_np = self.offsets_np
            self.enc_lengths_np = self.lengths_np
        self.N = int(num_lanes)
        self.esc_cap = int(esc_cap)
        # optional cap on the coded stream length in 16-bit words. The
        # default (None) sizes every word buffer for the worst case
        # (~2 words/symbol: 1.25 MB payloads for qarv_base 512x768), but
        # trained operating points emit 20-120k words — the oversized
        # buffers cost real device time (the encode payload-assembly
        # conditional alone was 7-12 ms/image in the r4 xplane trace,
        # runs/fused-attrib-r4.txt). With word_cap set, all payload/word
        # buffers shrink to the cap; a stream that overflows it raises
        # OverflowError at assembly (n_words is always counted exactly),
        # mirroring esc_cap's contract.
        self.word_cap = int(word_cap) if word_cap is not None else None
        self.compute_dtype = compute_dtype
        self.interpret = bool(interpret)
        self._codec_cache = {}
        self._dummy_cache = {}
        self._pull_words = {}
        self._dec_wrap = {}

    @staticmethod
    def _check_table(cdf_table):
        # the packed-gather encode tables assume 16-bit freqs and 15-bit
        # offsets/lengths (ops/pallas/rans_encode.py)
        raw = cdf_table.cdfs.astype(np.int64)
        for r, ln in zip(raw, cdf_table.cdf_lengths):
            d = np.diff(r[:ln])
            assert (d >= 1).all() and (d <= 0xFFFF).all(), \
                'CDF row with zero-mass or >16-bit-frequency bin'
        assert np.abs(cdf_table.offsets).max() < (1 << 15)
        assert cdf_table.cdf_lengths.max() < (1 << 15)
    # subclasses provide _build_encode(imH, imW) and _build_decode(nH, nW)

    def _block_sizes(self, nH, nW):
        """Static per-latent-block symbol counts at latent grid (nH, nW)."""
        sizes = []
        h, w = nH, nW
        for block in self.net.dec_blocks:
            if getattr(block, 'is_latent_block', False):
                sizes.append(h * w * block.zdim)
            elif isinstance(block, common.CompressionStopFlag):
                break
            elif isinstance(block, (common.patch_upsample,
                                    common.upsample_nearest)):
                h, w = h * block.rate, w * block.rate
            elif isinstance(block, common.deconv):
                h, w = h * block.stride, w * block.stride
        return sizes


    # mode operand values for the unified codec program
    MODE_ENC = 0
    MODE_DEC = 1

    def _codec(self, imH, imW):
        key = (imH, imW)
        if key not in self._codec_cache:
            self._codec_cache[key] = self._build_codec(imH, imW)
        return self._codec_cache[key]

    def _codec_b(self, imH, imW, B):
        """Batched unified codec (serving throughput mode): one executable
        coding B same-shape images — convs/trunk batched on the MXU, the
        per-image rANS kernels chained inside the program, payloads pulled
        in ONE host fetch for all B images. Per-image streams keep the
        exact single-image wire format, but are self-consistent WITHIN this
        batch-B executable: like the B=1 program (see _canon_sizes), the
        compiled binary is part of the codec — decode a batch-B stream with
        the batch-B program."""
        key = (imH, imW, B)
        if key not in self._codec_cache:
            self._codec_cache[key] = self._build_codec_batch(imH, imW, B)
        return self._codec_cache[key]

    def _dummies(self, imH, imW):
        """Device-resident canonical-shape dummy operands + flag scalars.

        The unified program takes BOTH directions' operands every call:
        encode feeds zero stream buffers (its decode branches are
        cond-skipped), decode feeds a zero image (its backbone branch is
        cond-skipped). Created once per image shape and kept on device —
        no recurring host->device traffic."""
        key = (imH, imW)
        d = self._dummy_cache.get(key)
        if d is None:
            nH = imH // self.net.max_stride
            nW = imW // self.net.max_stride
            PK, EB = self._canon_sizes(nH, nW)
            d = dict(
                im=jnp.zeros((1, imH, imW, 3), jnp.float32),
                states=jnp.zeros((1, self.N), jnp.int32),
                packed=jnp.zeros((PK,), jnp.int32),
                esc_pos=jnp.full((EB,), -1, jnp.int32),
                esc_val=jnp.zeros((EB,), jnp.int32),
                enc=jnp.int32(self.MODE_ENC), dec=jnp.int32(self.MODE_DEC),
                off=jnp.int32(0), on=jnp.int32(1))
            self._dummy_cache[key] = d
        return d

    def encode(self, params, im, *extra):
        """Run the unified codec program in encode mode and assemble the
        payload bytes.

        Payload layout: [3+N scalars/states][packed words ((n_words+1)//2)]
        [escape (pos,val) pairs (n_esc)][slack] — the escape pairs are
        written ON DEVICE at the dynamic offset right after the words, so
        header+words+escapes always arrive in ONE adaptive-prefix pull
        (trained weights: ~zero escapes; untrained weights no longer pay a
        second 27ms-floor fetch for the escape region)."""
        _, imH, imW, _ = im.shape
        d = self._dummies(imH, imW)
        payload, _ = self._codec(imH, imW)(
            params, im, d['enc'], d['off'], d['states'], d['packed'],
            d['esc_pos'], d['esc_val'], *extra)
        return self._payload_to_bytes(payload, (imH, imW))

    def encode_check(self, params, im, *extra):
        """Self-check encode: also returns the image reconstructed from the
        ENCODE-side symbols — decode mode must match it bitwise. This is
        the SAME executable as encode() and decode_to_device() (want_image
        is a runtime operand), so the check exercises the production
        binary."""
        import numpy as _np
        _, imH, imW, _ = im.shape
        d = self._dummies(imH, imW)
        payload, img = self._codec(imH, imW)(
            params, im, d['enc'], d['on'], d['states'], d['packed'],
            d['esc_pos'], d['esc_val'], *extra)
        return self._payload_to_bytes(payload, (imH, imW)), _np.asarray(img)

    def _assemble_body(self, pulled, fetch_rest):
        """Build one image's wire-format body from its pulled payload
        prefix; fetch_rest(cur_len, need) supplies the tail when the
        adaptive estimate was too small. Returns (bytes, n_words, n_esc)."""
        N, esc_cap = self.N, self.esc_cap
        head_len = 3 + N
        n_words = int(pulled[0])
        n_esc = int(pulled[1])
        if n_esc > esc_cap:
            raise OverflowError(
                f'{n_esc} escapes exceed the fused-codec capacity {esc_cap}; '
                f'raise esc_cap (compress_mode) or use coder="host"')
        if self.word_cap is not None and n_words > self.word_cap:
            raise OverflowError(
                f'{n_words} coded words exceed the fused-codec capacity '
                f'{self.word_cap}; raise word_cap (compress_mode) or leave '
                f'it unset for the worst-case buffers')
        half = (n_words + 1) // 2
        need = head_len + half + 2 * n_esc
        if need > pulled.shape[0]:             # estimate too small: pull rest
            pulled = np.concatenate(
                [pulled, fetch_rest(int(pulled.shape[0]), need)])

        states_u32 = pulled[3:3 + N].copy().view('<u4')
        packed = np.ascontiguousarray(pulled[head_len:head_len + half])
        words16 = packed.view('<u2')[:n_words][::-1]  # push order -> stream
        esc_pairs = pulled[head_len + half:head_len + half + 2 * n_esc]

        # high bit of the lane-count field marks a PORTABLE stream (coded
        # by the cross-executable-deterministic trunk, ops/pallas/trunk.py)
        # — its floats differ in low bits from the legacy trunk's, so the
        # two stream kinds must never be decoded by each other's codec
        lanes_field = N | (0x8000 if self.portable else 0)
        out = struct.pack('<IIH', n_words, n_esc, lanes_field)
        out += coding.pack_states(states_u32)   # compact lane-state flush
        esc_pairs = esc_pairs.astype(np.int64)
        out += coding.pack_escapes(esc_pairs[0::2], esc_pairs[1::2])
        out += words16.astype('<u2').tobytes()
        return out, n_words, n_esc

    def _payload_to_bytes(self, payload, key):
        N = self.N
        head_len = 3 + N
        total = int(payload.shape[0])
        est = self._pull_words.get(key)
        if est is None:
            take = total                       # first image: everything
        else:
            take = min(head_len + (est[0] + 1) // 2 + 2 * est[1], total)
        pulled = np.asarray(payload[:take])
        out, n_words, n_esc = self._assemble_body(
            pulled, lambda cur, need: np.asarray(payload[cur:need]))
        self._pull_words[key] = (int(n_words * 1.2) + 64,
                                 int(n_esc * 1.2) + 8)
        return out

    @staticmethod
    def _word_bucket(n_words):
        b = 2048
        while b < n_words:
            b *= 2
        return b

    def parse_payload(self, body: bytes):
        """-> (states (1,N) i32 dev-ready, packed words i32, esc_pos, esc_val)."""
        N = self.N
        n_words, n_esc, lanes_field = struct.unpack('<IIH', body[:10])
        portable = bool(lanes_field & 0x8000)
        lanes = lanes_field & 0x7FFF
        assert portable == self.portable, \
            f'stream trunk kind ({"portable" if portable else "legacy"}) ' \
            f'!= codec ({"portable" if self.portable else "legacy"}); ' \
            f'use compress_mode(portable={portable})'
        assert lanes == N, f'stream lanes {lanes} != configured {N}'
        off = 10
        states, consumed = coding.unpack_states(body[off:], N)
        off += consumed
        e_pos, e_val, consumed = coding.unpack_escapes(body[off:], n_esc)
        off += consumed
        words = np.frombuffer(body[off:off + 2 * n_words], '<u2')

        wb = self._word_bucket(n_words)
        pk = np.zeros(wb, np.uint32)
        pk[:n_words] = words.astype(np.uint32)
        packed = (pk[0::2] | (pk[1::2] << 16)).astype(np.uint32).view(np.int32)

        # escape arrays bucketed to the ACTUAL count (trained models: ~none)
        # — pushing/scattering esc_cap-sized arrays would dominate decode
        eb = 128
        while eb < n_esc:
            eb *= 2
        esc_pos = np.full(eb, -1, np.int32)
        esc_val = np.zeros(eb, np.int32)
        esc_pos[:n_esc] = e_pos
        esc_val[:n_esc] = e_val
        return (states.view(np.int32).reshape(1, N).copy(), packed,
                esc_pos, esc_val)

    def _canon_sizes(self, nH, nW):
        """Canonical (packed-words, escape-buffer) lengths for image shape
        (nH, nW): the decode program is compiled ONCE per shape against
        these worst-case static sizes, regardless of how many words or
        escapes a particular stream carries.

        This is load-bearing for correctness, not just compile count: the
        r3 distortion-parity probe caught trained-weight fused decodes
        reconstructing 7-10 dB low while random-init validation was
        bit-exact — the old path re-jitted the WHOLE decode per
        (word-bucket, escape-bucket) size, and a differently-specialized
        compilation of the trunk can drift in its low float bits, flip a
        scale index, and desync the rANS stream. One executable per shape
        means the binary that hardware validation proves bit-exact is the
        binary every stream runs through."""
        total = sum(self._block_sizes(nH, nW))
        if self.head_index_base is not None:
            ms = self.net.max_stride
            total += (nH * ms) * (nW * ms) * 3
        # 16-bit renorm emits at most 2 words per coded symbol, plus slack
        words_cap = self._word_bucket(2 * total + 2 * self.N + 64)
        if self.word_cap is not None:
            words_cap = min(words_cap, self._word_bucket(self.word_cap))
        eb = 128
        while eb < self.esc_cap:
            eb *= 2
        return words_cap // 2, eb

    def decode_to_device(self, params, body: bytes, nH, nW, *extra):
        """Parse + push + run the unified codec program in decode mode;
        returns the image ON DEVICE (asynchronous; caller pulls or syncs).

        states/words/escapes are pushed as ONE small int32 blob (each
        host->device transfer pays this environment's fixed tunnel cost,
        so transfer COUNT dominates transfer size). A tiny integer-only
        `prep` program (jitted per blob size; pure memory movement, no
        float ops — cannot drift) pads them into the canonical static
        shapes, and the SINGLE per-shape codec executable consumes them
        (see _canon_sizes and qarv/fused.py for why the codec must not
        specialize per stream size or per direction)."""
        states, packed, esc_pos, esc_val = self.parse_payload(body)
        ms = self.net.max_stride
        imH, imW = nH * ms, nW * ms
        dec = self._codec(imH, imW)
        d = self._dummies(imH, imW)
        N = self.N
        PK, EB = self._canon_sizes(nH, nW)
        wb, eb = packed.size, esc_pos.size
        if wb > PK or eb > EB:
            # reachable for VALID foreign streams when this codec runs
            # with a word_cap below the stream's length — same contract
            # as the encode side: OverflowError with actionable guidance
            raise OverflowError(
                f'stream exceeds this codec\'s buffers ({wb}>{PK} pairs or '
                f'{eb}>{EB} escapes); raise word_cap/esc_cap '
                f'(compress_mode) or leave word_cap unset for the '
                f'worst-case buffers')
        pkey = (nH, nW, wb, eb)
        prep = self._dec_wrap.get(pkey)
        if prep is None:
            def prep(blob, _wb=wb, _eb=eb, _PK=PK, _EB=EB):
                st = blob[:N].reshape(1, N)
                pk = jnp.zeros((_PK,), jnp.int32)
                pk = jax.lax.dynamic_update_slice(pk, blob[N:N + _wb], (0,))
                ep = jnp.full((_EB,), -1, jnp.int32)
                ep = jax.lax.dynamic_update_slice(
                    ep, blob[N + _wb:N + _wb + _eb], (0,))
                ev = jnp.zeros((_EB,), jnp.int32)
                ev = jax.lax.dynamic_update_slice(
                    ev, blob[N + _wb + _eb:N + _wb + 2 * _eb], (0,))
                return st, pk, ep, ev
            prep = jax.jit(prep)
            if len(self._dec_wrap) > 64:
                self._dec_wrap.clear()
            self._dec_wrap[pkey] = prep
        blob = np.concatenate([states.ravel(), packed, esc_pos, esc_val])
        st, pk, ep, ev = prep(jnp.asarray(blob))
        _, img = dec(params, d['im'], d['dec'], d['on'],
                     st, pk, ep, ev, *extra)
        return img

    # ---- batched serving mode -------------------------------------------

    def _dummies_b(self, imH, imW, B):
        """Batched canonical-shape dummy operands (see _dummies)."""
        key = (imH, imW, B)
        d = self._dummy_cache.get(key)
        if d is None:
            nH = imH // self.net.max_stride
            nW = imW // self.net.max_stride
            PK, EB = self._canon_sizes(nH, nW)
            d = dict(
                im=jnp.zeros((B, imH, imW, 3), jnp.float32),
                states=jnp.zeros((B, 1, self.N), jnp.int32),
                packed=jnp.zeros((B, PK), jnp.int32),
                esc_pos=jnp.full((B, EB), -1, jnp.int32),
                esc_val=jnp.zeros((B, EB), jnp.int32),
                enc=jnp.int32(self.MODE_ENC), dec=jnp.int32(self.MODE_DEC),
                off=jnp.int32(0), on=jnp.int32(1))
            self._dummy_cache[key] = d
        return d

    @staticmethod
    def _chunk_sizes(B, mpb):
        """Balanced chunk sizes for a B-image request under a per-program
        batch cap: sizes differ by at most 1 (B=8, cap 4 -> [4, 4];
        B=7 -> [4, 3]). Deterministic in (B, cap) — decode re-derives the
        same split, so legacy (binary-pinned) streams still round-trip."""
        if not mpb or B <= mpb:
            return [B]
        k = -(-B // mpb)
        base, rem = divmod(B, k)
        return [base + 1] * rem + [base] * (k - rem)

    def encode_batch(self, params, ims, *extra):
        """Encode B same-shape images in ONE program invocation (or a
        pipeline of balanced chunks when B exceeds max_program_batch); all
        payload prefixes arrive in one adaptive host pull per chunk.
        Returns a list of B single-image wire-format bodies."""
        return self.encode_batch_finish(
            self.encode_batch_async(params, ims, *extra))

    def encode_batch_async(self, params, ims, *extra):
        """Dispatch-only half of encode_batch: launches the batch codec
        program(s) and returns an opaque handle WITHOUT synchronizing. A
        serving loop dispatches batch k+1 before calling
        encode_batch_finish on batch k, so the host-side payload pull of
        one batch (the runtime's fixed per-transfer cost + stream glue)
        overlaps the device compute of the next — sustained throughput
        approaches device-only speed. Same executable(s) as encode_batch:
        streams are byte-identical either way. Chunks are ALL dispatched
        here back-to-back (the device queue serializes them), so chunk
        k+1 computes while chunk k's payload is pulled in the finish."""
        B = ims.shape[0]
        handles = []
        b0 = 0
        for g in self._chunk_sizes(B, self.max_program_batch):
            sub = tuple(e[b0:b0 + g] for e in extra)
            handles.append(self._encode_one_async(
                params, ims[b0:b0 + g], *sub))
            b0 += g
        return handles

    def _encode_one_async(self, params, ims, *extra):
        B, imH, imW, _ = ims.shape
        d = self._dummies_b(imH, imW, B)
        payload, _ = self._codec_b(imH, imW, B)(
            params, ims, d['enc'], d['off'], d['states'], d['packed'],
            d['esc_pos'], d['esc_val'], *extra)
        return payload, (imH, imW, B)

    def encode_batch_finish(self, handle):
        """Synchronizing half of encode_batch_async: pulls the payload
        prefixes (one bulk fetch per chunk) and assembles the wire-format
        bodies."""
        bodies = []
        for payload, key in handle:
            bodies.extend(self._payloads_to_bytes(payload, key))
        return bodies

    def encode_check_batch(self, params, ims, *extra):
        """Batch self-check encode: also returns the images reconstructed
        from the encode-side symbols. Chunked EXACTLY like encode_batch —
        the recon oracle must come from the same executables that wrote
        the streams (legacy trunk floats are only bit-stable within one
        binary)."""
        B, imH, imW, _ = ims.shape
        bodies, imgs = [], []
        b0 = 0
        for g in self._chunk_sizes(B, self.max_program_batch):
            sub = tuple(e[b0:b0 + g] for e in extra)
            d = self._dummies_b(imH, imW, g)
            payload, img = self._codec_b(imH, imW, g)(
                params, ims[b0:b0 + g], d['enc'], d['on'], d['states'],
                d['packed'], d['esc_pos'], d['esc_val'], *sub)
            bodies.extend(self._payloads_to_bytes(payload, (imH, imW, g)))
            imgs.append(np.asarray(img))
            b0 += g
        return bodies, np.concatenate(imgs, axis=0)

    def _payloads_to_bytes(self, payload, key):
        """(B, P) payload rows -> list of B bodies, ONE bulk prefix pull."""
        N = self.N
        head_len = 3 + N
        B, total = int(payload.shape[0]), int(payload.shape[1])
        est = self._pull_words.get(key)
        if est is None:
            take = total
        else:
            take = min(head_len + (est[0] + 1) // 2 + 2 * est[1], total)
        pulled = np.asarray(payload[:, :take])          # ONE fetch, B rows
        bodies, max_w, max_e = [], 0, 0
        for b in range(B):
            out, n_words, n_esc = self._assemble_body(
                pulled[b], lambda cur, need, _b=b: np.asarray(
                    payload[_b, cur:need]))
            bodies.append(out)
            max_w, max_e = max(max_w, n_words), max(max_e, n_esc)
        self._pull_words[key] = (int(max_w * 1.2) + 64,
                                 int(max_e * 1.2) + 8)
        return bodies

    def decode_batch_to_device(self, params, bodies, nH, nW, *extra):
        """Parse + push B streams as ONE blob per chunk; run the batch
        codec in decode mode; returns (B, H, W, 3) images ON DEVICE
        (async). Chunked with the same balanced split as encode_batch, so
        each stream is decoded by the binary size that wrote it."""
        B = len(bodies)
        sizes = self._chunk_sizes(B, self.max_program_batch)
        if len(sizes) > 1:
            imgs, b0 = [], 0
            for g in sizes:
                sub = tuple(e[b0:b0 + g] for e in extra)
                imgs.append(self._decode_one_to_device(
                    params, bodies[b0:b0 + g], nH, nW, *sub))
                b0 += g
            return jnp.concatenate(imgs, axis=0)
        return self._decode_one_to_device(params, bodies, nH, nW, *extra)

    def _decode_one_to_device(self, params, bodies, nH, nW, *extra):
        parsed = [self.parse_payload(bd) for bd in bodies]
        B = len(bodies)
        ms = self.net.max_stride
        imH, imW = nH * ms, nW * ms
        dec = self._codec_b(imH, imW, B)
        d = self._dummies_b(imH, imW, B)
        N = self.N
        PK, EB = self._canon_sizes(nH, nW)
        sizes = tuple((int(p[1].size), int(p[2].size)) for p in parsed)
        if not all(wb <= PK and eb <= EB for wb, eb in sizes):
            raise OverflowError(
                f'stream exceeds this codec\'s buffers {PK}/{EB}: {sizes}; '
                f'raise word_cap/esc_cap (compress_mode) or leave word_cap '
                f'unset for the worst-case buffers')
        pkey = (nH, nW, B, sizes)
        prep = self._dec_wrap.get(pkey)
        if prep is None:
            def prep(blob, _sizes=sizes, _PK=PK, _EB=EB):
                sts, pks, eps, evs = [], [], [], []
                off = 0
                for wb, eb in _sizes:
                    sts.append(blob[off:off + N].reshape(1, N))
                    off += N
                    pk = jnp.zeros((_PK,), jnp.int32)
                    pk = jax.lax.dynamic_update_slice(
                        pk, blob[off:off + wb], (0,))
                    off += wb
                    ep = jnp.full((_EB,), -1, jnp.int32)
                    ep = jax.lax.dynamic_update_slice(
                        ep, blob[off:off + eb], (0,))
                    off += eb
                    ev = jnp.zeros((_EB,), jnp.int32)
                    ev = jax.lax.dynamic_update_slice(
                        ev, blob[off:off + eb], (0,))
                    off += eb
                    pks.append(pk)
                    eps.append(ep)
                    evs.append(ev)
                return (jnp.stack(sts), jnp.stack(pks),
                        jnp.stack(eps), jnp.stack(evs))
            prep = jax.jit(prep)
            if len(self._dec_wrap) > 64:
                self._dec_wrap.clear()
            self._dec_wrap[pkey] = prep
        blob = np.concatenate(
            [np.concatenate([p[0].ravel(), p[1], p[2], p[3]])
             for p in parsed])
        st, pk, ep, ev = prep(jnp.asarray(blob))
        _, img = dec(params, d['im'], d['dec'], d['on'],
                     st, pk, ep, ev, *extra)
        return img

    # ---- in-program helpers shared by subclasses -------------------------

    @staticmethod
    def unpack_words(packed):
        w0 = packed & 0xFFFF
        w1 = jax.lax.shift_right_logical(packed, 16)
        return jnp.stack([w0, w1], axis=1).reshape(-1)

    def pack_payload(self, syms_flat, idx_flat):
        """Common encode tail: escapes, row layout, device rANS encode,
        payload assembly. syms_flat/idx_flat: lists of flat int32 arrays,
        one per latent block (decode order)."""
        from lvae_tpu.ops.pallas import rans_encode as pre
        N, esc_cap = self.N, self.esc_cap
        values = jnp.concatenate(syms_flat)
        idx_all = jnp.concatenate(idx_flat)
        # tables passed as STATIC numpy: prepare_inband unrolls them into
        # fused compare-selects (a gather here cost ~6 ms/image on TPU)
        inband, esc_mask = pre.prepare_inband(
            values, idx_all, self.enc_offsets_np, self.enc_lengths_np)
        # escape compaction via cumsum + dropping scatter (ascending
        # positions, like jnp.nonzero, without its sort-based lowering)
        mask_i = esc_mask.astype(jnp.int32)
        n_esc_true = jnp.sum(mask_i)

        # three-way escape extraction (all branches produce IDENTICAL
        # outputs on their domains, so the wire bytes never depend on the
        # branch taken): zero escapes -> constants; sparse (every chunk
        # <= _ESC_CHUNK_CAP escapes — all trained operating points) ->
        # scatter-free chunked compaction; dense (random-init stress) ->
        # the full-symbol-range scatter (~5.9 ms on v5e, suite2-r5 attrib)
        def _extract_esc(_):
            rank = jnp.cumsum(mask_i) - 1
            slot = jnp.where(esc_mask, rank, esc_cap)
            pos_iota = jnp.arange(values.shape[0], dtype=jnp.int32)
            esc_pos = jnp.full((esc_cap,), -1, jnp.int32).at[slot].set(
                pos_iota, mode='drop')
            esc_val = jnp.where(esc_pos >= 0,
                                values[jnp.clip(esc_pos, 0, None)], 0)
            return esc_pos, esc_val

        def _extract_sparse(_):
            return _compact_escapes_chunked(esc_mask, values, esc_cap)

        def _no_esc(_):
            return (jnp.full((esc_cap,), -1, jnp.int32),
                    jnp.zeros((esc_cap,), jnp.int32))

        sparse_ok = jnp.max(_escape_chunk_counts(mask_i)) <= _ESC_CHUNK_CAP
        branch = jnp.where(n_esc_true == 0, 0,
                           jnp.where(sparse_ok, 1, 2))
        esc_pos, esc_val = jax.lax.switch(
            branch, [_no_esc, _extract_sparse, _extract_esc], None)

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
        w_cap = (min(self.word_cap, sym_cat.shape[0] * N)
                 if self.word_cap is not None else None)
        packed, n_words, states = pre.rans_encode_all(
            sym_cat, jnp.concatenate(idx_rows),
            np.concatenate(row_ns), self.enc_cdfs, num_lanes=N,
            w_cap=w_cap, interpret=self.interpret)
        # the kernel emits the WIRE packing directly (pair j = word 2j |
        # word 2j+1 << 16, push order; the host reverses word order after
        # the pull) — the former XLA strided re-pack of the word buffer
        # was ~17 ms/image of gather-fusion time in the batch-6 profile
        head = jnp.concatenate([
            jnp.stack([n_words, n_esc_true, jnp.int32(N)]),
            states.reshape(-1),
        ])
        esc_pairs = jnp.stack([esc_pos.astype(jnp.int32),
                               esc_val.astype(jnp.int32)], axis=1).reshape(-1)
        # write the escape pairs at the dynamic offset right after the words
        # so header+words+escapes arrive in ONE adaptive host pull (the body
        # keeps the full static capacity; the pull stops after the escapes)
        body = jnp.concatenate([packed,
                                jnp.zeros(esc_pairs.shape[0], jnp.int32)])
        body = jax.lax.dynamic_update_slice(
            body, esc_pairs, ((n_words + 1) // 2,))
        return jnp.concatenate([head, body])

    # VMEM budget for grouping images into one encode-kernel call: each
    # image's packed (start|freq) table + word buffer must sit in VMEM
    # (~16 MB/core on v5e); leave slack for the kernel's working set.
    _ENC_VMEM_BUDGET = 12 * 1024 * 1024
    _ENC_GROUP_MAX = 4

    def pack_payload_batch(self, syms_flat, idx_flat):
        """Batch encode tail: pack_payload for B images in one pass.

        syms_flat/idx_flat: lists (one per latent block, decode order) of
        (B, nsym_block) int32 arrays — every image shares the block/row
        layout (the batch codec guarantees equal image shapes). Returns
        (B, P) payload rows, each byte-identical to pack_payload run on
        that image's symbols alone (all-integer math; the kernel identity
        is tested in tests/test_rans_encode_kernel.py).

        Two wins over B pack_payload calls (the batch-6 profile's largest
        encode term, runs/batch-profile-r3.txt): the escape handling /
        row layout / word packing become single (B, ...) XLA ops, and the
        B inherently-serial rANS state chains run STACKED on the VPU
        sublane dimension in groups sized to the VMEM budget
        (rans_encode_all_multi) — G images per kernel cost ~one image's
        iteration count instead of G."""
        from lvae_tpu.ops.pallas import rans_encode as pre
        N, esc_cap = self.N, self.esc_cap
        B = int(syms_flat[0].shape[0])
        values = jnp.concatenate(syms_flat, axis=1)              # (B, total)
        idx_all = jnp.concatenate(idx_flat, axis=1)
        inband, esc_mask = pre.prepare_inband(
            values, idx_all, self.enc_offsets_np, self.enc_lengths_np)

        mask_i = esc_mask.astype(jnp.int32)
        n_esc_true = jnp.sum(mask_i, axis=1)                     # (B,)

        # see pack_payload: three-way extraction, batch-wide branch pick
        # (identical outputs on each branch's domain -> wire unchanged)
        def _extract_esc(_):
            rank = jnp.cumsum(mask_i, axis=1) - 1
            slot = jnp.where(esc_mask, rank, esc_cap)
            pos_iota = jnp.broadcast_to(
                jnp.arange(values.shape[1], dtype=jnp.int32), values.shape)
            rows_b = jnp.broadcast_to(
                jnp.arange(B, dtype=jnp.int32)[:, None], slot.shape)
            esc_pos = jnp.full((B, esc_cap), -1, jnp.int32).at[
                rows_b, slot].set(pos_iota, mode='drop')
            esc_val = jnp.where(
                esc_pos >= 0,
                jnp.take_along_axis(values, jnp.clip(esc_pos, 0, None),
                                    axis=1),
                0)
            return esc_pos, esc_val

        def _extract_sparse(_):
            return jax.vmap(
                lambda m, v: _compact_escapes_chunked(m, v, esc_cap))(
                    esc_mask, values)

        def _no_esc(_):
            return (jnp.full((B, esc_cap), -1, jnp.int32),
                    jnp.zeros((B, esc_cap), jnp.int32))

        sparse_ok = jnp.max(_escape_chunk_counts(mask_i)) <= _ESC_CHUNK_CAP
        branch = jnp.where(jnp.sum(n_esc_true) == 0, 0,
                           jnp.where(sparse_ok, 1, 2))
        esc_pos, esc_val = jax.lax.switch(
            branch, [_no_esc, _extract_sparse, _extract_esc], None)

        sym_rows, idx_rows, row_ns = [], [], []
        off = 0
        for s in [v.shape[1] for v in syms_flat]:
            Tb = max((s + N - 1) // N, 1)
            pad = Tb * N - s
            sym_rows.append(jnp.pad(
                jax.lax.dynamic_slice_in_dim(inband, off, s, axis=1),
                ((0, 0), (0, pad))).reshape(B, Tb, N))
            idx_rows.append(jnp.pad(
                jax.lax.dynamic_slice_in_dim(idx_all, off, s, axis=1),
                ((0, 0), (0, pad))).reshape(B, Tb, N))
            rn = np.full(Tb, N, np.int32)
            rn[-1] = s - (Tb - 1) * N
            row_ns.append(rn)
            off += s
        syms_b = jnp.concatenate(sym_rows, axis=1)               # (B, T, N)
        idx_b = jnp.concatenate(idx_rows, axis=1)
        row_n = np.concatenate(row_ns)
        T = syms_b.shape[1]

        w_cap = (min(self.word_cap, T * N)
                 if self.word_cap is not None else None)
        # per-image VMEM: the (idx|sym) table (T*N i32) + the pair buffer
        # (worst case when uncapped; capping buys larger kernel groups);
        # pair_capacity is the kernel's own allocation formula
        pair_elems = pre.pair_capacity(w_cap if w_cap is not None else T * N)
        per_image = 4 * (T * N + pair_elems)
        group = max(1, min(self._ENC_GROUP_MAX,
                           self._ENC_VMEM_BUDGET // max(per_image, 1)))
        bufs, nws, sts = [], [], []
        b0 = 0
        while b0 < B:
            g = min(group, B - b0)
            if g == 1:
                buf, nw, st = pre.rans_encode_all(
                    syms_b[b0], idx_b[b0], row_n, self.enc_cdfs,
                    num_lanes=N, w_cap=w_cap, interpret=self.interpret)
                bufs.append(buf[None])
                nws.append(nw[None])
                sts.append(st.reshape(1, N))
            else:
                w, nw, st = pre.rans_encode_all_multi(
                    syms_b[b0:b0 + g], idx_b[b0:b0 + g], row_n,
                    self.enc_cdfs, num_lanes=N, w_cap=w_cap,
                    interpret=self.interpret)
                bufs.append(w)
                nws.append(nw)
                sts.append(st)
            b0 += g
        # kernel pair buffers ARE the wire packing (see pack_payload)
        packed = jnp.concatenate(bufs, axis=0)                 # (B, P_cap)
        n_words = jnp.concatenate(nws)                         # (B,)
        states = jnp.concatenate(sts, axis=0)                  # (B, N)
        esc_pairs = jnp.stack([esc_pos, esc_val], axis=2).reshape(B, -1)
        payloads = []
        for b in range(B):
            head = jnp.concatenate([
                jnp.stack([n_words[b], n_esc_true[b], jnp.int32(N)]),
                states[b]])
            body = jnp.concatenate([
                packed[b], jnp.zeros(esc_pairs.shape[1], jnp.int32)])
            body = jax.lax.dynamic_update_slice(
                body, esc_pairs[b], ((n_words[b] + 1) // 2,))
            payloads.append(jnp.concatenate([head, body]))
        return jnp.stack(payloads)

"""Single-program QARV codec: ONE XLA executable for BOTH directions.

Round-1 staged coding issued ~30 per-block stage dispatches on encode and
~20 (plus Pallas decode calls) on decode; through a tunneled TPU runtime the
per-call Python/dispatch overhead dominated latency. Here the whole codec
is one jitted program per image shape with a runtime `mode` operand:
encode mode runs backbone -> latent trunk -> on-device interleaved-rANS
encode kernel -> packed payload; decode mode runs latent trunk (symbols
from the Pallas rANS decode kernels) -> synthesis tail -> image. Host
traffic per image: ONE payload pull on encode, ONE stream push + ONE image
pull (or tiny sync) on decode.

Bit-exactness (the load-bearing design decision, round-3 hardware
history): an arithmetic-coded stream desyncs if the decoder's recomputed
prior/fuse floats differ from the encoder's by even one scale-index flip.
Three schemes failed on real TPU hardware before this one:
  1. bf16 shared trunk across two programs — bf16 MXU accumulation order
     differs per program; desynced immediately (runs/tpu-validate-r3.json).
  2. f32 trunk in two barrier-bracketed programs (encode + decode) —
     f32 is *almost* bit-stable across program shapes, but trained-weight
     statistics exposed ~1e-5 cross-program drift that the autoregressive
     latent feedback amplified into index flips (runs/fused-divergence-r3:
     max|dpm| grows 0 -> 2.7 over 9 blocks).
  3. per-stream-size decode re-specialization — same failure one level
     down (each word-bucket got its own drifted binary).
The only construction that cannot drift is ONE binary: the trunk (lambda
embedding, priors, fuses) appears at exactly one call site in one compiled
executable, so encode and decode run the SAME machine code on the same
integer symbol inputs — bitwise equality by determinism of the hardware,
not by hoping the compiler fuses two programs identically. Everything
direction-specific lives in jax.lax.cond branches whose results join the
trunk only through integer selects (symbols) or dead outputs (payload in
decode mode, image in encode mode), so branch numerics CANNOT perturb the
trunk, and untaken branches cost nothing at runtime.

Precision policy: compute_dtype='bfloat16' means BACKBONE-ONLY bf16: the
encoder backbone's outputs only determine which symbols are WRITTEN
(decode reads them from the stream, never recomputes them), so it may run
at any precision — and it sits inside the encode-mode cond. The lambda
embedding, priors, fuses and synthesis tail — everything whose floats both
modes must agree on — always run f32 in the shared straight-line trunk.

Wire format (fused payload, little-endian):
    [I n_words][I n_esc][H num_lanes]
    [compact lane states: packed 2-bit length codes + truncated
    little-endian (state - 2^16) bytes, utils/coding.pack_states]
    [escape varints (delta-pos + zigzag-val LEB128,
    utils/coding.pack_escapes) x n_esc][words u16 x n_words]

Reference behavior being replaced: per-block CPU rANS round-trips in
lvae/models/qarv/model.py:104-121, 516-557.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.models import common
from lvae_tpu.models.fused_base import FusedCodecBase, cast_tree, _ob
from lvae_tpu.ops.pallas import rans_decode as prd


class FusedQarvCodec(FusedCodecBase):
    """Fused codec for VariableRateLossyVAENet (lambda-conditioned).

    Two trunk implementations share the one-executable structure:
      * legacy (default): flax stages, barrier-bracketed f32 XLA — bit-exact
        WITHIN one compiled binary (same-binary round-trips).
      * portable=True: every arithmetic op between the stream's integer
        junctions runs in fixed-block-spec Pallas kernels
        (ops/pallas/trunk.py), making the decode path bitwise-deterministic
        ACROSS executables — a stream encoded by the batch-6 binary decodes
        bit-exact (pixels included) in the batch-1 binary, a recompile, or
        any other program embedding these kernels. Portable streams carry a
        marker bit in the lane-count field; the two stream kinds are never
        cross-decoded (fused_base.parse_payload enforces it).
    """

    supports_portable = True

    # ---------------------------------------------------- shared stages
    # These appear in BOTH directions of the one program with identical
    # interfaces. `ectx` = (emb_f32, gelu(emb) or None) — the conditioning
    # context threaded through every stage.

    def _emb_stage(self, params, lmb):
        net = self.net
        e0, e1 = params['lmb_embed_0'], params['lmb_embed_1']
        scaled = jnp.log(lmb) * (net.sin_period / math.log(8192.0))
        x = common.sinusoidal_embedding(scaled, dim=net.lmb_embed_dim[0],
                                        max_period=net.sin_period)
        x = jnp.dot(x, e0['kernel'].astype(jnp.float32)) + \
            e0['bias'].astype(jnp.float32)
        x = jax.nn.gelu(x, approximate=False)
        return jnp.dot(x, e1['kernel'].astype(jnp.float32)) + \
            e1['bias'].astype(jnp.float32)

    def _emb_ctx(self, params, lmb):
        """-> (emb for the encode backbone, ectx for the shared trunk)."""
        if not self.portable:
            emb = _ob(self._emb_stage(params, lmb))
            return emb, (emb.astype(jnp.float32), None)
        from lvae_tpu.ops.pallas import trunk as ptk
        net = self.net
        half = net.lmb_embed_dim[0] // 2
        freqs = np.power(float(net.sin_period),
                         -np.linspace(0.0, 1.0, half)).astype(np.float32)
        e0, e1 = params['lmb_embed_0'], params['lmb_embed_1']
        emb, gemb = ptk.emb_mlp(
            lmb, jnp.asarray(freqs[None]),
            e0['kernel'].astype(jnp.float32), e0['bias'].astype(jnp.float32),
            e1['kernel'].astype(jnp.float32), e1['bias'].astype(jnp.float32),
            net.sin_period, interpret=self.interpret)
        return emb, (emb, gemb)

    def _scale_table(self):
        # cache NUMPY (a jnp constant created inside one jit trace must not
        # be reused in another — tracer leak); jnp.asarray per use site
        tb = getattr(self, '_scale_table_np', None)
        if tb is None:
            from lvae_tpu.ops import cdf as cdf_ops
            tb = cdf_ops.default_gaussian_scale_table().astype(np.float32)
            self._scale_table_np = tb
        return jnp.asarray(tb)

    def _prior(self, block, bp, feature, ectx):
        emb, gemb = ectx
        if not self.portable:
            f_mid, pm, pv, idx = block.apply({'params': bp}, feature, emb,
                                             method='prior_stage')
            return _ob((f_mid, pm, idx))
        from lvae_tpu.ops.pallas import trunk as ptk
        f_mid = ptk.convnext_adaln(feature, bp['resnet_front'], gemb,
                                   block.kernel_size,
                                   interpret=self.interpret)
        B, H, W, C = f_mid.shape
        Z = block.zdim
        pm, idx = ptk.prior_head(
            f_mid.reshape(B, H * W, C),
            bp['prior']['kernel'].reshape(C, 2 * Z),
            bp['prior']['bias'], self._scale_table(),
            interpret=self.interpret)
        return f_mid, pm.reshape(B, H, W, Z), idx.reshape(B, H, W, Z)

    def _fuse(self, block, bp, f_mid, pm, syms, ectx):
        emb, gemb = ectx
        if not self.portable:
            out = block.apply({'params': bp}, f_mid, pm, syms, emb,
                              method='fuse_stage')
            return _ob(out)
        from lvae_tpu.ops.pallas import trunk as ptk
        B, H, W, C = f_mid.shape
        Z = block.zdim
        f2 = ptk.fuse_zproj(
            f_mid.reshape(B, H * W, C), syms.reshape(B, H * W, Z),
            pm.reshape(B, H * W, Z),
            bp['z_proj']['kernel'].reshape(Z, C), bp['z_proj']['bias'],
            interpret=self.interpret).reshape(B, H, W, C)
        return ptk.convnext_adaln(f2, bp['resnet_end'], gemb,
                                  block.kernel_size,
                                  interpret=self.interpret)

    def _plain(self, block, bp, feature, ectx):
        emb, gemb = ectx
        if not self.portable:
            if getattr(block, 'requires_embedding', False):
                out = block.apply({'params': bp}, feature, emb)
            elif bp:
                out = block.apply({'params': bp}, feature)
            else:
                out = block(feature)
            return _ob(out)
        from lvae_tpu.ops.pallas import trunk as ptk
        if isinstance(block, common.ConvNeXtBlockAdaLN):
            return ptk.convnext_adaln(feature, bp, gemb, block.kernel_size,
                                      interpret=self.interpret)
        if isinstance(block, common.patch_upsample):
            y = ptk.conv1x1(feature, bp['conv'], interpret=self.interpret)
            return common.pixel_shuffle(y, block.rate)  # pure data movement
        if isinstance(block, common.upsample_nearest):
            return block(feature)                       # pure data movement
        raise NotImplementedError(
            f'portable trunk: unsupported block {type(block).__name__}')

    def _finish(self, feat):
        """clip -> [0,1] -> f16; in-kernel when portable so decoded PIXELS
        are bitwise-portable across executables too."""
        if self.portable:
            from lvae_tpu.ops.pallas import trunk as ptk
            return ptk.finish_image(feat, interpret=self.interpret)
        im_out = jnp.clip(feat.astype(jnp.float32), -1.0, 1.0) * 0.5 + 0.5
        return im_out.astype(jnp.float16)

    # ------------------------------------------------- the unified program

    def _build_codec(self, imH, imW):
        """One executable: prog(params, im, mode, want_image, states,
        packed, esc_pos, esc_val, lmb) -> (payload, image).

        mode==MODE_ENC: symbols from the posterior (backbone cond taken),
        payload is live, image is live iff want_image (the selfcheck).
        mode==MODE_DEC: symbols from the rANS decode kernels, payload dead.
        The shared trunk is straight-line — see the module docstring."""
        net, N, cd = self.net, self.N, self.compute_dtype
        nH, nW = imH // net.max_stride, imW // net.max_stride
        sizes = self._block_sizes(nH, nW)
        from lvae_tpu.models.qarv.model import _patch_escapes

        blocks = list(net.dec_blocks)
        stop = next(i for i, b in enumerate(blocks)
                    if isinstance(b, common.CompressionStopFlag))
        offsets_np = self.offsets_np

        def prog(params, im, mode, want_image, states, packed,
                 esc_pos, esc_val, lmb):
            is_dec = jnp.equal(mode, jnp.int32(self.MODE_DEC))
            emb, ectx = self._emb_ctx(params, lmb)
            emb_c = ectx[0]
            words = self.unpack_words(packed)

            # ---- encode-only backbone (bf16-able: its outputs only pick
            # which symbols are written; inside the cond so decode mode
            # skips it entirely)
            def _backbone():
                emb_bb = emb.astype(im.dtype if cd is None else jnp.dtype(cd))
                x = net.preprocess_input(im if cd is None else im.astype(cd))
                feats = []
                for i, blk in enumerate(net.enc_blocks):
                    bp = cast_tree(params.get(f'enc_blocks_{i}', {}), cd)
                    if isinstance(blk, common.SetKey):
                        feats.append(x.astype(jnp.float32))
                    elif getattr(blk, 'requires_embedding', False):
                        x = blk.apply({'params': bp}, x, emb_bb)
                    else:
                        x = blk.apply({'params': bp}, x) if bp else blk(x)
                return tuple(feats)

            bb_shapes = jax.eval_shape(_backbone)
            feats = jax.lax.cond(
                is_dec,
                lambda: tuple(jnp.zeros(s.shape, s.dtype) for s in bb_shapes),
                _backbone)
            enc_features = dict(zip(
                [b.key for b in net.enc_blocks
                 if isinstance(b, common.SetKey)], feats))

            # ---- shared trunk: straight-line f32, one call site per stage
            bias = params['bias']
            feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
            ptr = jnp.int32(0)
            li = 0
            gstart = 0
            syms_flat, idx_flat = [], []
            for k, blk in enumerate(blocks[:stop]):
                bp = params.get(f'dec_blocks_{k}', {})
                if getattr(blk, 'is_latent_block', False):
                    f_mid, pm, indexes = self._prior(blk, bp, feature, ectx)
                    nsym = sizes[li]
                    T = max((nsym + N - 1) // N, 1)
                    idx_i = indexes.reshape(-1).astype(jnp.int32)
                    idx_rows = jnp.pad(idx_i, (0, T * N - nsym)).reshape(T, N)
                    zshape = indexes.shape

                    def _dec(st_pt, idx_rows=idx_rows, nsym=nsym,
                             zshape=zshape, gs=gstart):
                        st, p = st_pt
                        syms_TN, st2, p2 = prd.rans_decode_block(
                            idx_rows, st, p, words, self.cdfs,
                            jnp.asarray(offsets_np), jnp.int32(nsym),
                            num_lanes=N, interpret=self.interpret)
                        z = syms_TN.reshape(-1)[:nsym].reshape(zshape)
                        z = _patch_escapes(z, esc_pos, esc_val,
                                           jnp.int32(gs))
                        return st2, p2, z

                    def _dec_skip(st_pt, zshape=zshape):
                        st, p = st_pt
                        return st, p, jnp.zeros(zshape, jnp.int32)

                    states, ptr, z_dec = jax.lax.cond(
                        is_dec, _dec, _dec_skip, (states, ptr))

                    def _enc(blk=blk, bp=bp, f_mid=f_mid, pm=pm,
                             ek=blk.enc_key):
                        qm = blk.apply({'params': bp}, f_mid,
                                       enc_features[ek], emb_c,
                                       method='posterior_qm')
                        return jnp.round(
                            qm.astype(jnp.float32) -
                            pm.astype(jnp.float32)).astype(jnp.int32)

                    syms_enc = jax.lax.cond(
                        is_dec,
                        lambda zshape=zshape: jnp.zeros(zshape, jnp.int32),
                        _enc)
                    # integer select: the ONLY junction between the
                    # direction-specific branches and the shared trunk
                    syms = _ob(jnp.where(is_dec, z_dec, syms_enc))
                    feature = self._fuse(blk, bp, f_mid, pm, syms, ectx)
                    syms_flat.append(syms.reshape(-1))
                    idx_flat.append(idx_i)
                    gstart += nsym
                    li += 1
                else:
                    feature = self._plain(blk, bp, feature, ectx)

            # ---- encode-only rANS encode kernel + payload assembly
            def _pack():
                return self.pack_payload(syms_flat, idx_flat)
            pshape = jax.eval_shape(_pack)
            payload = jax.lax.cond(
                is_dec,
                lambda: jnp.zeros(pshape.shape, pshape.dtype), _pack)

            # ---- synthesis tail (decode + selfcheck; image is the final
            # output — nothing feeds back into coding)
            def _tail(feat):
                for k2 in range(stop + 1, len(blocks)):
                    bp2 = params.get(f'dec_blocks_{k2}', {})
                    feat = self._plain(blocks[k2], bp2, feat, ectx)
                return self._finish(feat)

            image = jax.lax.cond(
                jnp.equal(want_image, jnp.int32(1)), _tail,
                lambda feat: jnp.zeros((1, imH, imW, 3), jnp.float16),
                feature)
            return payload, image

        return jax.jit(prog)

    # ------------------------------------------- batched serving program

    def _build_codec_batch(self, imH, imW, B):
        """Batch-B unified codec: prog(params, ims(B,), mode, want_image,
        states(B,1,N), packed(B,PK), esc_pos/esc_val(B,EB), lmb(B,)) ->
        (payloads (B,P), images (B,imH,imW,3)).

        Same single-executable bit-exactness discipline as _build_codec:
        ONE binary serves encode, selfcheck and decode via the runtime mode
        operand, so every image in the batch round-trips bitwise against
        its own encode-side reconstruction. The backbone/trunk convs run
        BATCHED on the MXU (better utilization than B sequential programs);
        the inherently sequential rANS kernels run per image inside the
        program; payload pull and stream push amortize the runtime's fixed
        per-transfer cost over B images. lmb is per-image (variable-rate
        serving in one batch). Streams keep the single-image wire format
        but, as with every compiled codec here, decode with the SAME
        batch-B executable (cross-program f32 drift is the round-3 lesson).
        """
        net, N, cd = self.net, self.N, self.compute_dtype
        nH, nW = imH // net.max_stride, imW // net.max_stride
        sizes = self._block_sizes(nH, nW)
        from lvae_tpu.models.qarv.model import _patch_escapes

        blocks = list(net.dec_blocks)
        stop = next(i for i, b in enumerate(blocks)
                    if isinstance(b, common.CompressionStopFlag))
        offsets_np = self.offsets_np

        def prog(params, im, mode, want_image, states, packed,
                 esc_pos, esc_val, lmb):
            is_dec = jnp.equal(mode, jnp.int32(self.MODE_DEC))
            emb, ectx = self._emb_ctx(params, lmb)             # (B, D)
            emb_c = ectx[0]
            words_b = [self.unpack_words(packed[b]) for b in range(B)]
            streams_B = jnp.stack(words_b)       # (B, W) for the multi kernel

            def _backbone():
                emb_bb = emb.astype(im.dtype if cd is None else jnp.dtype(cd))
                x = net.preprocess_input(im if cd is None else im.astype(cd))
                feats = []
                for i, blk in enumerate(net.enc_blocks):
                    bp = cast_tree(params.get(f'enc_blocks_{i}', {}), cd)
                    if isinstance(blk, common.SetKey):
                        feats.append(x.astype(jnp.float32))
                    elif getattr(blk, 'requires_embedding', False):
                        x = blk.apply({'params': bp}, x, emb_bb)
                    else:
                        x = blk.apply({'params': bp}, x) if bp else blk(x)
                return tuple(feats)

            bb_shapes = jax.eval_shape(_backbone)
            feats = jax.lax.cond(
                is_dec,
                lambda: tuple(jnp.zeros(s.shape, s.dtype) for s in bb_shapes),
                _backbone)
            enc_features = dict(zip(
                [b.key for b in net.enc_blocks
                 if isinstance(b, common.SetKey)], feats))

            bias = params['bias']
            feature = _ob(jnp.broadcast_to(bias, (B, nH, nW, bias.shape[-1])))
            # per-image lane states / stream pointers, carried across blocks
            st_b = tuple(states[b] for b in range(B))
            pt_b = tuple(jnp.int32(0) for _ in range(B))
            li = 0
            gstart = 0
            syms_flat, idx_flat = [], []       # per block: (B, nsym) arrays
            for k, blk in enumerate(blocks[:stop]):
                bp = params.get(f'dec_blocks_{k}', {})
                if getattr(blk, 'is_latent_block', False):
                    f_mid, pm, indexes = self._prior(blk, bp, feature, ectx)
                    nsym = sizes[li]
                    T = max((nsym + N - 1) // N, 1)
                    idx_i = indexes.reshape(B, -1).astype(jnp.int32)
                    zshape1 = indexes.shape[1:]

                    def _dec(carry, idx_i=idx_i, nsym=nsym,
                             zshape1=zshape1, T=T, gs=gstart):
                        # ONE grouped kernel invocation decodes all B
                        # chains (sublane-stacked states) instead of B
                        # chained calls — cuts the 9*B-kernel chain that
                        # dominated the batch decode leg (suite16-r4)
                        st_b, pt_b = carry
                        idx_rows = jnp.pad(
                            idx_i, ((0, 0), (0, T * N - nsym))
                        ).reshape(B, T, N)
                        sts = jnp.concatenate(
                            [s.reshape(1, N) for s in st_b], axis=0)
                        syms_B, st2, pt2 = prd.rans_decode_block_multi(
                            idx_rows, sts, jnp.stack(list(pt_b)),
                            streams_B, self.cdfs,
                            jnp.asarray(offsets_np), jnp.int32(nsym),
                            num_lanes=N, interpret=self.interpret)
                        outs = []
                        for b in range(B):
                            z = syms_B[b].reshape(-1)[:nsym].reshape(zshape1)
                            outs.append(_patch_escapes(
                                z, esc_pos[b], esc_val[b], jnp.int32(gs)))
                        return (tuple(st2[b].reshape(1, N)
                                      for b in range(B)),
                                tuple(pt2[b] for b in range(B)),
                                jnp.stack(outs))

                    def _dec_skip(carry, zshape1=zshape1):
                        st_b, pt_b = carry
                        return st_b, pt_b, jnp.zeros((B,) + zshape1,
                                                     jnp.int32)

                    st_b, pt_b, z_dec = jax.lax.cond(
                        is_dec, _dec, _dec_skip, (st_b, pt_b))

                    def _enc(blk=blk, bp=bp, f_mid=f_mid, pm=pm,
                             ek=blk.enc_key):
                        qm = blk.apply({'params': bp}, f_mid,
                                       enc_features[ek], emb_c,
                                       method='posterior_qm')
                        return jnp.round(
                            qm.astype(jnp.float32) -
                            pm.astype(jnp.float32)).astype(jnp.int32)

                    syms_enc = jax.lax.cond(
                        is_dec,
                        lambda zshape1=zshape1: jnp.zeros((B,) + zshape1,
                                                          jnp.int32),
                        _enc)
                    syms = _ob(jnp.where(is_dec, z_dec, syms_enc))
                    feature = self._fuse(blk, bp, f_mid, pm, syms, ectx)
                    syms_flat.append(syms.reshape(B, -1))
                    idx_flat.append(idx_i)
                    gstart += nsym
                    li += 1
                else:
                    feature = self._plain(blk, bp, feature, ectx)

            # encode-only: batched escape/layout ops + grouped multi-image
            # rANS encode kernels (sublane-stacked state chains)
            def _pack():
                return self.pack_payload_batch(syms_flat, idx_flat)
            pshape = jax.eval_shape(_pack)
            payload = jax.lax.cond(
                is_dec,
                lambda: jnp.zeros(pshape.shape, pshape.dtype), _pack)

            def _tail(feat):
                for k2 in range(stop + 1, len(blocks)):
                    bp2 = params.get(f'dec_blocks_{k2}', {})
                    feat = self._plain(blocks[k2], bp2, feat, ectx)
                return self._finish(feat)

            image = jax.lax.cond(
                jnp.equal(want_image, jnp.int32(1)), _tail,
                lambda feat: jnp.zeros((B, imH, imW, 3), jnp.float16),
                feature)
            return payload, image

        return jax.jit(prog)

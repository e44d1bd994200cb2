"""Single-program QRes-VAE codec (see qarv/fused.py for the design).

Same construction as the QARV fused codec minus the lambda conditioning:
encoder features are keyed by spatial resolution (reference:
qresvae/model.py:195-207) and the decode chain runs to the MSE output head.

The lossless (GaussianNLL) variant IS fused too: the pixel head is coded
as one extra "block" in the same interleaved stream — its H*W*3 symbols
(round(x - pm) against the 128-entry head scale table, reference:
qresvae/model.py:59-94) go through the same on-device encode kernel
(indexes biased into the concatenated encode table) and one extra Pallas
decode call (unbiased indexes against the separate head table). The head's
pm/plogv math runs in float32 with the UNCAST params on both sides, so the
decode-side grid positions match the encoder bit-exactly and the
reconstruction is exact; the decode program returns uint8 pixels (a float16
return could not represent the 1/255 grid exactly).
"""
import jax
import jax.numpy as jnp

from lvae_tpu.models import common
from lvae_tpu.models import entropy_coding as ec
from lvae_tpu.models.fused_base import FusedCodecBase, cast_tree, _ob
from lvae_tpu.ops.pallas import rans_decode as prd


class FusedQresCodec(FusedCodecBase):
    """Fused codec for HierarchicalVAENet (MSE or lossless-NLL head).

    Two trunk implementations share the one-executable structure (see
    qarv/fused.py): legacy (barrier-bracketed f32 XLA stages, bit-exact
    within one binary) and portable=True (fixed-block-spec Pallas kernels,
    ops/pallas/trunk.py — bitwise-deterministic ACROSS executables, so
    files decode in any process). Portable covers the plain-ConvNeXt /
    VDBlock-prior / z-proj latent blocks AND the lossless NLL pixel head;
    only the deconv upsampler (qres17m) is unsupported."""

    supports_portable = True

    def __init__(self, *args, head_scale_table=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.head_scale_table = (None if head_scale_table is None
                                 else jnp.asarray(head_scale_table,
                                                  jnp.float32))
        if self.head_index_base is not None:
            assert self.head_scale_table is not None
        if self.portable:
            for blk in self.net.dec_blocks:
                if isinstance(blk, common.deconv):
                    raise NotImplementedError(
                        'portable trunk: the deconv upsampler (qres17m) '
                        'has no portable kernel yet; use portable=False')

    def _latent_table(self):
        # cache NUMPY; jnp.asarray per use site (a jnp constant created in
        # one jit trace must not leak into another)
        tb = getattr(self, '_latent_table_np', None)
        if tb is None:
            tb = self.table.scale_table.astype(jnp.float32)
            self._latent_table_np = tb
        return jnp.asarray(tb)

    def _prior(self, block, bp, feature):
        if not self.portable:
            f_mid, pm, pv, idx = block.apply({'params': bp}, feature,
                                             method='prior_stage')
            return _ob((f_mid, pm, idx))
        from lvae_tpu.ops.pallas import trunk as ptk
        f_mid = ptk.convnext_plain(feature, bp['resnet_front'],
                                   block.kernel_size,
                                   interpret=self.interpret)
        pm, idx = ptk.qres_prior_head(
            f_mid, bp['prior'], block.kernel_size >= 3,
            self._latent_table(), interpret=self.interpret)
        return f_mid, pm, idx

    def _fuse(self, block, bp, f_mid, pm, syms):
        if not self.portable:
            out = block.apply({'params': bp}, f_mid, pm, syms,
                              method='fuse_stage')
            return _ob(out)
        from lvae_tpu.ops.pallas import trunk as ptk
        return ptk.qres_fuse(f_mid, syms, pm, bp, block.kernel_size,
                             interpret=self.interpret)

    def _plain(self, block, bp, feature):
        if not self.portable:
            out = (block.apply({'params': bp}, feature) if bp
                   else block(feature))
            return _ob(out)
        from lvae_tpu.ops.pallas import trunk as ptk
        if isinstance(block, common.MyConvNeXtBlock):
            return ptk.convnext_plain(feature, bp, block.kernel_size,
                                      interpret=self.interpret)
        if isinstance(block, common.patch_upsample):
            y = ptk.conv1x1(feature, bp['conv'], interpret=self.interpret)
            return common.pixel_shuffle(y, block.rate)  # pure data movement
        if isinstance(block, common.upsample_nearest):
            return block(feature)                       # pure data movement
        raise NotImplementedError(
            f'portable trunk: unsupported block {type(block).__name__}')

    def _head_tensors(self, params, feature):
        """Lossless pixel head -> (pm in bin units, scale indexes); trunk
        math (both directions recompute it), so portable mode runs it in
        kernels — incl. the FMA-sensitive round-to-grid chain."""
        net = self.net
        if not self.portable:
            pm, plogv = net.apply(
                {'params': params}, feature.astype(jnp.float32),
                method=net.out_codec_tensors)
            head_idx = ec.build_indexes(jnp.exp(plogv),
                                        self.head_scale_table)
            return _ob((pm, head_idx))
        from lvae_tpu.ops.pallas import trunk as ptk
        onp = params['out_net']
        rate = net.out_net.conv_mean.rate
        m = common.pixel_shuffle(ptk.conv1x1(
            feature, onp['conv_mean']['conv'], interpret=self.interpret),
            rate)
        r = common.pixel_shuffle(ptk.conv1x1(
            feature, onp['conv_scale']['conv'], interpret=self.interpret),
            rate)
        return ptk.nll_head(m, r, self.head_scale_table,
                            net.out_net.bin_size, interpret=self.interpret)

    def _head_recon(self, xs, pm):
        """(symbols + pm) * bin -> exact uint8 pixel grid."""
        net = self.net
        if not self.portable:
            x_hat = (xs.astype(jnp.float32) + pm) * net.out_net.bin_size
            im_out = jnp.clip(x_hat, -1.0, 1.0) * 0.5 + 0.5
            return jnp.round(im_out * 255).astype(jnp.uint8)
        from lvae_tpu.ops.pallas import trunk as ptk
        y = ptk.nll_recon(xs, pm, net.out_net.bin_size,
                          interpret=self.interpret)
        return y.astype(jnp.uint8)

    def _finish(self, feat):
        """MSE tail finish: clip -> [0,1] -> f16; in-kernel when portable
        (see qarv/fused.FusedQarvCodec._finish)."""
        if self.portable:
            from lvae_tpu.ops.pallas import trunk as ptk
            return ptk.finish_image(feat, interpret=self.interpret)
        im_out = jnp.clip(feat.astype(jnp.float32), -1.0, 1.0) * 0.5 + 0.5
        return im_out.astype(jnp.float16)

    # ------------------------------------------------- the unified program

    def _build_codec(self, imH, imW):
        """One executable for both directions (see qarv/fused.py for the
        bit-exactness rationale): prog(params, im, mode, want_image,
        states, packed, esc_pos, esc_val) -> (payload, image).

        For the MSE head, blocks after the last latent block form the
        synthesis tail (cond'd on want_image). For the lossless NLL head
        the WHOLE chain plus the head's pm/plogv math is trunk — the head
        indexes determine coding, so they must come from the shared
        straight-line f32 path; only the pixel-symbol source is
        mode-selected."""
        net, N, cd = self.net, self.N, self.compute_dtype
        nH, nW = imH // net.max_stride, imW // net.max_stride
        sizes = self._block_sizes(nH, nW)
        from lvae_tpu.models.qarv.model import _patch_escapes

        blocks = list(net.dec_blocks)
        last_latent = max(i for i, b in enumerate(blocks)
                          if getattr(b, 'is_latent_block', False))
        # lossless: the head consumes the FULL chain's feature -> no tail
        stop = len(blocks) if self.head_index_base is not None \
            else last_latent + 1
        offsets_np = self.offsets_np

        def prog(params, im, mode, want_image, states, packed,
                 esc_pos, esc_val):
            is_dec = jnp.equal(mode, jnp.int32(self.MODE_DEC))
            words = self.unpack_words(packed)

            def _backbone():
                x = net.preprocess_input(im if cd is None else im.astype(cd))
                feats = {}   # last feature per resolution wins (ref parity)
                for i, blk in enumerate(net.enc_blocks):
                    bp = cast_tree(params.get(f'enc_blocks_{i}', {}), cd)
                    x = blk.apply({'params': bp}, x) if bp else blk(x)
                    feats[int(x.shape[1])] = x.astype(jnp.float32)
                return tuple(feats.values())

            bb_shapes = jax.eval_shape(_backbone)
            feats = jax.lax.cond(
                is_dec,
                lambda: tuple(jnp.zeros(s.shape, s.dtype) for s in bb_shapes),
                _backbone)
            # keyed by spatial resolution (reference: qresvae/model.py:195)
            enc_features = {int(s.shape[1]): f
                            for s, f in zip(bb_shapes, feats)}

            bias = params['bias']
            feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
            ptr = jnp.int32(0)
            li = 0
            gstart = 0
            syms_flat, idx_flat = [], []
            for k, blk in enumerate(blocks[:stop]):
                bp = params.get(f'dec_blocks_{k}', {})
                if getattr(blk, 'is_latent_block', False):
                    f_mid, pm, indexes = self._prior(blk, bp, feature)
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

                    def _enc(blk=blk, bp=bp, f_mid=f_mid, pm=pm):
                        qm = blk.apply({'params': bp}, f_mid,
                                       enc_features[int(f_mid.shape[1])],
                                       method='posterior_qm')
                        return jnp.round(
                            qm.astype(jnp.float32) -
                            pm.astype(jnp.float32)).astype(jnp.int32)

                    syms_enc = jax.lax.cond(
                        is_dec,
                        lambda zshape=zshape: jnp.zeros(zshape, jnp.int32),
                        _enc)
                    syms = _ob(jnp.where(is_dec, z_dec, syms_enc))
                    feature = self._fuse(blk, bp, f_mid, pm, syms)
                    syms_flat.append(syms.reshape(-1))
                    idx_flat.append(idx_i)
                    gstart += nsym
                    li += 1
                else:
                    feature = self._plain(blk, bp, feature)

            if self.head_index_base is not None:
                # lossless pixel head: pm/indexes are trunk (shared, f32,
                # uncast params); only the symbol source is selected
                pm, head_idx = self._head_tensors(params, feature)
                nsym = imH * imW * 3
                T = (nsym + N - 1) // N
                idx_rows = jnp.pad(head_idx.reshape(-1).astype(jnp.int32),
                                   (0, T * N - nsym)).reshape(T, N)

                def _dec_head(st_pt, gs=gstart):
                    st, p = st_pt
                    syms_TN, st2, p2 = prd.rans_decode_block(
                        idx_rows, st, p, words, self.head_cdfs,
                        jnp.asarray(self.head_offsets_np), jnp.int32(nsym),
                        num_lanes=N, interpret=self.interpret)
                    xs = syms_TN.reshape(-1)[:nsym].reshape(pm.shape)
                    return st2, p2, _patch_escapes(
                        xs, esc_pos, esc_val, jnp.int32(gs))

                def _dec_head_skip(st_pt):
                    st, p = st_pt
                    return st, p, jnp.zeros(pm.shape, jnp.int32)

                states, ptr, xs_dec = jax.lax.cond(
                    is_dec, _dec_head, _dec_head_skip, (states, ptr))

                def _enc_head():
                    x = ((im.astype(jnp.float32) - 0.5) * 2.0) / \
                        net.out_net.bin_size
                    return jnp.round(x - pm).astype(jnp.int32)

                xs_enc = jax.lax.cond(
                    is_dec, lambda: jnp.zeros(pm.shape, jnp.int32),
                    _enc_head)
                xs = _ob(jnp.where(is_dec, xs_dec, xs_enc))
                syms_flat.append(xs.reshape(-1))
                idx_flat.append((head_idx + self.head_index_base)
                                .reshape(-1).astype(jnp.int32))

            def _pack():
                return self.pack_payload(syms_flat, idx_flat)
            pshape = jax.eval_shape(_pack)
            payload = jax.lax.cond(
                is_dec,
                lambda: jnp.zeros(pshape.shape, pshape.dtype), _pack)

            if self.head_index_base is not None:
                def _img_head():
                    return self._head_recon(xs, pm)
                image = jax.lax.cond(
                    jnp.equal(want_image, jnp.int32(1)), _img_head,
                    lambda: jnp.zeros((1, imH, imW, 3), jnp.uint8))
                return payload, image

            def _tail(feat):
                for k2 in range(stop, len(blocks)):
                    bp2 = params.get(f'dec_blocks_{k2}', {})
                    feat = self._plain(blocks[k2], bp2, feat)
                return self._finish(feat)

            image = jax.lax.cond(
                jnp.equal(want_image, jnp.int32(1)), _tail,
                lambda feat: jnp.zeros((1, imH, imW, 3), jnp.float16),
                feature)
            return payload, image

        return jax.jit(prog)

    # ------------------------------------------- batched serving program

    def _build_codec_batch(self, imH, imW, B):
        """Batch-B unified codec (see qarv/fused._build_codec_batch for the
        design and the decode-with-the-same-binary rule). Covers the MSE
        head AND the lossless NLL head — B images' pixel symbols are coded
        through per-image kernel chains in one executable."""
        net, N, cd = self.net, self.N, self.compute_dtype
        nH, nW = imH // net.max_stride, imW // net.max_stride
        sizes = self._block_sizes(nH, nW)
        from lvae_tpu.models.qarv.model import _patch_escapes

        blocks = list(net.dec_blocks)
        last_latent = max(i for i, b in enumerate(blocks)
                          if getattr(b, 'is_latent_block', False))
        stop = len(blocks) if self.head_index_base is not None \
            else last_latent + 1
        offsets_np = self.offsets_np

        def prog(params, im, mode, want_image, states, packed,
                 esc_pos, esc_val):
            is_dec = jnp.equal(mode, jnp.int32(self.MODE_DEC))
            words_b = [self.unpack_words(packed[b]) for b in range(B)]
            streams_B = jnp.stack(words_b)       # (B, W) for the multi kernel

            def _backbone():
                x = net.preprocess_input(im if cd is None else im.astype(cd))
                feats = {}   # last feature per resolution wins (ref parity)
                for i, blk in enumerate(net.enc_blocks):
                    bp = cast_tree(params.get(f'enc_blocks_{i}', {}), cd)
                    x = blk.apply({'params': bp}, x) if bp else blk(x)
                    feats[int(x.shape[1])] = x.astype(jnp.float32)
                return tuple(feats.values())

            bb_shapes = jax.eval_shape(_backbone)
            feats = jax.lax.cond(
                is_dec,
                lambda: tuple(jnp.zeros(s.shape, s.dtype) for s in bb_shapes),
                _backbone)
            enc_features = {int(s.shape[1]): f
                            for s, f in zip(bb_shapes, feats)}

            bias = params['bias']
            feature = _ob(jnp.broadcast_to(bias, (B, nH, nW, bias.shape[-1])))
            st_b = tuple(states[b] for b in range(B))
            pt_b = tuple(jnp.int32(0) for _ in range(B))
            li = 0
            gstart = 0
            syms_flat, idx_flat = [], []       # per block: (B, nsym)
            for k, blk in enumerate(blocks[:stop]):
                bp = params.get(f'dec_blocks_{k}', {})
                if getattr(blk, 'is_latent_block', False):
                    f_mid, pm, indexes = self._prior(blk, bp, feature)
                    nsym = sizes[li]
                    T = max((nsym + N - 1) // N, 1)
                    idx_i = indexes.reshape(B, -1).astype(jnp.int32)
                    zshape1 = indexes.shape[1:]

                    def _dec(carry, idx_i=idx_i, nsym=nsym,
                             zshape1=zshape1, T=T, gs=gstart):
                        # one grouped kernel call for all B chains (see
                        # qarv/fused.py batch _dec)
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

                    def _enc(blk=blk, bp=bp, f_mid=f_mid, pm=pm):
                        qm = blk.apply({'params': bp}, f_mid,
                                       enc_features[int(f_mid.shape[1])],
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
                    feature = self._fuse(blk, bp, f_mid, pm, syms)
                    syms_flat.append(syms.reshape(B, -1))
                    idx_flat.append(idx_i)
                    gstart += nsym
                    li += 1
                else:
                    feature = self._plain(blk, bp, feature)

            if self.head_index_base is not None:
                pm, head_idx = self._head_tensors(params, feature)
                nsym = imH * imW * 3
                T = (nsym + N - 1) // N
                pshape1 = pm.shape[1:]

                def _dec_head(carry, gs=gstart, T=T, nsym=nsym):
                    st_b, pt_b = carry
                    idx_rows = jnp.pad(
                        head_idx.reshape(B, -1).astype(jnp.int32),
                        ((0, 0), (0, T * N - nsym))).reshape(B, T, N)
                    sts = jnp.concatenate(
                        [s.reshape(1, N) for s in st_b], axis=0)
                    syms_B, st2, pt2 = prd.rans_decode_block_multi(
                        idx_rows, sts, jnp.stack(list(pt_b)),
                        streams_B, self.head_cdfs,
                        jnp.asarray(self.head_offsets_np),
                        jnp.int32(nsym), num_lanes=N,
                        interpret=self.interpret)
                    outs = []
                    for b in range(B):
                        xs = syms_B[b].reshape(-1)[:nsym].reshape(pshape1)
                        outs.append(_patch_escapes(
                            xs, esc_pos[b], esc_val[b], jnp.int32(gs)))
                    return (tuple(st2[b].reshape(1, N) for b in range(B)),
                            tuple(pt2[b] for b in range(B)),
                            jnp.stack(outs))

                def _dec_head_skip(carry):
                    st_b, pt_b = carry
                    return st_b, pt_b, jnp.zeros((B,) + pshape1, jnp.int32)

                st_b, pt_b, xs_dec = jax.lax.cond(
                    is_dec, _dec_head, _dec_head_skip, (st_b, pt_b))

                def _enc_head():
                    x = ((im.astype(jnp.float32) - 0.5) * 2.0) / \
                        net.out_net.bin_size
                    return jnp.round(x - pm).astype(jnp.int32)

                xs_enc = jax.lax.cond(
                    is_dec, lambda: jnp.zeros((B,) + pshape1, jnp.int32),
                    _enc_head)
                xs = _ob(jnp.where(is_dec, xs_dec, xs_enc))
                syms_flat.append(xs.reshape(B, -1))
                idx_flat.append((head_idx + self.head_index_base)
                                .reshape(B, -1).astype(jnp.int32))

            def _pack():
                return self.pack_payload_batch(syms_flat, idx_flat)
            pshape = jax.eval_shape(_pack)
            payload = jax.lax.cond(
                is_dec,
                lambda: jnp.zeros(pshape.shape, pshape.dtype), _pack)

            if self.head_index_base is not None:
                def _img_head():
                    return self._head_recon(xs, pm)
                image = jax.lax.cond(
                    jnp.equal(want_image, jnp.int32(1)), _img_head,
                    lambda: jnp.zeros((B, imH, imW, 3), jnp.uint8))
                return payload, image

            def _tail(feat):
                for k2 in range(stop, len(blocks)):
                    bp2 = params.get(f'dec_blocks_{k2}', {})
                    feat = self._plain(blocks[k2], bp2, feat)
                return self._finish(feat)

            image = jax.lax.cond(
                jnp.equal(want_image, jnp.int32(1)), _tail,
                lambda feat: jnp.zeros((B, imH, imW, 3), jnp.float16),
                feature)
            return payload, image

        return jax.jit(prog)

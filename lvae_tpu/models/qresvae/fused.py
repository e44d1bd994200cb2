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
    """Fused codec for HierarchicalVAENet (MSE or lossless-NLL head)."""

    def __init__(self, *args, head_scale_table=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.head_scale_table = (None if head_scale_table is None
                                 else jnp.asarray(head_scale_table,
                                                  jnp.float32))
        if self.head_index_base is not None:
            assert self.head_scale_table is not None

    def _prior(self, block, bp, feature):
        f_mid, pm, pv, idx = block.apply({'params': bp}, feature,
                                         method='prior_stage')
        return _ob((f_mid, pm, idx))

    def _fuse(self, block, bp, f_mid, pm, syms):
        out = block.apply({'params': bp}, f_mid, pm, syms,
                          method='fuse_stage')
        return _ob(out)

    def _plain(self, block, bp, feature):
        out = block.apply({'params': bp}, feature) if bp else block(feature)
        return _ob(out)

    # ------------------------------------------------------- encode side

    def _build_encode(self, imH, imW, selfcheck=False):
        net, cd = self.net, self.compute_dtype

        def enc_prog(params, im):
            # backbone-only reduced precision: decode never recomputes the
            # backbone's floats (symbols are read from the stream), so only
            # enc_blocks may run at compute_dtype; the trunk whose values
            # decode must reproduce bitwise stays f32 (see qarv/fused.py
            # module docstring for the hardware finding behind this).
            x = net.preprocess_input(im if cd is None else im.astype(cd))
            enc_features = {}
            for i, blk in enumerate(net.enc_blocks):
                bp = cast_tree(params.get(f'enc_blocks_{i}', {}), cd)
                x = blk.apply({'params': bp}, x) if bp else blk(x)
                enc_features[int(x.shape[1])] = x.astype(jnp.float32)

            nH, nW = imH // net.max_stride, imW // net.max_stride
            bias = params['bias']
            feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
            syms_flat, idx_flat = [], []
            for k, blk in enumerate(net.dec_blocks):
                bp = params.get(f'dec_blocks_{k}', {})
                if getattr(blk, 'is_latent_block', False):
                    f_mid, pm, indexes = self._prior(blk, bp, feature)
                    res = int(f_mid.shape[1])
                    qm = blk.apply({'params': bp}, f_mid, enc_features[res],
                                   method='posterior_qm')
                    syms = jnp.round(qm.astype(jnp.float32) -
                                     pm.astype(jnp.float32)).astype(jnp.int32)
                    syms = _ob(syms)
                    feature = self._fuse(blk, bp, f_mid, pm, syms)
                    syms_flat.append(syms.reshape(-1))
                    idx_flat.append(indexes.reshape(-1).astype(jnp.int32))
                else:
                    feature = self._plain(blk, bp, feature)
            if self.head_index_base is not None:
                # lossless pixel head: one more coded "block". f32 with
                # uncast params — must match the decode side bit-exactly.
                x_tgt = (im.astype(jnp.float32) - 0.5) * 2.0
                pm, plogv, x = net.apply(
                    {'params': params}, feature.astype(jnp.float32), x_tgt,
                    method=net.out_codec_tensors)
                head_idx = ec.build_indexes(jnp.exp(plogv),
                                            self.head_scale_table)
                syms = jnp.round(x - pm).astype(jnp.int32)
                syms_flat.append(syms.reshape(-1))
                idx_flat.append((head_idx + self.head_index_base)
                                .reshape(-1).astype(jnp.int32))
            payload = self.pack_payload(syms_flat, idx_flat)
            if selfcheck:
                if self.head_index_base is not None:
                    x_hat = (syms.astype(jnp.float32) + pm) * \
                        net.out_net.bin_size
                    im_out = jnp.clip(x_hat, -1.0, 1.0) * 0.5 + 0.5
                    return payload, jnp.round(im_out * 255).astype(jnp.uint8)
                im_out = jnp.clip(feature.astype(jnp.float32),
                                  -1.0, 1.0) * 0.5 + 0.5
                return payload, im_out.astype(jnp.float16)
            return payload

        return jax.jit(enc_prog)

    # ------------------------------------------------------- decode side

    def _build_decode(self, nH, nW):
        net, N = self.net, self.N
        sizes = self._block_sizes(nH, nW)
        imH, imW = nH * net.max_stride, nW * net.max_stride
        from lvae_tpu.models.qarv.model import _patch_escapes

        def dec_prog(params, states, packed, esc_pos, esc_val):
            # decode is always f32 (precision policy: qarv/fused.py)
            words = self.unpack_words(packed)
            bias = params['bias']
            feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
            ptr = jnp.int32(0)
            li = 0
            gstart = 0
            for k, blk in enumerate(net.dec_blocks):
                bp = params.get(f'dec_blocks_{k}', {})
                if getattr(blk, 'is_latent_block', False):
                    f_mid, pm, indexes = self._prior(blk, bp, feature)
                    nsym = sizes[li]
                    T = max((nsym + N - 1) // N, 1)
                    idx_rows = jnp.pad(indexes.reshape(-1).astype(jnp.int32),
                                       (0, T * N - nsym)).reshape(T, N)
                    syms_TN, states, ptr = prd.rans_decode_block(
                        idx_rows, states, ptr, words, self.cdfs,
                        jnp.asarray(self.offsets_np), jnp.int32(nsym),
                        num_lanes=N, interpret=self.interpret)
                    z = syms_TN.reshape(-1)[:nsym].reshape(indexes.shape)
                    z = _patch_escapes(z, esc_pos, esc_val, jnp.int32(gstart))
                    z = _ob(z)
                    feature = self._fuse(blk, bp, f_mid, pm, z)
                    gstart += nsym
                    li += 1
                else:
                    feature = self._plain(blk, bp, feature)
            if self.head_index_base is not None:
                # decode the pixel head against ITS table (unbiased idx)
                pm, plogv = net.apply(
                    {'params': params}, feature.astype(jnp.float32),
                    method=net.out_codec_tensors)
                head_idx = ec.build_indexes(jnp.exp(plogv),
                                            self.head_scale_table)
                nsym = imH * imW * 3
                T = (nsym + N - 1) // N
                idx_rows = jnp.pad(head_idx.reshape(-1).astype(jnp.int32),
                                   (0, T * N - nsym)).reshape(T, N)
                syms_TN, states, ptr = prd.rans_decode_block(
                    idx_rows, states, ptr, words, self.head_cdfs,
                    jnp.asarray(self.head_offsets_np), jnp.int32(nsym),
                    num_lanes=N, interpret=self.interpret)
                xs = syms_TN.reshape(-1)[:nsym].reshape(pm.shape)
                xs = _patch_escapes(xs, esc_pos, esc_val, jnp.int32(gstart))
                x_hat = (xs.astype(jnp.float32) + pm) * net.out_net.bin_size
                im = jnp.clip(x_hat, -1.0, 1.0) * 0.5 + 0.5
                return jnp.round(im * 255).astype(jnp.uint8)
            im = jnp.clip(feature.astype(jnp.float32), -1.0, 1.0) * 0.5 + 0.5
            return im.astype(jnp.float16)

        return jax.jit(dec_prog)

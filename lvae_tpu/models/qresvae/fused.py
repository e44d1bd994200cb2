"""Single-program QRes-VAE codec (see qarv/fused.py for the design).

Same construction as the QARV fused codec minus the lambda conditioning:
encoder features are keyed by spatial resolution (reference:
qresvae/model.py:195-207) and the decode chain runs to the MSE output head.
The lossless (GaussianNLL) variant is NOT fused — its head codes the image
pixels against a separate 128-entry table and stays on the staged paths.
"""
import jax
import jax.numpy as jnp

from lvae_tpu.models import common
from lvae_tpu.models.fused_base import FusedCodecBase, cast_tree, _ob
from lvae_tpu.ops.pallas import rans_decode as prd


class FusedQresCodec(FusedCodecBase):
    """Fused codec for HierarchicalVAENet (fixed-rate, MSE head)."""

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
            cparams = cast_tree(params, cd)
            x = net.preprocess_input(im if cd is None else im.astype(cd))
            enc_features = {}
            for i, blk in enumerate(net.enc_blocks):
                bp = cparams.get(f'enc_blocks_{i}', {})
                x = blk.apply({'params': bp}, x) if bp else blk(x)
                enc_features[int(x.shape[1])] = x

            nH, nW = imH // net.max_stride, imW // net.max_stride
            bias = cparams['bias']
            feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
            syms_flat, idx_flat = [], []
            for k, blk in enumerate(net.dec_blocks):
                bp = cparams.get(f'dec_blocks_{k}', {})
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
            payload = self.pack_payload(syms_flat, idx_flat)
            if selfcheck:
                im_out = jnp.clip(feature.astype(jnp.float32),
                                  -1.0, 1.0) * 0.5 + 0.5
                return payload, im_out.astype(jnp.float16)
            return payload

        return jax.jit(enc_prog)

    # ------------------------------------------------------- decode side

    def _build_decode(self, nH, nW):
        net, N, cd = self.net, self.N, self.compute_dtype
        sizes = self._block_sizes(nH, nW)
        from lvae_tpu.models.qarv.model import _patch_escapes

        def dec_prog(params, states, packed, esc_pos, esc_val):
            cparams = cast_tree(params, cd)
            words = self.unpack_words(packed)
            bias = cparams['bias']
            feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
            ptr = jnp.int32(0)
            li = 0
            gstart = 0
            for k, blk in enumerate(net.dec_blocks):
                bp = cparams.get(f'dec_blocks_{k}', {})
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
            im = jnp.clip(feature.astype(jnp.float32), -1.0, 1.0) * 0.5 + 0.5
            return im.astype(jnp.float16)

        return jax.jit(dec_prog)

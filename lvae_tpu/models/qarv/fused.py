"""Single-program QARV codec: ONE XLA program per direction.

Round-1 staged coding issued ~30 per-block stage dispatches on encode and
~20 (plus Pallas decode calls) on decode; through a tunneled TPU runtime the
per-call Python/dispatch overhead dominated latency. Here the whole encode
(backbone -> all latent blocks -> on-device interleaved-rANS encode kernel ->
packed payload) is one jitted program, and the whole decode (emb -> per-block
prior -> Pallas rANS decode -> fuse -> ... -> f16 image) is another. Host
traffic per image: ONE payload pull on encode, ONE stream push + ONE image
pull (or tiny sync) on decode.

Bit-exactness across the two programs: encode and decode are no longer the
same compiled executables, so every stage shared by both sides (lambda
embedding, prior, fuse, plain blocks) is bracketed with
jax.lax.optimization_barrier at identical interface points. XLA cannot fuse
across the barriers, so both programs contain the same HLO subgraphs with
the same inputs — validated bit-exact on real TPU hardware by
scripts/tpu-validate-codec.py and guarded by round-trip tests.

Precision policy (hardware-validated, round 3): barriers pin interface
VALUES, but bf16 MXU accumulation order can still differ between two
differently-shaped programs — running the shared trunk in bf16 desynced
the rANS stream on real TPU (runs/tpu-validate-r3.json: one flipped scale
index corrupts everything after it). f32 convs proved bit-stable across
program shapes. So compute_dtype='bfloat16' now means BACKBONE-ONLY bf16:
the encoder backbone's outputs only determine which symbols are WRITTEN
(decode reads them from the stream, never recomputes them), so it may run
at any precision; the lambda embedding, priors, fuses and synthesis tail —
everything whose floats decode must reproduce — always run f32.

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
    """Fused codec for VariableRateLossyVAENet (lambda-conditioned)."""

    # ---------------------------------------------------- shared stages
    # These appear in BOTH programs with identical barrier interfaces.

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

    def _prior(self, block, bp, feature, emb):
        f_mid, pm, pv, idx = block.apply({'params': bp}, feature, emb,
                                         method='prior_stage')
        return _ob((f_mid, pm, idx))

    def _fuse(self, block, bp, f_mid, pm, syms, emb):
        out = block.apply({'params': bp}, f_mid, pm, syms, emb,
                          method='fuse_stage')
        return _ob(out)

    def _plain(self, block, bp, feature, emb):
        if getattr(block, 'requires_embedding', False):
            out = block.apply({'params': bp}, feature, emb)
        elif bp:
            out = block.apply({'params': bp}, feature)
        else:
            out = block(feature)
        return _ob(out)

    # ------------------------------------------------------- encode side

    def _build_encode(self, imH, imW, selfcheck=False):
        """selfcheck=True additionally runs the synthesis tail with the
        ENCODE-side symbols and returns (payload, f16 image): if the decode
        program's image equals it bitwise, every shared stage (prior/fuse)
        reproduced the encoder's floats exactly — the fused-codec invariant
        validated on hardware by scripts/tpu-validate-codec.py."""
        net, N, cd = self.net, self.N, self.compute_dtype

        def enc_prog(params, im, lmb):
            # backbone-only reduced precision (see module docstring): the
            # trunk/prior/fuse path stays f32 so decode reproduces it bitwise
            emb = _ob(self._emb_stage(params, lmb))
            emb_c = emb.astype(jnp.float32)
            emb_bb = emb.astype(im.dtype if cd is None else jnp.dtype(cd))
            x = net.preprocess_input(im if cd is None else im.astype(cd))
            enc_features = {}
            for i, blk in enumerate(net.enc_blocks):
                bp = cast_tree(params.get(f'enc_blocks_{i}', {}), cd)
                if isinstance(blk, common.SetKey):
                    enc_features[blk.key] = x.astype(jnp.float32)
                elif getattr(blk, 'requires_embedding', False):
                    x = blk.apply({'params': bp}, x, emb_bb)
                else:
                    x = blk.apply({'params': bp}, x) if bp else blk(x)

            nH, nW = imH // net.max_stride, imW // net.max_stride
            bias = params['bias']
            feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
            syms_flat, idx_flat = [], []
            for k, blk in enumerate(net.dec_blocks):
                bp = params.get(f'dec_blocks_{k}', {})
                if getattr(blk, 'is_latent_block', False):
                    f_mid, pm, indexes = self._prior(blk, bp, feature, emb_c)
                    qm = blk.apply({'params': bp}, f_mid,
                                   enc_features[blk.enc_key], emb_c,
                                   method='posterior_qm')
                    syms = jnp.round(qm.astype(jnp.float32) -
                                     pm.astype(jnp.float32)).astype(jnp.int32)
                    syms = _ob(syms)
                    feature = self._fuse(blk, bp, f_mid, pm, syms, emb_c)
                    syms_flat.append(syms.reshape(-1))
                    idx_flat.append(indexes.reshape(-1).astype(jnp.int32))
                elif isinstance(blk, common.CompressionStopFlag):
                    if selfcheck:
                        continue
                    break
                else:
                    feature = self._plain(blk, bp, feature, emb_c)
            payload = self.pack_payload(syms_flat, idx_flat)
            if selfcheck:
                im_out = jnp.clip(feature.astype(jnp.float32),
                                  -1.0, 1.0) * 0.5 + 0.5
                return payload, im_out.astype(jnp.float16)
            return payload

        return jax.jit(enc_prog)

    # ------------------------------------------------------- decode side

    def _build_decode(self, nH, nW):
        net, N = self.net, self.N
        sizes = self._block_sizes(nH, nW)
        from lvae_tpu.models.qarv.model import _patch_escapes

        def dec_prog(params, states, packed, esc_pos, esc_val, lmb):
            # decode is always f32: it must reproduce the encode trunk's
            # floats bitwise (see module docstring precision policy)
            emb = _ob(self._emb_stage(params, lmb))
            emb_c = emb.astype(jnp.float32)
            words = self.unpack_words(packed)
            bias = params['bias']
            feature = _ob(jnp.broadcast_to(bias, (1, nH, nW, bias.shape[-1])))
            ptr = jnp.int32(0)
            li = 0
            gstart = 0
            for k, blk in enumerate(net.dec_blocks):
                bp = params.get(f'dec_blocks_{k}', {})
                if getattr(blk, 'is_latent_block', False):
                    f_mid, pm, indexes = self._prior(blk, bp, feature, emb_c)
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
                    feature = self._fuse(blk, bp, f_mid, pm, z, emb_c)
                    gstart += nsym
                    li += 1
                elif isinstance(blk, common.CompressionStopFlag):
                    continue
                else:
                    feature = self._plain(blk, bp, feature, emb_c)
            im = jnp.clip(feature.astype(jnp.float32), -1.0, 1.0) * 0.5 + 0.5
            return im.astype(jnp.float16)

        return jax.jit(dec_prog)

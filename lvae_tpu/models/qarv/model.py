"""QARV: continuously variable-rate hierarchical VAE (TPAMI 2023).

TPU-native re-design of reference lvae/models/qarv/model.py. The reference's
mode-switched mega-forward (qarv/model.py:77-121) becomes separate pure
methods sharing one parameter pytree, so each mode compiles to a clean XLA
program. Encode/decode bit-exactness uses the same shared-stage-program
design as QRes-VAE (see qresvae/model.py docstring).

Bitstream layout (byte-identical headers to the reference,
qarv/model.py:516-570):
    file   = [2H img_h img_w][body]
    body   = [f lmb][3H nB nH nW][pack_byte_strings(per-latent strings)]
"""
import math
import struct
from collections import defaultdict
from pathlib import Path
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
import flax.linen as nn

from lvae_tpu.models import common
from lvae_tpu.models.common import gelu
from lvae_tpu.models import entropy_coding as ec
from lvae_tpu.models.base import VAEModelBase, to_nhwc_batch, image_to_batch, batch_to_image
from lvae_tpu.ops import cdf as cdf_ops
from lvae_tpu.utils import coding


class VRLVBlockBase(nn.Module):
    """Variable-Rate Latent Variable Block (reference: qarv/model.py:19-125).

    All submodules are AdaLN-conditioned on the lambda embedding; posterior
    branch = 3 AdaLN blocks + concat merge.
    """
    width: int
    zdim: int
    enc_key: str
    enc_width: int
    embed_dim: int = 256
    kernel_size: int = 7
    mlp_ratio: float = 2

    is_latent_block = True
    eval_scale_bound = 0.11  # DiscretizedGaussian default table minimum

    def setup(self):
        w, ks, mr, ed = self.width, self.kernel_size, self.mlp_ratio, self.embed_dim
        B = common.ConvNeXtBlockAdaLN
        self.resnet_front = B(w, ed, kernel_size=ks, mlp_ratio=mr)
        self.resnet_end = B(w, ed, kernel_size=ks, mlp_ratio=mr)
        self.posterior0 = B(self.enc_width, ed, kernel_size=ks)
        self.posterior1 = B(w, ed, kernel_size=ks)
        self.posterior2 = B(w, ed, kernel_size=ks)
        self.post_merge = common.conv_k1s1(w, name='post_merge')
        self.posterior = common.conv_k3s1(self.zdim, name='posterior')
        self.z_proj = common.conv_k1s1(w, name='z_proj')
        self.prior = common.conv_k1s1(self.zdim * 2, name='prior')

    def coding_scale_table(self):
        return cdf_ops.default_gaussian_scale_table()

    # --- staged methods (shared by encode & decode) --------------------------

    def prior_stage(self, feature, emb):
        """p(z_i | z_<i): (feature_mid, pm, pv, coding indexes).

        Indexes are uint8 (64-entry scale table) — they cross the
        device->host boundary on every decode, and host link bandwidth is
        the latency bottleneck on tunneled TPU setups."""
        feature = self.resnet_front(feature, emb)
        # prior head stays float32 even under bf16 compute: pm/pv feed the
        # rate term and the coding indexes (reference forces f32 probability
        # math, entropy_coding.py:17)
        p_out = self.prior(feature).astype(jnp.float32)
        pm, plogv = jnp.split(p_out, 2, axis=-1)
        plogv = jax.nn.softplus(plogv + 2.3) - 2.3
        pv = jnp.exp(plogv)
        indexes = ec.build_indexes(
            pv, cdf_ops.default_gaussian_scale_table()).astype(jnp.uint8)
        return feature, pm, pv, indexes

    def posterior_qm(self, feature, enc_feature, emb):
        enc_feature = self.posterior0(enc_feature, emb)
        feature = self.posterior1(feature, emb)
        merged = jnp.concatenate([feature, enc_feature], axis=-1)
        merged = self.post_merge(merged)
        merged = self.posterior2(merged, emb)
        return self.posterior(merged)

    def posterior_symbols(self, feature, enc_feature, pm, emb):
        """Encode-side: quantized residual symbols.

        Returned as int16 plus an overflow flag (int16 halves the
        device->host pull; values above int16 range are astronomically rare
        with trained weights but the flag keeps coding exact — the caller
        falls back to the int32 tensor when set)."""
        qm = self.posterior_qm(feature, enc_feature, emb)
        syms = jnp.round(qm - pm).astype(jnp.int32)
        # overflow sentinel: legit values are clamped away from -32768, so the
        # host detects truncation from the int16 data alone (scalar flag
        # pulls would each pay the host-link's fixed transfer cost)
        sym16 = jnp.where(jnp.abs(syms) > 32000, -32768, syms).astype(jnp.int16)
        return sym16, syms

    def fuse_stage(self, feature, pm, symbols, emb):
        z = symbols.astype(jnp.float32) + pm.astype(jnp.float32)
        return self._fuse(feature, z, emb)

    def _fuse(self, feature, z, emb):
        feature = feature + self.z_proj(z.astype(feature.dtype))
        return self.resnet_end(feature, emb)

    # --- full-graph modes -----------------------------------------------------

    def forward_train(self, feature, enc_feature, emb, training: bool,
                      get_latent: bool = False):
        feature, pm, pv, _ = self.prior_stage(feature, emb)
        qm = self.posterior_qm(feature, enc_feature, emb)
        if training:
            noise = jax.random.uniform(self.make_rng('noise'), qm.shape,
                                       dtype=qm.dtype, minval=-0.5, maxval=0.5)
            z = qm + noise
            kl = -ec.gaussian_log_prob_mass(pm, pv, z, 1.0, 1e-6)
        else:
            z = ec.quantize_dequantize(qm, pm)
            probs = ec.discrete_likelihood(z, pv, pm, self.eval_scale_bound)
            kl = -jnp.log(probs)
        feature = self._fuse(feature, z, emb)
        stats = {'kl': kl}
        if get_latent:
            stats['z'] = jax.lax.stop_gradient(z)
        return feature, stats

    def forward_uncond(self, feature, emb, t=1.0, latent=None):
        feature, pm, pv, _ = self.prior_stage(feature, emb)
        if latent is None:
            eps = jax.random.normal(self.make_rng('sample'), pm.shape)
            u = jax.random.uniform(self.make_rng('sample'), pm.shape,
                                   minval=-0.5, maxval=0.5)
            z = pm + pv * eps * t + u * t
        else:
            z = latent
        return self._fuse(feature, z, emb)

    def __call__(self, feature, enc_feature, emb):  # for init
        f, _ = self.forward_train(feature, enc_feature, emb, training=False)
        return f


class VRLVBlockSmall(VRLVBlockBase):
    """Lighter posterior: concat-merge only (reference: qarv/model.py:127-161)."""

    def setup(self):
        w, ks, mr, ed = self.width, self.kernel_size, self.mlp_ratio, self.embed_dim
        B = common.ConvNeXtBlockAdaLN
        self.resnet_front = B(w, ed, kernel_size=ks, mlp_ratio=mr)
        self.resnet_end = B(w, ed, kernel_size=ks, mlp_ratio=mr)
        self.posterior2 = B(w, ed, kernel_size=ks, mlp_ratio=mr)
        self.post_merge = common.conv_k1s1(w, name='post_merge')
        self.posterior = common.conv_k3s1(self.zdim, name='posterior')
        self.z_proj = common.conv_k1s1(w, name='z_proj')
        self.prior = common.conv_k1s1(self.zdim * 2, name='prior')

    def posterior_qm(self, feature, enc_feature, emb):
        merged = jnp.concatenate([feature, enc_feature], axis=-1)
        merged = self.post_merge(merged)
        merged = self.posterior2(merged, emb)
        return self.posterior(merged)


MAX_LMB = 8192.0


import functools as _functools


@_functools.partial(jax.jit, static_argnames=('num_lanes',))
def _prep_idx_rows(indexes, num_lanes):
    """uint8 latent-shaped indexes -> (T, N) int32 rows for the decoder."""
    flat = indexes.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    T = max((n + num_lanes - 1) // num_lanes, 1)
    flat = jnp.pad(flat, (0, T * num_lanes - n))
    return flat.reshape(T, num_lanes)


@_functools.partial(jax.jit, static_argnames=('shape',))
def _take_reshape(syms_TN, shape):
    n = 1
    for v in shape:
        n *= v
    return syms_TN.reshape(-1)[:n].reshape(shape)


@jax.jit
def _widen_i32(x):
    """Device-side int16 -> int32 widen. Keeps the host->device push small
    while the downstream fuse program stays the SAME executable the encoder
    used (int32 input) — encode/decode bit-exactness requires identical
    compiled programs, not just identical values."""
    return x.astype(jnp.int32)


@jax.jit
def _patch_escapes(z_syms, esc_pos, esc_val, start):
    """Scatter true values for escape-coded positions (block-local).

    Out-of-block and padding (-1) entries are routed to index n and dropped,
    never clipped into [0, n-1]: a clipped write would collide with a real
    escape at block-local position 0 or n-1, and JAX duplicate-index scatter
    order is undefined."""
    shape = z_syms.shape
    flat = z_syms.reshape(-1)
    n = flat.shape[0]
    rel = esc_pos - start
    valid = (rel >= 0) & (rel < n) & (esc_pos >= 0)
    flat = flat.at[jnp.where(valid, rel, n)].set(esc_val, mode='drop')
    return flat.reshape(shape)


class VariableRateLossyVAENet(nn.Module):
    """The full QARV graph (reference: qarv/model.py:169-363)."""
    enc_blocks: Tuple[Any, ...]
    dec_blocks: Tuple[Any, ...]
    im_shift: float
    im_scale: float
    max_stride: int = 64
    lmb_range: Tuple[float, float] = (16.0, 2048.0)
    lmb_embed_dim: Tuple[int, int] = (256, 256)
    sin_period: int = 64

    def setup(self):
        width = self.dec_blocks[0].width
        self.bias = self.param('bias', nn.initializers.zeros_init(), (1, 1, 1, width))
        self.lmb_embed_0 = nn.Dense(self.lmb_embed_dim[1], name='lmb_embed_0')
        self.lmb_embed_1 = nn.Dense(self.lmb_embed_dim[1], name='lmb_embed_1')

    # --- lambda embedding (reference: qarv/model.py:275-287) ------------------

    def get_lmb_embedding(self, lmb):
        """lmb: (B,) float -> (B, embed_dim)."""
        scaled = jnp.log(lmb) * (self.sin_period / math.log(MAX_LMB))
        emb = common.sinusoidal_embedding(scaled, dim=self.lmb_embed_dim[0],
                                          max_period=self.sin_period)
        emb = self.lmb_embed_0(emb)
        emb = gelu(emb)
        emb = self.lmb_embed_1(emb)
        return emb

    # --- image pre/post -------------------------------------------------------

    def preprocess_input(self, im):
        return (im + self.im_shift) * self.im_scale

    def preprocess_target(self, im):
        return (im - 0.5) * 2.0

    def seed_feature(self, batch, h, w):
        return jnp.broadcast_to(self.bias, (batch, h, w, self.bias.shape[-1]))

    # --- encoder backbone -------------------------------------------------------

    def encode(self, x, emb, remat: bool = False):
        """Run encoder blocks; capture features at SetKey markers
        (reference: common.py:84-98). remat=True wraps each block in a
        lifted jax.checkpoint (gradient rematerialization): activations are
        recomputed block-by-block in the backward pass instead of stored,
        trading ~1 extra forward of FLOPs for O(1)-block activation memory
        — the TPU-native lever for larger per-chip batch sizes."""
        features = {}
        for block in self.enc_blocks:
            if isinstance(block, common.SetKey):
                features[block.key] = x
            elif getattr(block, 'requires_embedding', False):
                x = common.apply_block(block, x, emb, remat=remat)
            else:
                x = common.apply_block(block, x, remat=remat)
        return x, features

    # --- full forward (trainval) -----------------------------------------------

    def forward_end2end(self, im, lmb, training: bool = False,
                        get_latent: bool = False, remat: bool = False):
        x = self.preprocess_input(im)
        # keep the conditioning embedding in the compute dtype, otherwise
        # every AdaLN block silently re-promotes activations to f32
        emb = self.get_lmb_embedding(lmb).astype(x.dtype)
        _, enc_features = self.encode(x, emb, remat=remat)
        nB, xH, xW, _ = x.shape
        feature = self.seed_feature(nB, xH // self.max_stride, xW // self.max_stride)
        block_stats = []
        for block in self.dec_blocks:
            if getattr(block, 'is_latent_block', False):
                f_enc = enc_features[block.enc_key]
                feature, stats = common.apply_block(
                    block, feature, f_enc, emb, remat=remat,
                    method=lambda m, f, fe, e: m.forward_train(
                        f, fe, e, training, get_latent))
                block_stats.append(stats)
            elif getattr(block, 'requires_embedding', False):
                feature = common.apply_block(block, feature, emb, remat=remat)
            elif isinstance(block, common.CompressionStopFlag):
                continue
            else:
                feature = common.apply_block(block, feature, remat=remat)
        return feature, block_stats

    def forward_sampling(self, lmb, latents, bhw_repeat, t=1.0):
        """Conditional/unconditional sampling
        (reference: qarv/model.py:365-404). latents: list with None entries
        meaning 'sample from prior'."""
        emb = self.get_lmb_embedding(lmb)
        nB, nH, nW = bhw_repeat
        feature = self.seed_feature(nB, nH, nW)
        idx = 0
        for block in self.dec_blocks:
            if getattr(block, 'is_latent_block', False):
                feature = block.forward_uncond(feature, emb, t, latent=latents[idx])
                idx += 1
            elif getattr(block, 'requires_embedding', False):
                feature = block(feature, emb)
            elif isinstance(block, common.CompressionStopFlag):
                continue
            else:
                feature = block(feature)
        return feature

    # --- per-block staged programs ------------------------------------------------

    def encode_backbone(self, im, lmb):
        x = self.preprocess_input(im)
        emb = self.get_lmb_embedding(lmb)
        _, features = self.encode(x, emb)
        return emb, features

    def encode_features(self, im, emb):
        """Backbone taking a precomputed embedding: compress and decompress
        then share ONE compiled emb stage, so bit-exactness never depends on
        two differently-fused XLA programs agreeing (ADVICE r1)."""
        x = self.preprocess_input(im)
        _, features = self.encode(x, emb)
        return features

    def dec_prior_stage(self, feature, emb, k: int):
        return self.dec_blocks[k].prior_stage(feature, emb)

    def dec_posterior_symbols(self, feature, enc_feature, pm, emb, k: int):
        return self.dec_blocks[k].posterior_symbols(feature, enc_feature, pm, emb)

    def dec_fuse_stage(self, feature, pm, symbols, emb, k: int):
        return self.dec_blocks[k].fuse_stage(feature, pm, symbols, emb)

    def dec_plain_block(self, feature, emb, k: int):
        block = self.dec_blocks[k]
        if getattr(block, 'requires_embedding', False):
            return block(feature, emb)
        return block(feature)

    def __call__(self, im, lmb):  # init only
        feature, stats = self.forward_end2end(im, lmb, training=False)
        return feature


log2_e = math.log2(math.e)


class QarvModel(VAEModelBase):
    """User-facing QARV handle (reference: qarv/model.py:169-581)."""

    def __init__(self, net: VariableRateLossyVAENet, seed=0, example_hw=64,
                 log_images=()):
        self.lmb_range = tuple(float(v) for v in net.lmb_range)
        self.default_lmb = self.lmb_range[1]
        self._logging_images = list(log_images)
        # base init needs lmb arg -> custom init
        self.net = net
        dummy = jnp.zeros((1, example_hw, example_hw, 3), jnp.float32)
        dummy_lmb = jnp.full((1,), self.lmb_range[1], jnp.float32)
        self.params = net.init({'params': jax.random.PRNGKey(seed)}, dummy, dummy_lmb)['params']
        self.num_latents = sum(1 for b in net.dec_blocks
                               if getattr(b, 'is_latent_block', False))
        self._coder = ec.DiscretizedConditional(
            cdf_ops.default_gaussian_scale_table(), dist='gaussian')
        self.compressing = False

    # ----------------------------------------------------------------- training
    def sample_lmb(self, rng, n):
        """Per-image lambda, uniform in cube-root space
        (reference: qarv/model.py:258-264)."""
        low, high = self.lmb_range
        p = 3.0
        lo, hi = low ** (1 / p), high ** (1 / p)
        u = jax.random.uniform(rng, (n,), minval=lo, maxval=hi)
        return jnp.power(u, p)

    def loss_and_stats(self, params, im, rng, lmb=None, training=True,
                       compute_dtype=None, remat=False):
        """Pure loss function (jit/pjit-able). Samples per-image lambda when
        not provided (reference: qarv/model.py:317-363).

        compute_dtype='bfloat16' runs the conv stacks in bf16 (the TPU
        mixed-precision analog of the reference's AMP, trainer.py:361; no
        loss scaling needed on TPU). Master params stay float32 in the
        optimizer; the probability-mass rate term is float32-forced inside
        entropy_coding regardless. remat=True checkpoints every block
        (see VariableRateLossyVAENet.encode): ~1 extra forward of FLOPs for
        a ~depth-fold cut in activation HBM, enabling batch sizes that
        otherwise OOM a single chip."""
        nB, H, W, C = im.shape
        rng_lmb, rng_noise = jax.random.split(rng)
        if lmb is None:
            lmb = self.sample_lmb(rng_lmb, nB)
        net_params, net_im = params, im
        if compute_dtype is not None:
            cd = jnp.dtype(compute_dtype)
            net_params = jax.tree.map(
                lambda x: x.astype(cd) if x.dtype == jnp.float32 else x, params)
            net_im = im.astype(cd)
        x_hat, stats_all = self.net.apply(
            {'params': net_params}, net_im, lmb, training, False, remat,
            method=self.net.forward_end2end, rngs={'noise': rng_noise})
        x_hat = x_hat.astype(jnp.float32)
        ndims = float(C * H * W)
        kl = sum(jnp.sum(st['kl'].astype(jnp.float32), axis=(1, 2, 3))
                 for st in stats_all) / ndims
        x_target = (im - 0.5) * 2.0
        distortion = jnp.mean(jnp.square(x_hat - x_target), axis=(1, 2, 3))
        loss = jnp.mean(kl + lmb * distortion)
        im_hat = jnp.clip(x_hat, -1, 1) * 0.5 + 0.5
        im_mse = jnp.mean(jnp.square(im_hat - im))
        stats = {'loss': loss, 'bppix': jnp.mean(kl) * log2_e * C,
                 'mse': jnp.mean(distortion), 'mse_im': im_mse}
        return loss, stats

    def _check_input(self, im, raw=None):
        """Clear errors instead of opaque XLA reshape failures
        (reference asserts: qarv/model.py:219-220)."""
        assert im.ndim == 4 and im.shape[3] == 3, \
            f'expected NHWC rgb input, got {im.shape=}'
        s = self.net.max_stride
        assert im.shape[1] % s == 0 and im.shape[2] % s == 0, \
            f'input H/W {im.shape[1:3]} must be divisible by {s} ' \
            f'(use compress_file / pad_divisible_by for arbitrary sizes)'
        if isinstance(raw, np.ndarray):  # host data: range check is cheap
            assert raw.min() >= 0.0 and raw.max() <= 1.0, \
                'input values must be in [0, 1]'

    def forward(self, im, lmb=None, return_rec=False):
        raw = im
        im = to_nhwc_batch(im)
        self._check_input(im, raw=raw)
        nB = im.shape[0]
        if lmb is None:
            lmb = self.default_lmb
        lmb_arr = jnp.full((nB,), float(lmb), jnp.float32) \
            if np.ndim(lmb) == 0 else jnp.asarray(lmb, jnp.float32)
        loss, stats = self._jit_eval(self.params, im, lmb_arr)
        # one device->host fetch for all stat scalars (per-key float(v)
        # pays the runtime's fixed per-transfer floor once per key)
        from lvae_tpu import parallel
        stats = {k: float(v)
                 for k, v in parallel.fast_device_get(stats).items()}
        stats['psnr'] = -10 * math.log10(max(stats.pop('mse_im'), 1e-12))
        if return_rec:
            stats['im_hat'] = np.asarray(self.reconstruct(im, lmb_arr))
        return stats

    @property
    def _jit_eval(self):
        if not hasattr(self, '_jit_eval_fn'):
            def f(params, im, lmb):
                return self.loss_and_stats(params, im, jax.random.PRNGKey(0),
                                           lmb=lmb, training=False)
            self._jit_eval_fn = jax.jit(f)
        return self._jit_eval_fn

    def reconstruct(self, im, lmb_arr):
        if not hasattr(self, '_jit_rec_fn'):
            def f(params, im, lmb):
                x_hat, _ = self.net.apply({'params': params}, im, lmb, False,
                                          False, method=self.net.forward_end2end,
                                          rngs={'noise': jax.random.PRNGKey(0)})
                return jnp.clip(x_hat, -1, 1) * 0.5 + 0.5
            self._jit_rec_fn = jax.jit(f)
        return self._jit_rec_fn(self.params, to_nhwc_batch(im), lmb_arr)

    # ----------------------------------------------------------------- sampling
    def _expand_lmb(self, lmb, n):
        if np.ndim(lmb) == 0:
            return jnp.full((n,), float(lmb), jnp.float32)
        return jnp.asarray(lmb, jnp.float32)

    def conditional_sample(self, lmb, latents, bhw_repeat=None, t=1.0, seed=0):
        """(reference: qarv/model.py:365-395)"""
        if latents[0] is None:
            assert bhw_repeat is not None
            nB, nH, nW = bhw_repeat
        else:
            assert len(latents) == self.num_latents
            nB, nH, nW = latents[0].shape[0], latents[0].shape[1], latents[0].shape[2]
        lmb_arr = self._expand_lmb(lmb, nB)
        feature = self.net.apply(
            {'params': self.params}, lmb_arr, list(latents), (nB, nH, nW), t,
            method=self.net.forward_sampling,
            rngs={'sample': jax.random.PRNGKey(seed)})
        return np.clip(np.asarray(feature), -1, 1) * 0.5 + 0.5

    def unconditional_sample(self, lmb, bhw_repeat, t=1.0, seed=0):
        return self.conditional_sample(lmb, [None] * self.num_latents,
                                       bhw_repeat=bhw_repeat, t=t, seed=seed)

    def forward_get_latents(self, im, lmb=None):
        """Per-block z and kl (progressive-decoding studies,
        reference: scripts/qarv/robust-decoding.py:43-60)."""
        im = to_nhwc_batch(im)
        lmb = self.default_lmb if lmb is None else lmb
        lmb_arr = self._expand_lmb(lmb, im.shape[0])
        _, stats_all = self.net.apply(
            {'params': self.params}, im, lmb_arr, False, True,
            method=self.net.forward_end2end,
            rngs={'noise': jax.random.PRNGKey(0)})
        return [{k: np.asarray(v) for k, v in st.items()} for st in stats_all]

    def study(self, save_dir, **kwargs):
        """Sample/reconstruction grids for logging
        (reference: qarv/model.py:406-425)."""
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        for k in (1, 2):
            ims = self.unconditional_sample(self.default_lmb, bhw_repeat=(6, k, k))
            grid = np.concatenate(list(ims), axis=1)
            batch_to_image(grid[None]).save(
                save_dir / f'samples_k{k}_hw{ims.shape[1]}.png')
        for imname in self._logging_images:
            impath = Path('images') / imname
            if not impath.is_file():
                continue
            im = image_to_batch(Image.open(impath))
            rec = np.asarray(self.reconstruct(
                im, self._expand_lmb(self.default_lmb, 1)))
            side = np.concatenate([np.asarray(im)[0], rec[0]], axis=1)
            batch_to_image(side[None]).save(save_dir / imname)

    # ----------------------------------------------------------------- eval
    def self_evaluate(self, img_dir, lmb_range=None, steps=8, log_dir=None,
                      shape_buckets=0):
        """Forward-only lambda sweep (reference: qarv/model.py:427-507).

        shape_buckets > 0 pads images into at most that many (H, W) buckets
        so a mixed-shape validation set compiles a BOUNDED number of XLA
        programs (same mechanism as imcoding_evaluate); metrics are masked
        to the true image region. 0 keeps exact per-stride-padded-shape
        programs (one per distinct padded shape)."""
        img_paths = sorted(p for p in Path(img_dir).rglob('*.*')
                           if p.suffix.lower() in coding.IMAGE_SUFFIXES)
        buckets = None
        if shape_buckets:
            s = self.net.max_stride
            sizes = []
            for p in img_paths:
                with Image.open(p) as img:
                    sizes.append((img.height, img.width))
            buckets = coding.choose_shape_buckets(sizes, div=s,
                                                  max_buckets=shape_buckets)
        start, end = self.lmb_range if lmb_range is None else lmb_range
        lambdas = np.exp(np.linspace(math.log(start), math.log(end), steps))
        all_lmb_stats = defaultdict(list)
        for lmb in lambdas.tolist():
            results = self._self_evaluate(img_paths, lmb, log_dir=log_dir,
                                          buckets=buckets)
            for k, v in results.items():
                all_lmb_stats[k].append(v)
        return dict(all_lmb_stats)

    def _eval_stats_prog(self, padH, padW):
        """Jitted forward-eval stats, keyed on the PADDED device shape (not
        the original image shape — distinct originals that pad to one shape
        share one executable): reconstruction metrics and ALL KL reductions
        happen ON DEVICE with the true (imgh, imgw) crop bounds passed as
        operands; the host pulls 3 scalars + one (total_z,) channel-bpp
        vector. (Round-1 pulled the full image and every block's KL tensor
        twice — ~20 tunneled fetches per image made the lambda-sweep eval
        minutes-long.) Input is the edge-padded raw uint8 image (4x smaller
        push; u8/255 matches the host normalization)."""
        if not hasattr(self, '_eval_stats_cache'):
            self._eval_stats_cache = {}
        key = (padH, padW)
        if key in self._eval_stats_cache:
            return self._eval_stats_cache[key]
        net = self.net
        assert padH % net.max_stride == 0 and padW % net.max_stride == 0

        def f(params, pad_u8, lmb_arr, imgh, imgw):
            im = pad_u8.astype(jnp.float32) / 255.0
            x_hat, stats_all = net.apply(
                {'params': params}, im, lmb_arr, False, False,
                method=net.forward_end2end,
                rngs={'noise': jax.random.PRNGKey(0)})
            # mask out the padded region (the crop bounds are operands, so
            # every original shape in this bucket shares the executable)
            mask = ((jnp.arange(padH)[None, :, None, None] < imgh) &
                    (jnp.arange(padW)[None, None, :, None] < imgw))
            npix = (imgh * imgw * 3).astype(jnp.float32)
            x_tgt = (im - 0.5) * 2.0
            distortion = jnp.sum(jnp.square(x_hat - x_tgt) * mask) / npix
            fake = jnp.clip(x_hat, -1, 1) * 0.5 + 0.5
            mse = jnp.sum(jnp.square(im - fake) * mask) / npix
            kl_total = sum(jnp.sum(st['kl']) for st in stats_all)
            ch_bpp = jnp.concatenate([
                st['kl'].sum(axis=(1, 2)).mean(0) / (padH * padW) * log2_e
                for st in stats_all])
            return kl_total, distortion, mse, ch_bpp

        self._eval_stats_cache[key] = jax.jit(f)
        return self._eval_stats_cache[key]

    def _self_evaluate(self, img_paths, lmb: float, log_dir=None,
                       buckets=None):
        accum = defaultdict(float)
        channel_bpp_sums = defaultdict(lambda: 0.0)
        zdims = [blk.zdim for blk in self.net.dec_blocks
                 if getattr(blk, 'is_latent_block', False)]
        edges = np.cumsum([0] + zdims)
        count = 0
        s = self.net.max_stride
        for impath in img_paths:
            img = Image.open(impath).convert('RGB')
            imgh, imgw = img.height, img.width
            if buckets is not None:
                padH, padW = coding.bucket_for(imgh, imgw, buckets)
            else:
                padH, padW = imgh + (-imgh % s), imgw + (-imgw % s)
            pad_u8 = np.asarray(coding.pad_to_shape(img, padH, padW),
                                dtype=np.uint8)[None]
            lmb_arr = self._expand_lmb(lmb, 1)
            fn = self._eval_stats_prog(padH, padW)
            kl_total, distortion, mse, ch = jax.device_get(
                fn(self.params, pad_u8, lmb_arr,
                   jnp.int32(imgh), jnp.int32(imgw)))
            kl = float(kl_total) / (3 * imgh * imgw)
            bpp_estimated = kl * log2_e * 3
            mse = float(mse)
            psnr = -10 * math.log10(max(mse, 1e-12))
            count += 1
            accum['loss'] += kl + lmb * float(distortion)
            accum['bpp'] += bpp_estimated
            accum['psnr'] += psnr
            if log_dir is not None:
                for i in range(len(zdims)):
                    channel_bpp_sums[i] = channel_bpp_sums[i] + \
                        np.asarray(ch[edges[i]:edges[i + 1]])
        avg = {k: v / count for k, v in accum.items()}
        avg['lambda'] = lmb
        if log_dir is not None:
            self._log_channel_stats(channel_bpp_sums, count, Path(log_dir), lmb)
        return avg

    @staticmethod
    def _log_channel_stats(channel_bpp_sums, count, log_dir, lmb):
        """(reference: qarv/model.py:475-489)"""
        msg = '=' * 64 + '\n'
        msg += '---- row: latent blocks, colums: channels, avg over images ----\n'
        keys = sorted(channel_bpp_sums.keys())
        for k in keys:
            avg = channel_bpp_sums[k] / count
            msg += ''.join(f'{a:<7.4f} ' for a in np.atleast_1d(avg).tolist()) + '\n'
        msg += '---- colums: latent blocks, avg over images ----\n'
        block_bpps = [float(np.sum(channel_bpp_sums[k] / count)) for k in keys]
        msg += ''.join(f'{a:<7.4f} ' for a in block_bpps) + '\n'
        log_dir.mkdir(parents=True, exist_ok=True)
        with open(log_dir / f'channel-bppix-lmb{round(lmb)}.txt', 'a') as f:
            print(msg, file=f)
        with open(log_dir / 'all_lmb_channel_stats.txt', 'a') as f:
            print(msg, file=f)

    @property
    def _jit_e2e_eval(self):
        if not hasattr(self, '_jit_e2e_fn'):
            def f(params, im, lmb):
                return self.net.apply({'params': params}, im, lmb, False, False,
                                      method=self.net.forward_end2end,
                                      rngs={'noise': jax.random.PRNGKey(0)})
            self._jit_e2e_fn = jax.jit(f)
        return self._jit_e2e_fn

    # ------------------------------------------------------------- compression
    def compress_mode(self, mode=True, coder='fused', num_lanes=128,
                      esc_cap=8192, compute_dtype=None, portable=False,
                      max_program_batch=None, word_cap=None):
        """Prepare entropy coding.

        coder='host'   per-block C++ rANS (rate-identical to the reference's
                       stream layout; many host round-trips)
        coder='device' staged per-block programs + Pallas on-device decode
                       (round-1 path, kept as the fused path's oracle)
        coder='fused'  ONE XLA program per direction with on-device rANS in
                       both (models/qarv/fused.py) — the production path.
        compute_dtype='bfloat16' runs the fused ENCODER BACKBONE in bf16;
        the trunk/priors/fuses/tail always stay f32 — r3 hardware
        validation showed cross-program bf16 trunk numerics desync the
        rANS stream (see qarv/fused.py docstring, runs/tpu-validate-r3).
        max_program_batch caps the per-executable serving batch: larger
        compress_batch requests run as balanced pipelined chunks (the
        B=8 binary cliffs ~2x per image on v5e, runs/suite13-r3.json).
        word_cap caps the coded stream length in 16-bit words, shrinking
        every word buffer from the ~2-words/symbol worst case to the
        operating point's real range (fused_base.FusedCodecBase.__init__);
        streams that overflow it raise OverflowError."""
        assert coder in ('host', 'device', 'fused')
        if mode:
            self._coder.update()
            self._build_stage_fns()
            self.coder_kind = coder
            if coder == 'device':
                from lvae_tpu.ops.pallas import rans_decode as prd
                cdf_np, off_np = prd.prepare_device_cdf(self._coder._cdf_table)
                self._dev_cdfs = jnp.asarray(cdf_np)
                self._dev_offs = jnp.asarray(off_np)
                self.num_lanes = 128
            elif coder == 'fused':
                # codec objects are cached ACROSS compress_mode calls,
                # keyed by their full configuration: switching modes
                # (f32 <-> bf16 <-> portable) must not discard compiled
                # executables — bench.py precompiles every section's
                # programs during the first-fetch stall and re-enters each
                # mode later (VERDICT r4 item 1a)
                if not hasattr(self, '_fused_codecs'):
                    self._fused_codecs = {}
                self._fused_cfg = dict(
                    esc_cap=esc_cap, compute_dtype=compute_dtype,
                    portable=portable, max_program_batch=max_program_batch,
                    word_cap=word_cap,
                    interpret=jax.default_backend() == 'cpu')
                self.num_lanes = num_lanes   # int, or 'auto' (by lambda)
                self._fused = self._get_fused(
                    num_lanes if num_lanes != 'auto' else 128)
        self.compressing = mode

    def _get_fused(self, n_lanes: int, portable=None):
        """Codec for (lane count, current cfg); ``portable`` overrides the
        cfg's trunk kind — decode routes by the STREAM's marker bit, and
        compress_file defaults to portable streams."""
        cfg = dict(self._fused_cfg)
        if portable is not None:
            cfg['portable'] = portable
        key = (n_lanes,) + tuple(sorted(cfg.items()))
        codec = self._fused_codecs.get(key)
        if codec is None:
            from lvae_tpu.models.qarv.fused import FusedQarvCodec
            codec = FusedQarvCodec(self.net, self._coder._cdf_table,
                                   num_lanes=n_lanes, **cfg)
            self._fused_codecs[key] = codec
        return codec

    @staticmethod
    def _auto_lanes(lmb: float) -> int:
        """Deterministic rate-adaptive lane count (num_lanes='auto').

        The interleaved-rANS stream carries a fixed per-image flush of
        ~(3.5*N + N/4 + 10) bytes (compact lane states, utils/coding
        .pack_states), so low-rate streams use fewer lanes to keep the
        overhead under ~1% of the payload; fewer lanes = more sequential
        kernel rows, so high-rate streams keep 128 for latency. The choice
        is carried in the stream header's lane field — decode routes by
        it, so any compressor-side policy stays decodable."""
        if lmb <= 48:
            return 16
        if lmb <= 384:
            return 32
        if lmb <= 1536:
            return 64
        return 128

    def _block_params(self, k):
        """Per-block parameter subtree. Stage programs take ONLY their
        block's parameters: dispatching the full model tree costs ~10ms of
        argument marshaling per call on tunneled TPU runtimes."""
        return self.params.get(f'dec_blocks_{k}', {})

    def _build_stage_fns(self):
        if hasattr(self, '_stage_fns'):
            return
        net = self.net

        def backbone(params, im, emb):
            return net.apply({'params': params}, im, emb,
                             method=net.encode_features)

        def emb_fn(e0, e1, lmb):
            scaled = jnp.log(lmb) * (net.sin_period / math.log(MAX_LMB))
            x = common.sinusoidal_embedding(scaled, dim=net.lmb_embed_dim[0],
                                            max_period=net.sin_period)
            x = jnp.dot(x, e0['kernel']) + e0['bias']
            x = jax.nn.gelu(x, approximate=False)
            return jnp.dot(x, e1['kernel']) + e1['bias']

        # `block` is a static arg (hashable module spec); equal block configs
        # share compiled executables
        def prior(block, bp, feature, emb):
            return block.apply({'params': bp}, feature, emb,
                               method=block.prior_stage)

        def post_sym(block, bp, feature, enc_f, pm, emb):
            return block.apply({'params': bp}, feature, enc_f, pm, emb,
                               method=block.posterior_symbols)

        def fuse(block, bp, feature, pm, symbols, emb):
            return block.apply({'params': bp}, feature, pm, symbols, emb,
                               method=block.fuse_stage)

        def plain(block, bp, feature, emb):
            if getattr(block, 'requires_embedding', False):
                return block.apply({'params': bp}, feature, emb)
            return block.apply({'params': bp}, feature)

        def concat_packed(sym_list, idx_list):
            """Pack all int16 symbols + uint8 indexes into ONE uint8 buffer:
            a single host pull instead of two (fixed per-transfer cost)."""
            syms = jnp.concatenate([a.reshape(-1) for a in sym_list])
            idx = jnp.concatenate([a.reshape(-1) for a in idx_list])
            sym_bytes = jax.lax.bitcast_convert_type(syms, jnp.uint8).reshape(-1)
            return jnp.concatenate([sym_bytes, idx])

        def finish(feature):
            # final image crosses the host link: f16 halves the transfer at
            # a ~77dB error floor (<=0.005dB PSNR impact at codec quality)
            im = jnp.clip(feature, -1.0, 1.0) * 0.5 + 0.5
            return im.astype(jnp.float16)

        self._stage_fns = {
            'finish': jax.jit(finish),
            'backbone': jax.jit(backbone),
            'emb': jax.jit(emb_fn),
            'prior': jax.jit(prior, static_argnums=0),
            'post_sym': jax.jit(post_sym, static_argnums=0),
            'fuse': jax.jit(fuse, static_argnums=0),
            'plain': jax.jit(plain, static_argnums=0),
            'concat_packed': jax.jit(concat_packed),
        }

    def compress(self, im, lmb=None, portable=None):
        """Compress one image -> bytes (reference: qarv/model.py:516-529).

        ``portable`` (fused coder only) overrides the compress_mode trunk
        kind for this stream: True codes with the cross-executable
        bitwise-deterministic Pallas trunk (ops/pallas/trunk.py), so the
        stream decodes in ANY process — compress_file passes True by
        default (decode-anywhere file semantics, like the reference's CPU
        coder: lvae/models/qarv/model.py:572-581)."""
        assert self.compressing, 'call compress_mode() first'
        raw = im
        im = to_nhwc_batch(im)
        self._check_input(im, raw=raw)
        nB, imH, imW, _ = im.shape
        assert nB == 1, f'only a single image is supported, got {im.shape=}'
        lmb = float(lmb) if lmb is not None else float(self.default_lmb)
        # struct 'f' stores float32; use the same rounded value on both sides
        lmb_f32 = struct.unpack('f', struct.pack('f', lmb))[0]
        if getattr(self, 'coder_kind', 'host') == 'fused':
            nH, nW = imH // self.net.max_stride, imW // self.net.max_stride
            n = (self._auto_lanes(lmb_f32) if self.num_lanes == 'auto'
                 else self.num_lanes)
            fused = self._get_fused(n, portable=portable)
            if portable is None:
                self._fused = fused
            body = fused.encode(self.params, jnp.asarray(im),
                                jnp.full((1,), lmb_f32, jnp.float32))
            return (struct.pack('f', lmb_f32) + struct.pack('3H', nB, nH, nW)
                    + body)
        fns, params = self._stage_fns, self.params
        lmb_arr = jnp.full((nB,), lmb_f32, jnp.float32)
        # same compiled emb stage as decompress (bit-exactness by construction)
        emb = fns['emb'](params['lmb_embed_0'], params['lmb_embed_1'], lmb_arr)
        enc_features = fns['backbone'](params, im, emb)
        nH, nW = imH // self.net.max_stride, imW // self.net.max_stride
        feature = jnp.broadcast_to(params['bias'],
                                   (nB, nH, nW, params['bias'].shape[-1]))
        sym16_list, sym32_list, idx_list = [], [], []
        for k, block in enumerate(self.net.dec_blocks):
            bp = self._block_params(k)
            if getattr(block, 'is_latent_block', False):
                f_mid, pm, pv, indexes = fns['prior'](block, bp, feature, emb)
                sym16, sym32 = fns['post_sym'](
                    block, bp, f_mid, enc_features[block.enc_key], pm, emb)
                feature = fns['fuse'](block, bp, f_mid, pm, sym32, emb)
                sym16_list.append(sym16)
                sym32_list.append(sym32)
                idx_list.append(indexes)
            elif isinstance(block, common.CompressionStopFlag):
                break
            else:
                feature = fns['plain'](block, bp, feature, emb)
        assert len(sym16_list) == self.num_latents
        # everything above is async; pull symbols+indexes in ONE fused
        # transfer (the host link's fixed per-transfer cost dominates)
        packed = np.asarray(fns['concat_packed'](sym16_list, idx_list))
        total = sum(int(np.prod(s.shape)) for s in sym16_list)
        flat_syms = packed[:2 * total].view(np.int16)
        flat_idx = packed[2 * total:]
        sizes = [int(np.prod(s.shape)) for s in sym16_list]
        edges = np.cumsum([0] + sizes)
        syms_per_block, idx_per_block = [], []
        for i in range(self.num_latents):
            syms = flat_syms[edges[i]:edges[i + 1]].astype(np.int32)
            if (syms == -32768).any():  # sentinel: int16 was lossy here
                syms = np.asarray(sym32_list[i]).reshape(-1)
            idx = flat_idx[edges[i]:edges[i + 1]].astype(np.int32)
            syms_per_block.append(syms)
            idx_per_block.append(idx)
        header1 = struct.pack('f', lmb_f32)
        header2 = struct.pack('3H', nB, nH, nW)
        if getattr(self, 'coder_kind', 'host') == 'device':
            body = self._encode_interleaved(syms_per_block, idx_per_block)
        else:
            all_strings = [self._coder.compress_symbols(s, ix)
                           for s, ix in zip(syms_per_block, idx_per_block)]
            body = coding.pack_byte_strings(all_strings)
        return header1 + header2 + body

    def _encode_interleaved(self, syms_per_block, idx_per_block):
        """N-lane interleaved payload (decoded on device):
        [I n_words][I n_escapes][H num_lanes][states][words][escape varints]
        (escapes: delta-pos + zigzag-val LEB128, coding.pack_escapes)."""
        from lvae_tpu.ops import crans
        N = self.num_lanes
        states, words, escapes = crans.interleaved_encode(
            np.concatenate(syms_per_block), np.concatenate(idx_per_block),
            [s.size for s in syms_per_block],
            self._coder._cdf_table, num_lanes=N)
        out = struct.pack('<IIH', words.size, len(escapes), N)
        out += states.astype('<u4').tobytes()
        out += words.astype('<u2').tobytes()
        out += coding.pack_escapes(escapes[:, 0], escapes[:, 1])
        return out

    def compress_batch_async(self, ims, lmb=None):
        """Dispatch-only half of compress_batch: launches the batch-B
        program and returns an opaque handle (no synchronization). Pair
        with compress_batch_finish; see that method for the serving-loop
        overlap pattern. Accepts the same (ims, lmb) as compress_batch."""
        assert self.compressing, 'call compress_mode() first'
        assert getattr(self, 'coder_kind', 'host') == 'fused', \
            'compress_batch requires compress_mode(coder="fused")'
        ims = to_nhwc_batch(ims)
        self._check_input(ims)
        nB, imH, imW, _ = ims.shape
        nH, nW = imH // self.net.max_stride, imW // self.net.max_stride
        if lmb is None:
            lmb = self.default_lmb
        lmbs = [float(v) for v in (lmb if np.ndim(lmb) else [lmb] * nB)]
        assert len(lmbs) == nB, f'{len(lmbs)} lambdas for {nB} images'
        lmbs = [struct.unpack('f', struct.pack('f', v))[0] for v in lmbs]
        if self.num_lanes == 'auto':
            # one lane count for the whole batch (the kernel's N is static);
            # max over the per-image choices keeps high-rate latency
            self._fused = self._get_fused(
                max(self._auto_lanes(v) for v in lmbs))
        fused = self._fused
        handle = fused.encode_batch_async(
            self.params, jnp.asarray(ims),
            jnp.asarray(lmbs, jnp.float32))
        return fused, handle, lmbs, nH, nW

    def compress_batch(self, ims, lmb=None):
        """Batch serving encode: B same-shape images -> list of B byte
        bodies in the standard single-image container format. The
        backbone/trunk convs run BATCHED on the MXU and all B payloads
        arrive in one host pull, so per-image wall time amortizes the
        runtime's fixed dispatch/transfer costs (no reference counterpart —
        the reference codes one image at a time through its CPU coder).

        lmb may be a scalar or a length-B sequence (per-image rate targets
        in one batch — the lambda embedding is per-image anyway). Streams
        must be decoded by `decompress_batch` at the SAME batch size: like
        every fused codec here, the compiled executable is part of the
        codec (f32 trunk numerics are only bit-stable within one binary —
        see qarv/fused.py)."""
        return self.compress_batch_finish(
            self.compress_batch_async(ims, lmb=lmb))

    def compress_batch_finish(self, handle):
        """Synchronize a compress_batch_async dispatch: pull the payloads
        (one bulk fetch) and return the B byte bodies. A serving loop calls
        compress_batch_async for batch k+1 BEFORE finishing batch k, hiding
        the host pull + stream assembly behind device compute."""
        fused, fhandle, lmbs, nH, nW = handle
        bodies = fused.encode_batch_finish(fhandle)
        return [struct.pack('f', lmbs[b]) + struct.pack('3H', 1, nH, nW)
                + bodies[b] for b in range(len(bodies))]

    def decompress_batch_to_device(self, strings):
        """Batch decode of `compress_batch` outputs; returns (B,H,W,3) f16
        images ON DEVICE (async)."""
        assert self.compressing, 'call compress_mode() first'
        lmbs, bodies = [], []
        shape = None
        for s in strings:
            lmb_v, = struct.unpack('f', s[:4])
            nB_i, nH, nW = struct.unpack('3H', s[4:10])
            assert nB_i == 1
            assert shape is None or shape == (nH, nW), \
                'all batch streams must share one image shape'
            shape = (nH, nW)
            lmbs.append(lmb_v)
            bodies.append(s[10:])
        fields = {struct.unpack('<H', b[8:10])[0] for b in bodies}
        assert len(fields) == 1, \
            f'mixed lane counts / trunk kinds in batch: {fields}'
        lanes_field = fields.pop()
        fused = self._get_fused(lanes_field & 0x7FFF,
                                portable=bool(lanes_field & 0x8000))
        nH, nW = shape
        return fused.decode_batch_to_device(
            self.params, bodies, nH, nW, jnp.asarray(lmbs, jnp.float32))

    def decompress_batch(self, strings):
        return np.asarray(self.decompress_batch_to_device(strings),
                          dtype=np.float32)

    def decompress(self, string):
        """(reference: qarv/model.py:531-557)"""
        assert self.compressing, 'call compress_mode() first'
        lmb, string = struct.unpack('f', string[:4])[0], string[4:]
        (nB, nH, nW), string = struct.unpack('3H', string[:6]), string[6:]
        kind = getattr(self, 'coder_kind', 'host')
        if kind == 'fused':
            img = self.decompress_to_device(lmb, nB, nH, nW, string)
            return np.asarray(img, dtype=np.float32)
        if kind == 'device':
            return self._decompress_device(lmb, nB, nH, nW, string)
        all_lv_strings = coding.unpack_byte_string(string)
        fns, params = self._stage_fns, self.params
        lmb_arr = jnp.full((nB,), lmb, jnp.float32)
        emb = fns['emb'](params['lmb_embed_0'], params['lmb_embed_1'], lmb_arr)
        feature = jnp.broadcast_to(params['bias'],
                                   (nB, nH, nW, params['bias'].shape[-1]))
        str_i = 0
        for k, block in enumerate(self.net.dec_blocks):
            bp = self._block_params(k)
            if getattr(block, 'is_latent_block', False):
                f_mid, pm, pv, indexes = fns['prior'](block, bp, feature, emb)
                idx_np = np.asarray(indexes).astype(np.int32)  # uint8 on wire
                syms = self._coder.decompress_symbols(
                    all_lv_strings[str_i], idx_np[0]).reshape(idx_np[0].shape)
                str_i += 1
                # int16 halves the host->device push; exact unless a decoded
                # value exceeds the range (kept exact via int32 fallback);
                # widened ON DEVICE so fuse stays the encoder's executable
                if np.abs(syms).max(initial=0) < 32000:
                    syms_dev = _widen_i32(jnp.asarray(syms.astype(np.int16)))
                else:
                    syms_dev = jnp.asarray(syms.astype(np.int32))
                feature = fns['fuse'](block, bp, f_mid, pm,
                                      syms_dev[None], emb)
            elif isinstance(block, common.CompressionStopFlag):
                continue
            else:
                feature = fns['plain'](block, bp, feature, emb)
        assert str_i == len(all_lv_strings), f'{str_i=} != {len(all_lv_strings)=}'
        return np.asarray(fns['finish'](feature), dtype=np.float32)

    def decompress_to_device(self, lmb, nB, nH, nW, body):
        """Fused decode returning the f16 image ON DEVICE (async). The bench
        path: real codecs leave the frame device-resident (the reference's
        speedtest times GPU-resident decode output the same way,
        scripts/speedtest-lvae.py:29-44)."""
        assert nB == 1
        # route by the stream header: lane count AND trunk kind (high bit
        # marks a portable-trunk stream) — a portable file decodes in any
        # process regardless of how compress_mode configured this codec
        lanes_field = struct.unpack('<H', body[8:10])[0]
        fused = self._get_fused(lanes_field & 0x7FFF,
                                portable=bool(lanes_field & 0x8000))
        return fused.decode_to_device(
            self.params, body, nH, nW, jnp.full((1,), lmb, jnp.float32))

    def _decompress_device(self, lmb, nB, nH, nW, payload):
        """Fully on-device decode: ONE bitstream push, ONE image pull.
        Entropy decoding runs in the Pallas kernel
        (ops/pallas/rans_decode.py); lane states persist across blocks."""
        from lvae_tpu.ops.pallas import rans_decode as prd
        assert nB == 1
        N = self.num_lanes
        n_words, n_esc, lanes = struct.unpack('<IIH', payload[:10])
        assert lanes == N, f'stream lanes {lanes} != configured {N}'
        off = 10
        states = np.frombuffer(payload[off:off + 4 * N], '<u4'); off += 4 * N
        words = np.frombuffer(payload[off:off + 2 * n_words], '<u2')
        off += 2 * n_words
        esc_p, esc_v, _ = coding.unpack_escapes(payload[off:], n_esc)

        fns, params = self._stage_fns, self.params
        stream_d = jnp.asarray(words.astype(np.int32))
        states_d = jnp.asarray(states.view(np.int32).reshape(1, N).copy())
        if n_esc:
            kpad = max(8, 1 << (int(n_esc - 1).bit_length()))
            esc_pos = np.full(kpad, -1, np.int32)
            esc_val = np.zeros(kpad, np.int32)
            esc_pos[:n_esc] = esc_p
            esc_val[:n_esc] = esc_v
            esc_pos_d = jnp.asarray(esc_pos)
            esc_val_d = jnp.asarray(esc_val)
        ptr = jnp.int32(0)
        lmb_arr = jnp.full((nB,), lmb, jnp.float32)
        emb = fns['emb'](params['lmb_embed_0'], params['lmb_embed_1'], lmb_arr)
        feature = jnp.broadcast_to(params['bias'],
                                   (nB, nH, nW, params['bias'].shape[-1]))
        gstart = 0
        for k, block in enumerate(self.net.dec_blocks):
            bp = self._block_params(k)
            if getattr(block, 'is_latent_block', False):
                f_mid, pm, pv, indexes = fns['prior'](block, bp, feature, emb)
                zshape = tuple(int(v) for v in indexes.shape)
                nsym = int(np.prod(zshape))
                idx_rows = _prep_idx_rows(indexes, N)
                syms_TN, states_d, ptr = prd.rans_decode_block(
                    idx_rows, states_d, ptr, stream_d,
                    self._dev_cdfs, self._dev_offs, jnp.int32(nsym),
                    num_lanes=N,
                    interpret=jax.default_backend() == 'cpu')
                z_syms = _take_reshape(syms_TN, zshape)
                if n_esc:
                    z_syms = _patch_escapes(z_syms, esc_pos_d, esc_val_d,
                                            jnp.int32(gstart))
                feature = fns['fuse'](block, bp, f_mid, pm, z_syms, emb)
                gstart += nsym
            elif isinstance(block, common.CompressionStopFlag):
                continue
            else:
                feature = fns['plain'](block, bp, feature, emb)
        return np.asarray(fns['finish'](feature), dtype=np.float32)

    def compress_file(self, img_path, output_path, lmb=None, pad_hw=None,
                      portable=None):
        """(reference: qarv/model.py:559-570). pad_hw: optional (H, W)
        shape bucket — pads beyond /max_stride so mixed-shape datasets
        compile O(buckets) programs instead of O(shapes); decode crops back
        via the stored original size either way.

        FILES default to PORTABLE streams (the cross-executable
        bitwise-deterministic Pallas trunk): a file must decode on any
        process/machine, like the reference's CPU-coded files
        (lvae/models/qarv/model.py:572-581). Pass portable=False to pin
        the stream to this codec binary (slightly faster, not a file
        format)."""
        img = Image.open(img_path).convert('RGB')
        if pad_hw is not None:
            img_padded = coding.pad_to_shape(img, *pad_hw)
        else:
            img_padded = coding.pad_divisible_by(img, div=self.net.max_stride)
        im = image_to_batch(img_padded)
        if portable is None and getattr(self, 'coder_kind', '') == 'fused':
            portable = self._fused.supports_portable
        body_str = self.compress(im, lmb=lmb, portable=portable)
        header_str = struct.pack('2H', img.height, img.width)
        with open(output_path, 'wb') as f:
            f.write(header_str + body_str)

    def decompress_file(self, bits_path):
        with open(bits_path, 'rb') as f:
            header_str = f.read(4)
            body_str = f.read()
        img_h, img_w = struct.unpack('2H', header_str)
        im_hat = self.decompress(body_str)
        return im_hat[:, :img_h, :img_w, :]

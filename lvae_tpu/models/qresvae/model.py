"""QRes-VAE: fixed-rate hierarchical VAE (WACV 2023).

TPU-native re-design of reference lvae/models/qresvae/model.py. The network
is a flax.linen module (NHWC); the user-facing API lives in `QresModel`,
which mirrors the reference HierarchicalVAE methods (forward / compress /
decompress / compress_file / uncond_sample / cond_sample / inpaint ...).

Bit-exact coding design (differs from the reference's per-block host
round-trips, reference qresvae/model.py:327-360): encoder and decoder both
drive the SAME jitted per-block stage programs (`prior_stage`,
`fuse_stage`) so the prior means and scale indexes they compute are
bit-identical by construction. Encode additionally runs `posterior_symbols`
per block, keeps everything on-device, and pulls all symbol tensors to the
host in one transfer for the rANS stage.
"""
import math
import pickle
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
import flax.linen as nn

from lvae_tpu.models import common
from lvae_tpu.models.common import gelu
from lvae_tpu.models import entropy_coding as ec
from lvae_tpu.models.base import VAEModelBase, to_nhwc_batch, image_to_batch
from lvae_tpu.ops import cdf as cdf_ops
from lvae_tpu.utils import coding


class MSEOutputNet(nn.Module):
    """lambda * MSE output head (reference: qresvae/model.py:97-117)."""
    mse_lmb: float
    loss_name = 'mse'

    def forward_loss(self, x_hat, x_tgt):
        mse = jnp.mean(jnp.square(x_hat - x_tgt), axis=(1, 2, 3))
        return mse * self.mse_lmb, x_hat

    def mean(self, x_hat, temprature=None):
        return x_hat

    def sample(self, x_hat, rng=None, temprature=None):
        return x_hat

    def __call__(self, x_hat, x_tgt):  # for init
        return self.forward_loss(x_hat, x_tgt)


class GaussianNLLOutputNet(nn.Module):
    """Per-pixel discretized-Gaussian NLL head for lossless coding
    (reference: qresvae/model.py:16-94)."""
    conv_mean: nn.Module
    conv_scale: nn.Module
    bin_size: float = 1 / 127.5
    loss_name = 'nll'

    def _params(self, feature):
        feature = feature.astype(jnp.float32)
        p_mean = self.conv_mean(feature)
        p_logscale = self.conv_scale(feature)
        p_logscale = jax.nn.softplus(p_logscale + 16.0) - 16.0  # logscale lower bound
        return p_mean, p_logscale

    def forward_loss(self, feature, x_tgt):
        p_mean, p_logscale = self._params(feature)
        log_prob = ec.gaussian_log_prob_mass(
            p_mean, jnp.exp(p_logscale), x_tgt, bin_size=self.bin_size)
        nll = -jnp.mean(log_prob, axis=(1, 2, 3))
        return nll, p_mean

    def mean(self, feature, temprature=None):
        p_mean, _ = self._params(feature)
        return p_mean

    def sample(self, feature, rng, temprature=None):
        p_mean, p_logscale = self._params(feature)
        p_scale = jnp.exp(p_logscale)
        if temprature is not None:
            p_scale = p_scale * temprature
        return p_mean + p_scale * jax.random.normal(rng, p_mean.shape)

    def codec_tensors(self, feature, x_tgt=None):
        """Produce (pm, plogv[, x]) in bin units for the entropy-coding stage.
        The round-to-grid trick on pm guarantees bit-exact lossless round-trip
        (reference: qresvae/model.py:69-79)."""
        p_mean, p_logscale = self._params(feature)
        pm = jnp.round(p_mean * 127.5 + 127.5) / 127.5 - 1.0
        pm = pm / self.bin_size
        plogv = p_logscale - math.log(self.bin_size)
        if x_tgt is not None:
            return pm, plogv, x_tgt / self.bin_size
        return pm, plogv

    def __call__(self, feature, x_tgt):  # for init
        return self.forward_loss(feature, x_tgt)


class BottomUpEncoder(nn.Module):
    """Run encoder blocks, keep features keyed by spatial resolution
    (reference: qresvae/model.py:195-207)."""
    blocks: Tuple[nn.Module, ...]

    @nn.compact
    def __call__(self, x, remat: bool = False):
        feature = x
        enc_features = {}
        for block in self.blocks:
            feature = common.apply_block(block, feature, remat=remat)
            enc_features[int(feature.shape[1])] = feature
        return enc_features


class QLatentBlock(nn.Module):
    """Fixed-rate latent block (reference: qresvae/model.py:210-360).

    ConvNeXt front/end, VDBlock posterior/prior, zero-init prior, softplus
    log-scale floor -2.3, residual quantization at eval/coding time.
    """
    width: int
    zdim: int
    enc_width: Optional[int] = None
    kernel_size: int = 7
    rescale_z: float = 1.0  # z_proj last-conv init scaling, set by the zoo

    is_latent_block = True

    # scale bound used for the eval-time likelihood (the reference's
    # GaussianConditional keeps its initial 0.11 lower bound even after the
    # coding table is rebuilt with min 0.1 — see SURVEY.md C15)
    eval_scale_bound = 0.11

    def setup(self):
        w, zdim = self.width, self.zdim
        enc_width = self.enc_width or w
        hidden = int(max(w, enc_width) * 0.25)
        use_3x3 = self.kernel_size >= 3
        self.resnet_front = common.MyConvNeXtBlock(w, kernel_size=self.kernel_size)
        self.resnet_end = common.MyConvNeXtBlock(w, kernel_size=self.kernel_size)
        self.posterior = common.VDBlock(hidden, zdim, residual=False, use_3x3=use_3x3)
        self.prior = common.VDBlock(hidden, zdim * 2, residual=False,
                                    use_3x3=use_3x3, zero_last=True)
        zc = common.conv_k3s1 if use_3x3 else common.conv_k1s1
        self.z_proj_0 = zc(hidden // 2, name='z_proj_0')
        # last conv of z_proj is init-rescaled like the reference's
        # residual_scaling (qresvae/model.py:242-243)
        base = nn.initializers.lecun_normal()
        s = self.rescale_z

        def kinit(key, shape, dtype=jnp.float32):
            return base(key, shape, dtype) * s
        self.z_proj_1 = nn.Conv(w, (1, 1), kernel_init=kinit,
                                bias_init=nn.initializers.zeros_init(),
                                name='z_proj_1')

    # coding scale table: 64 log-spaced in [0.1, 20]
    # (reference: qresvae/model.py:317-325)
    def coding_scale_table(self):
        return cdf_ops.qres_latent_scale_table()

    # --- staged methods (shared between encode & decode paths) -------------

    def prior_stage(self, feature):
        """p(z_i | z_<i): returns (feature_mid, pm, pv, coding indexes)."""
        feature = self.resnet_front(feature)
        p_out = self.prior(feature)
        pm, plogv = jnp.split(p_out, 2, axis=-1)
        plogv = jax.nn.softplus(plogv + 2.3) - 2.3
        pv = jnp.exp(plogv)
        # uint8: indexes cross the device->host link on every decode
        indexes = ec.build_indexes(
            pv, cdf_ops.qres_latent_scale_table()).astype(jnp.uint8)
        return feature, pm, pv, indexes

    def posterior_qm(self, feature, enc_feature):
        return self.posterior(jnp.concatenate([feature, enc_feature], axis=-1))

    def posterior_symbols(self, feature, enc_feature, pm):
        """Encode-side: quantized residual symbols.

        int16 + overflow flag halves the device->host pull; the int32 tensor
        is the exact fallback (see qarv.VRLVBlockBase.posterior_symbols)."""
        qm = self.posterior_qm(feature, enc_feature)
        syms = jnp.round(qm - pm).astype(jnp.int32)
        # -32768 sentinel marks int16 truncation (see qarv posterior_symbols)
        sym16 = jnp.where(jnp.abs(syms) > 32000, -32768, syms).astype(jnp.int16)
        return sym16, syms

    def fuse_stage(self, feature, pm, symbols):
        """Add the information carried by decoded symbols to the feature."""
        z = symbols.astype(jnp.float32) + pm
        return self._fuse(feature, z)

    def _fuse(self, feature, z):
        z = self.z_proj_1(gelu(self.z_proj_0(z)))
        return self.resnet_end(feature + z)

    # --- full-graph modes ---------------------------------------------------

    def forward_train(self, feature, enc_feature, training: bool,
                      get_latents: bool = False):
        feature, pm, pv, _ = self.prior_stage(feature)
        qm = self.posterior_qm(feature, enc_feature)
        if training:
            noise = jax.random.uniform(self.make_rng('noise'), qm.shape,
                                       dtype=qm.dtype, minval=-0.5, maxval=0.5)
            z_sample = qm + noise
            kl = -ec.gaussian_log_prob_mass(pm, pv, z_sample, 1.0, 1e-6)
        else:
            z_sample = ec.quantize_dequantize(qm, pm)
            probs = ec.discrete_likelihood(z_sample, pv, pm, self.eval_scale_bound)
            kl = -jnp.log(probs)
        feature = self._fuse(feature, z_sample)
        stats = {'kl': kl}
        if get_latents:
            stats['z'] = jax.lax.stop_gradient(z_sample)
        return feature, stats

    def forward_uncond(self, feature, t=1.0, latent=None, paint_mask=None):
        """Sampling mode (reference: qresvae/model.py:284-315).

        paint_mask: float mask (broadcastable to latent shape), 1 where the
        latent should be replaced by a fresh prior sample (inpainting box).
        """
        feature, pm, pv, _ = self.prior_stage(feature)
        pv = pv * t
        if latent is None or paint_mask is not None:
            eps = jax.random.normal(self.make_rng('sample'), pm.shape)
            u = jax.random.uniform(self.make_rng('sample'), pm.shape,
                                   minval=-0.5, maxval=0.5)
            z_sample = pm + pv * eps + u * t
            if latent is None:
                z = z_sample
            else:
                z = latent * (1.0 - paint_mask) + z_sample * paint_mask
        else:
            z = latent
        return self._fuse(feature, z)

    def __call__(self, feature, enc_feature):  # for init
        f, _ = self.forward_train(feature, enc_feature, training=False)
        return f


class HierarchicalVAENet(nn.Module):
    """The full QRes-VAE graph (reference: qresvae/model.py:457-569 for the
    training forward; decode seeding at :379-391)."""
    enc_blocks: Tuple[nn.Module, ...]
    dec_blocks: Tuple[Any, ...]
    out_net: nn.Module
    im_shift: float
    im_scale: float
    max_stride: int = 64

    def setup(self):
        self.encoder = BottomUpEncoder(self.enc_blocks)
        width = self.dec_blocks[0].width
        self.bias = self.param('bias', nn.initializers.zeros_init(), (1, 1, 1, width))

    def preprocess_input(self, im):
        return (im + self.im_shift) * self.im_scale

    def preprocess_target(self, im):
        return (im - 0.5) * 2.0

    def encode(self, x, remat: bool = False):
        return self.encoder(x, remat)

    def seed_feature(self, batch, h, w):
        return jnp.broadcast_to(self.bias, (batch, h, w, self.bias.shape[-1]))

    def forward(self, im, training: bool = False, get_latents: bool = False,
                remat: bool = False):
        """Trainval forward: returns (out_loss, x_hat, kl list[, z list]).
        remat=True checkpoints each block (common.apply_block) so the
        backward pass recomputes activations instead of storing them."""
        x = self.preprocess_input(im)
        x_target = self.preprocess_target(im)
        enc_features = self.encode(x, remat=remat)
        min_res = min(enc_features.keys())
        f0 = enc_features[min_res]
        feature = self.seed_feature(f0.shape[0], f0.shape[1], f0.shape[2])
        stats_all = []
        for block in self.dec_blocks:
            if getattr(block, 'is_latent_block', False):
                res = int(feature.shape[1])
                feature, stats = common.apply_block(
                    block, feature, enc_features[res], remat=remat,
                    method=lambda m, f, fe: m.forward_train(
                        f, fe, training, get_latents))
                stats_all.append(stats)
            else:
                feature = common.apply_block(block, feature, remat=remat)
        out_loss, x_hat = self.out_net.forward_loss(feature, x_target)
        return out_loss, x_hat, stats_all

    def forward_uncond(self, nhw_repeat=(1, 1, 1), t=1.0):
        nB, nH, nW = nhw_repeat
        feature = self.seed_feature(nB, nH, nW)
        for block in self.dec_blocks:
            if getattr(block, 'is_latent_block', False):
                feature = block.forward_uncond(feature, t)
            else:
                feature = block(feature)
        return feature

    def forward_with_latents(self, latents, nhw_repeat=None, t=1.0,
                             paint_masks=None):
        if nhw_repeat is None:
            nB, nH, nW = latents[0].shape[0], latents[0].shape[1], latents[0].shape[2]
        else:
            nB, nH, nW = nhw_repeat
        feature = self.seed_feature(nB, nH, nW)
        idx = 0
        for block in self.dec_blocks:
            if getattr(block, 'is_latent_block', False):
                pm = None if paint_masks is None else paint_masks[idx]
                feature = block.forward_uncond(feature, t, latent=latents[idx],
                                               paint_mask=pm)
                idx += 1
            else:
                feature = block(feature)
        return feature

    def sample_output(self, feature, rng, temprature=None):
        return self.out_net.sample(feature, rng=rng, temprature=temprature) \
            if isinstance(self.out_net, GaussianNLLOutputNet) \
            else self.out_net.sample(feature, temprature=temprature)

    def out_mean(self, feature):
        return self.out_net.mean(feature)

    def out_codec_tensors(self, feature, x_tgt=None):
        return self.out_net.codec_tensors(feature, x_tgt)

    def target_from_im(self, im):
        return self.preprocess_target(im)

    # --- per-block staged programs (compress/decompress) --------------------

    def dec_prior_stage(self, feature, k: int):
        return self.dec_blocks[k].prior_stage(feature)

    def dec_posterior_symbols(self, feature, enc_feature, pm, k: int):
        return self.dec_blocks[k].posterior_symbols(feature, enc_feature, pm)

    def dec_fuse_stage(self, feature, pm, symbols, k: int):
        return self.dec_blocks[k].fuse_stage(feature, pm, symbols)

    def dec_plain_block(self, feature, k: int):
        return self.dec_blocks[k](feature)

    def __call__(self, im):  # for init only
        out_loss, x_hat, stats = self.forward(im, training=False)
        return out_loss


log2_e = math.log2(math.e)


@jax.jit
def _widen_i32(x):
    """int16 -> int32 on device (see qarv model: fuse must stay the
    encoder's int32 executable for bit-exactness)."""
    return x.astype(jnp.int32)


class QresModel(VAEModelBase):
    """User-facing handle mirroring the reference HierarchicalVAE API
    (reference: qresvae/model.py:457-725)."""

    def __init__(self, net: HierarchicalVAENet, seed=0, example_hw=64):
        super().__init__(net, seed=seed, example_hw=example_hw)
        self.lossless = isinstance(net.out_net, GaussianNLLOutputNet)
        self.num_latents = sum(1 for b in net.dec_blocks
                               if getattr(b, 'is_latent_block', False))
        # discretized conditionals: one per latent block (same table for all
        # QRes blocks) + optionally one for the lossless head
        self._block_coder = ec.DiscretizedConditional(
            cdf_ops.qres_latent_scale_table(), dist='gaussian')
        self._head_coder = ec.DiscretizedConditional(
            cdf_ops.lossless_head_scale_table(), dist='gaussian') if self.lossless else None
        self.compressing = False

    # ------------------------------------------------------------------ train
    def loss_and_stats(self, params, im, rng, training=True,
                       compute_dtype=None, remat=False):
        """Pure loss function (used by the trainer; jit/pjit-able).
        compute_dtype='bfloat16' runs the conv stacks in bf16 (TPU mixed
        precision); master params stay f32, rate term stays f32. remat=True
        checkpoints per block (see HierarchicalVAENet.forward)."""
        net_params, net_im = params, im
        if compute_dtype is not None:
            cd = jnp.dtype(compute_dtype)
            net_params = jax.tree.map(
                lambda x: x.astype(cd) if x.dtype == jnp.float32 else x, params)
            net_im = im.astype(cd)
        out_loss, x_hat, stats_all = self.net.apply(
            {'params': net_params}, net_im, training, False, remat,
            method=self.net.forward, rngs={'noise': rng})
        x_hat = x_hat.astype(jnp.float32)
        out_loss = out_loss.astype(jnp.float32)
        nB, H, W, C = im.shape
        ndims = C * H * W
        kl_divs = [jnp.sum(st['kl'].astype(jnp.float32), axis=(1, 2, 3))
                   for st in stats_all]
        kl = sum(kl_divs) / ndims
        loss = jnp.mean(kl + out_loss)
        im_hat = jnp.clip(x_hat, -1.0, 1.0) * 0.5 + 0.5
        im_mse = jnp.mean(jnp.square(im_hat - im))
        stats = {
            'loss': loss,
            'kl': jnp.mean(kl),
            self.net.out_net.loss_name: jnp.mean(out_loss),
            'bppix': jnp.mean(kl) * log2_e * C,
            'mse_im': im_mse,
        }
        return loss, stats

    def forward(self, im, return_rec=False):
        """Eval/inspection forward; accepts numpy/PIL-sourced batches in [0,1].
        Returns a stats dict like the reference forward (qresvae/model.py:517-569)."""
        raw = im
        im = to_nhwc_batch(im)
        self._check_input(im, raw=raw)
        loss, stats = self._jit_eval_forward(self.params, im)
        # one bulk fetch for the stat scalars (fixed per-transfer floor)
        from lvae_tpu import parallel
        stats = {k: float(v)
                 for k, v in parallel.fast_device_get(stats).items()}
        stats['psnr'] = -10 * math.log10(max(stats.pop('mse_im'), 1e-12))
        if return_rec:
            stats['im_hat'] = np.asarray(self._jit_reconstruct(self.params, im))
        return stats

    def _check_input(self, im, raw=None):
        """Clear errors instead of opaque XLA reshape failures
        (reference asserts: qresvae/model.py:490-492)."""
        assert im.ndim == 4 and im.shape[3] == 3, \
            f'expected NHWC rgb input, got {im.shape=}'
        s = self.net.max_stride
        assert im.shape[1] % s == 0 and im.shape[2] % s == 0, \
            f'input H/W {im.shape[1:3]} must be divisible by {s} ' \
            f'(use compress_file / pad_divisible_by for arbitrary sizes)'
        if isinstance(raw, np.ndarray):  # host data: range check is cheap
            assert raw.min() >= 0.0 and raw.max() <= 1.0, \
                'input values must be in [0, 1]'

    @property
    def _jit_eval_forward(self):
        if not hasattr(self, '_jit_eval_forward_fn'):
            def f(params, im):
                return self.loss_and_stats(params, im, jax.random.PRNGKey(0),
                                           training=False)
            self._jit_eval_forward_fn = jax.jit(f)
        return self._jit_eval_forward_fn

    @property
    def _jit_reconstruct(self):
        if not hasattr(self, '_jit_reconstruct_fn'):
            def f(params, im):
                _, x_hat, _ = self.net.apply({'params': params}, im, False, False,
                                             method=self.net.forward,
                                             rngs={'noise': jax.random.PRNGKey(0)})
                return jnp.clip(x_hat, -1.0, 1.0) * 0.5 + 0.5
            self._jit_reconstruct_fn = jax.jit(f)
        return self._jit_reconstruct_fn

    # ------------------------------------------------------------- sampling
    def uncond_sample(self, nhw_repeat, temprature=1.0, seed=0):
        """Generate images (reference: qresvae/model.py:577-588)."""
        rng = jax.random.PRNGKey(seed)
        feature = self.net.apply({'params': self.params}, tuple(nhw_repeat),
                                 temprature, method=self.net.forward_uncond,
                                 rngs={'sample': rng})
        x = self._apply_out_sample(feature, rng, temprature)
        return np.asarray(jnp.clip(x, -1, 1) * 0.5 + 0.5)

    def cond_sample(self, latents, nhw_repeat=None, temprature=1.0,
                    paint_masks=None, seed=0):
        rng = jax.random.PRNGKey(seed)
        feature = self.net.apply({'params': self.params}, list(latents),
                                 nhw_repeat, temprature, paint_masks,
                                 method=self.net.forward_with_latents,
                                 rngs={'sample': rng})
        x = self._apply_out_sample(feature, rng, temprature)
        return np.asarray(jnp.clip(x, -1, 1) * 0.5 + 0.5)

    def _apply_out_sample(self, feature, rng, temprature):
        if self.lossless:
            return self.net.apply({'params': self.params}, feature, rng,
                                  temprature, method=self.net.sample_output)
        return self.net.apply({'params': self.params}, feature, None,
                              method=self.net.sample_output)

    def forward_get_latents(self, im):
        """Return per-block z and kl (reference: qresvae/model.py:605-611)."""
        im = to_nhwc_batch(im)
        _, _, stats_all = self.net.apply(
            {'params': self.params}, im, False, True, method=self.net.forward,
            rngs={'noise': jax.random.PRNGKey(0)})
        return [{k: np.asarray(v) for k, v in st.items()} for st in stats_all]

    def inpaint(self, im, paint_box, steps=1, temprature=1.0, seed=0):
        """Iterative inpainting (reference: qresvae/model.py:613-638).
        paint_box: (x1, y1, x2, y2) fractions in [0,1]."""
        im = to_nhwc_batch(im)
        nB, imH, imW, _ = im.shape
        x1, y1, x2, y2 = paint_box
        hs = slice(round(y1 * imH), round(y2 * imH))
        ws = slice(round(x1 * imW), round(x2 * imW))
        im_input = np.array(im)
        im_sample = None
        for i in range(steps):
            stats_all = self.forward_get_latents(im_input)
            latents = [st['z'] for st in stats_all]
            masks = []
            for z in latents:
                zH, zW = z.shape[1], z.shape[2]
                m = np.zeros((1, zH, zW, 1), np.float32)
                if min(zH, zW) > 1:
                    m[:, round(y1 * zH):round(y2 * zH),
                      round(x1 * zW):round(x2 * zW)] = 1.0
                masks.append(jnp.asarray(m))
            im_sample = self.cond_sample(latents, temprature=temprature,
                                         paint_masks=masks, seed=seed + i)
            im_sample = np.clip(im_sample, 0, 1)
            im_input = np.array(im)
            im_input[:, hs, ws, :] = im_sample[:, hs, ws, :]
        return im_sample

    # ---------------------------------------------------------- compression
    def compress_mode(self, mode=True, coder=None, num_lanes=128,
                      esc_cap=8192, compute_dtype=None, portable=False,
                      max_program_batch=None, word_cap=None):
        """Build CDF tables (reference: qresvae/model.py:640-647).
        coder='host'   per-block C++ rANS (reference container layout)
        coder='device' staged programs + Pallas on-device decode (nB=1)
        coder='fused'  one XLA program per direction with on-device rANS in
                       both directions (qresvae/fused.py) — the default.
                       For lossless models the pixel head is coded in the
                       same stream (fused.py docstring).
        compute_dtype='bfloat16' applies to the fused ENCODER BACKBONE
        only; everything decode must reproduce bitwise stays f32 (see
        qarv/fused.py precision policy).
        portable=True codes through the cross-executable
        bitwise-deterministic Pallas trunk (ops/pallas/trunk.py): streams
        decode in any process/executable. compress_file defaults to it."""
        if coder is None:
            coder = 'fused'
        assert coder in ('host', 'device', 'fused')
        assert not (coder == 'device' and self.lossless), \
            'the staged device coder has no lossless head; use fused/host'
        if mode:
            self._block_coder.update()
            if self._head_coder is not None:
                self._head_coder.update()
            self._build_stage_fns()
            self.coder_kind = coder
            if coder == 'device':
                from lvae_tpu.ops.pallas import rans_decode as prd
                cdf_np, off_np = prd.prepare_device_cdf(
                    self._block_coder._cdf_table)
                self._dev_cdfs = jnp.asarray(cdf_np)
                self._dev_offs = jnp.asarray(off_np)
                self.num_lanes = 128
            elif coder == 'fused':
                # cfg-keyed codec cache shared across compress_mode calls
                # (see QarvModel.compress_mode)
                if not hasattr(self, '_fused_codecs'):
                    self._fused_codecs = {}
                self._fused_cfg = dict(
                    esc_cap=esc_cap, compute_dtype=compute_dtype,
                    portable=portable, max_program_batch=max_program_batch,
                    word_cap=word_cap,
                    interpret=jax.default_backend() == 'cpu')
                self.num_lanes = num_lanes
                self._fused = self._get_fused(num_lanes)
        self.compressing = mode

    def _get_fused(self, n_lanes: int, portable=None):
        """Codec for (lane count, current cfg); ``portable`` overrides the
        cfg's trunk kind — decode routes by the STREAM's marker bit."""
        cfg = dict(self._fused_cfg)
        if portable is not None:
            cfg['portable'] = portable
        key = (n_lanes,) + tuple(sorted(cfg.items()))
        codec = self._fused_codecs.get(key)
        if codec is None:
            from lvae_tpu.models.qresvae.fused import FusedQresCodec
            head_kw = {}
            if self.lossless:
                head_kw = dict(
                    head_cdf_table=self._head_coder._cdf_table,
                    head_scale_table=self._head_coder.scale_table)
            codec = FusedQresCodec(
                self.net, self._block_coder._cdf_table,
                num_lanes=n_lanes, **cfg, **head_kw)
            self._fused_codecs[key] = codec
        return codec

    def _block_params(self, k):
        """Per-block parameter subtree; stage dispatch cost scales with the
        number of argument buffers, so never pass the full model tree."""
        return self.params.get(f'dec_blocks_{k}', {})

    def _build_stage_fns(self):
        if hasattr(self, '_stage_fns'):
            return
        net = self.net

        # `block` is a static arg; equal block configs share executables
        def prior(block, bp, feature):
            return block.apply({'params': bp}, feature,
                               method=block.prior_stage)

        def post_sym(block, bp, feature, enc_f, pm):
            return block.apply({'params': bp}, feature, enc_f, pm,
                               method=block.posterior_symbols)

        def fuse(block, bp, feature, pm, symbols):
            return block.apply({'params': bp}, feature, pm, symbols,
                               method=block.fuse_stage)

        def plain(block, bp, feature):
            return block.apply({'params': bp}, feature)

        def backbone(params, im):
            x = (im + net.im_shift) * net.im_scale
            return net.apply({'params': params}, x, method=net.encode)

        def concat_packed(sym_list, idx_list):
            """Pack int16 symbols + uint8 indexes into ONE uint8 pull."""
            syms = jnp.concatenate([a.reshape(-1) for a in sym_list])
            idx = jnp.concatenate([a.reshape(-1) for a in idx_list])
            sym_bytes = jax.lax.bitcast_convert_type(syms, jnp.uint8).reshape(-1)
            return jnp.concatenate([sym_bytes, idx])

        def finish(out_params, feature):
            # f16 halves the final image transfer (~77dB error floor)
            x_hat = net.out_net.apply({'params': out_params}, feature,
                                      method=net.out_net.mean) \
                if out_params else feature
            im = jnp.clip(x_hat, -1.0, 1.0) * 0.5 + 0.5
            return im.astype(jnp.float16)

        self._stage_fns = {
            'finish': jax.jit(finish),
            'prior': jax.jit(prior, static_argnums=0),
            'post_sym': jax.jit(post_sym, static_argnums=0),
            'fuse': jax.jit(fuse, static_argnums=0),
            'plain': jax.jit(plain, static_argnums=0),
            'backbone': jax.jit(backbone),
            'concat_packed': jax.jit(concat_packed),
        }

    def compress(self, im, portable=None):
        """Compress a batch -> [strings_1, ..., strings_N, smallest_shape]
        (+ lossless head strings), matching the reference container layout
        (reference: qresvae/model.py:649-668). ``portable`` (fused coder):
        override the trunk kind for this stream — see QarvModel.compress."""
        assert self.compressing, 'call compress_mode() first'
        raw = im
        im = to_nhwc_batch(im)
        self._check_input(im, raw=raw)
        if getattr(self, 'coder_kind', 'host') == 'fused':
            assert im.shape[0] == 1, 'fused coder supports single images'
            nH = im.shape[1] // self.net.max_stride
            nW = im.shape[2] // self.net.max_stride
            fused = self._get_fused(self.num_lanes, portable=portable)
            body = fused.encode(self.params, jnp.asarray(im))
            width = self.params['bias'].shape[-1]
            return [body, (1, nH, nW, width)]
        fns, params = self._stage_fns, self.params
        enc_features = fns['backbone'](params, im)
        min_res = min(enc_features.keys())
        f0 = enc_features[min_res]
        nB = f0.shape[0]
        feature = jnp.broadcast_to(
            self.params['bias'], (nB, f0.shape[1], f0.shape[2],
                                  self.params['bias'].shape[-1]))
        sym16_list, sym32_list, idx_list, shapes = [], [], [], []
        for k, block in enumerate(self.net.dec_blocks):
            bp = self._block_params(k)
            if getattr(block, 'is_latent_block', False):
                feature_mid, pm, pv, indexes = fns['prior'](block, bp, feature)
                res = int(feature_mid.shape[1])
                sym16, sym32 = fns['post_sym'](
                    block, bp, feature_mid, enc_features[res], pm)
                feature = fns['fuse'](block, bp, feature_mid, pm, sym32)
                sym16_list.append(sym16)
                sym32_list.append(sym32)
                idx_list.append(indexes)
                shapes.append(sym16.shape)
            else:
                feature = fns['plain'](block, bp, feature)
        # one fused host pull (the host link dominates latency), then rANS
        packed = np.asarray(fns['concat_packed'](sym16_list, idx_list))
        total = sum(int(np.prod(s)) for s in shapes)
        flat_syms = packed[:2 * total].view(np.int16)
        flat_idx = packed[2 * total:]
        sizes = [int(np.prod(s)) for s in shapes]
        edges = np.cumsum([0] + sizes)
        syms_per_block, idx_per_block = [], []
        for i in range(len(shapes)):
            syms = flat_syms[edges[i]:edges[i + 1]].astype(np.int32)
            if (syms == -32768).any():  # sentinel: int16 was lossy here
                syms = np.asarray(sym32_list[i]).reshape(-1)
            idx = flat_idx[edges[i]:edges[i + 1]].astype(np.int32)
            syms_per_block.append(syms)
            idx_per_block.append(idx)
        compressed = []
        if getattr(self, 'coder_kind', 'host') == 'device':
            assert nB == 1, 'device coder supports single images'
            from lvae_tpu.ops import crans
            states, words, escapes = crans.interleaved_encode(
                np.concatenate(syms_per_block), np.concatenate(idx_per_block),
                [s.size for s in syms_per_block],
                self._block_coder._cdf_table, num_lanes=self.num_lanes)
            import struct as _struct
            payload = _struct.pack('<IIH', words.size, len(escapes),
                                   self.num_lanes)
            payload += states.astype('<u4').tobytes()
            payload += words.astype('<u2').tobytes()
            payload += coding.pack_escapes(escapes[:, 0], escapes[:, 1])
            compressed.append(payload)
        else:
            for syms, idx in zip(syms_per_block, idx_per_block):
                syms = syms.reshape(nB, -1)
                idx = idx.reshape(nB, -1)
                compressed.append([
                    self._block_coder.compress_symbols(syms[b], idx[b])
                    for b in range(nB)])
        compressed.append(tuple(int(v) for v in f0.shape))
        if self.lossless:
            x_tgt = (im - 0.5) * 2.0
            pm, plogv, x = self.net.apply({'params': params}, feature, x_tgt,
                                          method=self.net.out_codec_tensors)
            pm, plogv, x = jax.device_get((pm, plogv, x))
            head_idx = cdf_ops.build_indexes_np(np.exp(plogv),
                                                self._head_coder.scale_table)
            syms = np.round(x - pm).astype(np.int32)
            strs = [self._head_coder.compress_symbols(syms[b], head_idx[b])
                    for b in range(nB)]
            compressed.append(strs)
        return compressed

    def decompress(self, compressed_object):
        """Inverse of compress (reference: qresvae/model.py:670-687)."""
        assert self.compressing, 'call compress_mode() first'
        fns, params = self._stage_fns, self.params
        if getattr(self, 'coder_kind', 'host') == 'fused':
            nB, fH, fW, _ = compressed_object[-1]
            img = self.decompress_to_device(compressed_object[0], fH, fW)
            img = np.asarray(img)
            if img.dtype == np.uint8:      # lossless head returns exact u8
                return img.astype(np.float32) / 255.0
            return img.astype(np.float32)
        if self.lossless:
            head_strings = compressed_object[-1]
            compressed_object = compressed_object[:-1]
        smallest_shape = compressed_object[-1]
        nB, fH, fW, _ = smallest_shape
        feature = jnp.broadcast_to(
            params['bias'], (nB, fH, fW, params['bias'].shape[-1]))
        device_mode = getattr(self, 'coder_kind', 'host') == 'device'
        if device_mode:
            import struct as _struct
            from lvae_tpu.models.qarv.model import (_prep_idx_rows,
                                                    _take_reshape,
                                                    _patch_escapes)
            from lvae_tpu.ops.pallas import rans_decode as prd
            payload = compressed_object[0]
            N = self.num_lanes
            n_words, n_esc, lanes = _struct.unpack('<IIH', payload[:10])
            assert lanes == N
            off = 10
            d_states = np.frombuffer(payload[off:off + 4 * N], '<u4')
            off += 4 * N
            d_words = np.frombuffer(payload[off:off + 2 * n_words], '<u2')
            off += 2 * n_words
            d_esc_p, d_esc_v, _ = coding.unpack_escapes(payload[off:], n_esc)
            stream_d = jnp.asarray(d_words.astype(np.int32))
            states_d = jnp.asarray(d_states.view(np.int32).reshape(1, N).copy())
            ptr = jnp.int32(0)
            if n_esc:
                kpad = max(8, 1 << int(n_esc - 1).bit_length())
                e_pos = np.full(kpad, -1, np.int32)
                e_val = np.zeros(kpad, np.int32)
                e_pos[:n_esc] = d_esc_p
                e_val[:n_esc] = d_esc_v
                e_pos_d, e_val_d = jnp.asarray(e_pos), jnp.asarray(e_val)
            gstart = 0
        str_i = 0
        for k, block in enumerate(self.net.dec_blocks):
            bp = self._block_params(k)
            if getattr(block, 'is_latent_block', False):
                feature_mid, pm, pv, indexes = fns['prior'](block, bp, feature)
                if device_mode:
                    zshape = tuple(int(v) for v in indexes.shape)
                    nsym = int(np.prod(zshape))
                    idx_rows = _prep_idx_rows(indexes, N)
                    syms_TN, states_d, ptr = prd.rans_decode_block(
                        idx_rows, states_d, ptr, stream_d,
                        self._dev_cdfs, self._dev_offs, jnp.int32(nsym),
                        num_lanes=N,
                        interpret=jax.default_backend() == 'cpu')
                    syms_dev = _take_reshape(syms_TN, zshape)
                    if n_esc:
                        syms_dev = _patch_escapes(syms_dev, e_pos_d, e_val_d,
                                                  jnp.int32(gstart))
                    gstart += nsym
                    str_i = 0  # single payload entry consumed at the end
                else:
                    idx_np = np.asarray(indexes)
                    strs_batch = compressed_object[str_i]
                    str_i += 1
                    syms = np.stack([
                        self._block_coder.decompress_symbols(
                            strs_batch[b], idx_np[b]).reshape(idx_np[b].shape)
                        for b in range(nB)])
                    # int16 push, widened on device so fuse stays the SAME
                    # executable the encoder used (bit-exactness)
                    if np.abs(syms).max(initial=0) < 32000:
                        syms_dev = _widen_i32(jnp.asarray(syms.astype(np.int16)))
                    else:
                        syms_dev = jnp.asarray(syms.astype(np.int32))
                feature = fns['fuse'](block, bp, feature_mid, pm, syms_dev)
            else:
                feature = fns['plain'](block, bp, feature)
        if not device_mode:
            assert str_i == len(compressed_object) - 1
        if self.lossless:
            pm, plogv = jax.device_get(self.net.apply(
                {'params': params}, feature, method=self.net.out_codec_tensors))
            head_idx = cdf_ops.build_indexes_np(np.exp(plogv),
                                                self._head_coder.scale_table)
            xs = np.stack([
                self._head_coder.decompress_symbols(head_strings[b], head_idx[b])
                .reshape(head_idx[b].shape) for b in range(nB)])
            x_hat = (xs + pm) * self.net.out_net.bin_size
            return np.clip(np.asarray(x_hat, np.float32), -1, 1) * 0.5 + 0.5
        return np.asarray(fns['finish'](params.get('out_net', {}), feature),
                          dtype=np.float32)

    def decompress_to_device(self, body, fH, fW):
        """Fused decode returning the image ON DEVICE (async). Routes by
        the stream header's lane count AND trunk-kind marker bit, so a
        portable file decodes regardless of this codec's configured mode."""
        import struct as _struct
        lanes_field = _struct.unpack('<H', body[8:10])[0]
        fused = self._get_fused(lanes_field & 0x7FFF,
                                portable=bool(lanes_field & 0x8000))
        return fused.decode_to_device(self.params, body, fH, fW)

    def compress_batch(self, ims):
        """Batch serving encode: B same-shape images -> list of B
        compressed objects in the single-image container layout
        ([body, (1, nH, nW, width)]). One batch-B unified executable codes
        all B images (incl. the lossless pixel head); decode the streams
        with `decompress_batch` at the SAME batch size — the compiled
        binary is part of the codec (see qarv/fused.py)."""
        return self.compress_batch_finish(self.compress_batch_async(ims))

    def compress_batch_async(self, ims):
        """Dispatch-only half of compress_batch (no synchronization);
        pair with compress_batch_finish — a serving loop dispatches batch
        k+1 before finishing batch k so the host payload pull overlaps
        device compute."""
        assert self.compressing, 'call compress_mode() first'
        assert getattr(self, 'coder_kind', 'host') == 'fused', \
            'compress_batch requires compress_mode(coder="fused")'
        ims = to_nhwc_batch(ims)
        self._check_input(ims)
        nB, imH, imW, _ = ims.shape
        nH = imH // self.net.max_stride
        nW = imW // self.net.max_stride
        fused = self._fused
        fhandle = fused.encode_batch_async(self.params, jnp.asarray(ims))
        return fused, fhandle, nH, nW

    def compress_batch_finish(self, handle):
        """Synchronize a compress_batch_async dispatch: pull the payloads
        (one bulk fetch) and return the B compressed objects."""
        fused, fhandle, nH, nW = handle
        bodies = fused.encode_batch_finish(fhandle)
        width = self.params['bias'].shape[-1]
        return [[b, (1, nH, nW, width)] for b in bodies]

    def decompress_batch_to_device(self, objs):
        """Batch decode of compress_batch outputs; (B,H,W,3) ON DEVICE."""
        assert self.compressing, 'call compress_mode() first'
        shapes = {o[-1] for o in objs}
        assert len(shapes) == 1, 'all batch streams must share one shape'
        _, fH, fW, _ = shapes.pop()
        import struct as _struct
        fields = {_struct.unpack('<H', o[0][8:10])[0] for o in objs}
        assert len(fields) == 1, \
            f'mixed lane counts / trunk kinds in batch: {fields}'
        lanes_field = fields.pop()
        fused = self._get_fused(lanes_field & 0x7FFF,
                                portable=bool(lanes_field & 0x8000))
        return fused.decode_batch_to_device(
            self.params, [o[0] for o in objs], fH, fW)

    def decompress_batch(self, objs):
        img = np.asarray(self.decompress_batch_to_device(objs))
        if img.dtype == np.uint8:          # lossless head returns exact u8
            return img.astype(np.float32) / 255.0
        return img.astype(np.float32)

    def compress_file(self, img_path, output_path, pad_hw=None,
                      portable=None):
        """Compress an image file (pickle container + original h/w,
        reference: qresvae/model.py:689-707). pad_hw: optional (H, W)
        shape bucket (see QarvModel.compress_file). FILES default to
        PORTABLE streams when the codec supports them (decode-anywhere
        semantics — see QarvModel.compress_file)."""
        img = Image.open(img_path).convert('RGB')
        if pad_hw is not None:
            img_padded = coding.pad_to_shape(img, *pad_hw)
        else:
            img_padded = coding.pad_divisible_by(img, div=self.net.max_stride)
        im = image_to_batch(img_padded)
        if portable is None and getattr(self, 'coder_kind', '') == 'fused':
            portable = self._fused.supports_portable
        compressed_obj = self.compress(im, portable=portable)
        compressed_obj.append((img.height, img.width))
        with open(output_path, 'wb') as f:
            pickle.dump(compressed_obj, file=f)

    def decompress_file(self, bits_path):
        with open(bits_path, 'rb') as f:
            compressed_obj = pickle.load(file=f)
        img_h, img_w = compressed_obj.pop()
        im_hat = self.decompress(compressed_obj)
        return im_hat[:, :img_h, :img_w, :]

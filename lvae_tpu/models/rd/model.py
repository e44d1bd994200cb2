"""RD-model: continuous-latent variable-rate VAE for estimating the R(D)
bound (ICIP 2023). No entropy coding — rate is the analytic Gaussian KL.

TPU-native re-design of reference lvae/models/rd/model.py.
"""
import math
from collections import defaultdict
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
import flax.linen as nn

from lvae_tpu.models import common
from lvae_tpu.models.common import gelu
from lvae_tpu.models.base import VAEModelBase, to_nhwc_batch, image_to_batch, batch_to_image
from lvae_tpu.utils import coding


class ConvNeXtAdaLNPatchDown(nn.Module):
    """AdaLN ConvNeXt block + patch downsample (reference: rd/model.py:16-24)."""
    dim: int
    out_ch: int
    down_rate: int = 2
    embed_dim: int = 256
    kernel_size: int = 7
    mlp_ratio: float = 2

    requires_embedding = True

    @nn.compact
    def __call__(self, x, emb):
        x = common.ConvNeXtBlockAdaLN(self.dim, self.embed_dim,
                                      kernel_size=self.kernel_size,
                                      mlp_ratio=self.mlp_ratio, name='block')(x, emb)
        return common.patch_downsample(self.out_ch, rate=self.down_rate,
                                       name='downsample')(x)


def linear_sqrt(x, threshold=6.0):
    """Soft companding: linear near 0, signed sqrt for large |x|
    (reference: rd/model.py:27-39)."""
    x_abs = jnp.abs(x)
    # pow(0, y) gradients are NaN; keep the argument strictly positive and
    # select the exact value for x == 0 afterwards
    safe_abs = jnp.where(x_abs == 0, 1.0, x_abs)
    soft = jnp.sign(x) * jnp.power(safe_abs, 1.0 - 0.5 * jnp.tanh(x_abs))
    soft = jnp.where(x_abs == 0, x, soft)
    signed_sqrt = jnp.sign(x) * jnp.sqrt(x_abs + 1e-8)
    return jnp.where(x_abs <= threshold, soft, signed_sqrt)


def gaussian_kl(mu1, v1, mu2, v2):
    """KL( N(mu1, v1^2) || N(mu2, v2^2) ) with standard deviations
    (reference: rd/model.py:41-49)."""
    return -0.5 + jnp.log(v2) - jnp.log(v1) + \
        0.5 * (v1 ** 2 + (mu1 - mu2) ** 2) / (v2 ** 2)


_SOFTPLUS_BETA = math.log(2.0)


def std_smooth(v, beta=_SOFTPLUS_BETA, threshold=12.0):
    """softplus with beta=ln2 (reference: rd/model.py:74-77; torch softplus
    reverts to identity when beta*x > threshold)."""
    return jnp.where(v * beta > threshold, v,
                     jax.nn.softplus(v * beta) / beta)


class LatentVariableBlock(nn.Module):
    """Continuous latent block with linear_sqrt companding
    (reference: rd/model.py:140-227). Set `use_linear_sqrt=False` for the
    'Old' variant (rd/model.py:52-137)."""
    width: int
    zdim: int
    embed_dim: int
    enc_width: Optional[int] = None
    kernel_size: int = 7
    mlp_ratio: float = 2
    use_linear_sqrt: bool = True

    is_latent_block = True
    requires_embedding = True

    def setup(self):
        w, ks, mr, ed = self.width, self.kernel_size, self.mlp_ratio, self.embed_dim
        B = common.ConvNeXtBlockAdaLN
        enc_width = self.enc_width or w
        self.resnet_front = B(w, ed, kernel_size=ks, mlp_ratio=mr)
        self.resnet_end = B(w, ed, kernel_size=ks, mlp_ratio=mr)
        self.posterior0 = B(enc_width, ed, kernel_size=ks)
        self.posterior1 = B(w, ed, kernel_size=ks)
        self.posterior2 = B(w, ed, kernel_size=ks)
        self.post_merge = common.conv_k1s1(w, name='post_merge')
        self.posterior = common.conv_k3s1(self.zdim * 2, name='posterior')
        self.prior = common.conv_k1s1(self.zdim * 2, name='prior')
        self.z_proj = common.conv_k1s1(w, name='z_proj')

    def transform_prior(self, feature, emb):
        feature = self.resnet_front(feature, emb)
        pm, pv = jnp.split(self.prior(feature), 2, axis=-1)
        if self.use_linear_sqrt:
            pm = linear_sqrt(pm)
        pv = std_smooth(pv)
        return feature, pm, pv

    def transform_posterior(self, feature, enc_feature, emb):
        enc_feature = self.posterior0(enc_feature, emb)
        feature = self.posterior1(feature, emb)
        merged = jnp.concatenate([feature, enc_feature], axis=-1)
        merged = self.post_merge(merged)
        merged = self.posterior2(merged, emb)
        qm, qv = jnp.split(self.posterior(merged), 2, axis=-1)
        if self.use_linear_sqrt:
            qm = linear_sqrt(qm)
        qv = std_smooth(qv)
        return qm, qv

    def forward_train(self, feature, enc_feature, emb, training: bool,
                      get_latent: bool = False):
        feature, pm, pv = self.transform_prior(feature, emb)
        qm, qv = self.transform_posterior(feature, enc_feature, emb)
        kl = gaussian_kl(qm.astype(jnp.float32), qv.astype(jnp.float32),
                         pm.astype(jnp.float32), pv.astype(jnp.float32))
        eps = jax.random.normal(self.make_rng('noise'), qm.shape, dtype=qm.dtype)
        z = qm + qv * eps
        feature = feature + self.z_proj(z)
        feature = self.resnet_end(feature, emb)
        stats = {'kl': kl}
        if get_latent:
            stats['z'] = jax.lax.stop_gradient(z)
        return feature, stats

    def forward_uncond(self, feature, emb, t=1.0, latent=None):
        feature, pm, pv = self.transform_prior(feature, emb)
        if latent is None:
            eps = jax.random.normal(self.make_rng('sample'), pm.shape)
            z = pm + pv * eps * t
        else:
            z = latent
        feature = feature + self.z_proj(z)
        return self.resnet_end(feature, emb)

    def __call__(self, feature, enc_feature, emb):  # init
        f, _ = self.forward_train(feature, enc_feature, emb, training=True)
        return f


# Backwards-compatible alias for the reference's non-companded variant
def LatentVariableBlockOld(width, zdim, embed_dim, enc_width=None,
                           kernel_size=7, mlp_ratio=2):
    return LatentVariableBlock(width, zdim, embed_dim, enc_width=enc_width,
                               kernel_size=kernel_size, mlp_ratio=mlp_ratio,
                               use_linear_sqrt=False)


MAX_LMB = 8192.0


class RDVAENet(nn.Module):
    """RD-model graph (reference: rd/model.py:252-445). Encoder features are
    keyed by spatial resolution (rd/model.py:230-244)."""
    enc_blocks: Tuple[Any, ...]
    dec_blocks: Tuple[Any, ...]
    im_shift: float
    im_scale: float
    max_stride: int = 64
    lmb_range: Tuple[float, float] = (4.0, 2048.0)
    lmb_embed_dim: Tuple[int, int] = (256, 256)
    sin_period: int = 64

    def setup(self):
        width = self.dec_blocks[0].width
        self.bias = self.param('bias', nn.initializers.zeros_init(), (1, 1, 1, width))
        self.lmb_embed_0 = nn.Dense(self.lmb_embed_dim[1], name='lmb_embed_0')
        self.lmb_embed_1 = nn.Dense(self.lmb_embed_dim[1], name='lmb_embed_1')

    def get_lmb_embedding(self, lmb):
        scaled = jnp.log(lmb) * (self.sin_period / math.log(MAX_LMB))
        emb = common.sinusoidal_embedding(scaled, dim=self.lmb_embed_dim[0],
                                          max_period=self.sin_period)
        return self.lmb_embed_1(gelu(self.lmb_embed_0(emb)))

    def encode(self, x, emb, remat: bool = False):
        features = {}
        for block in self.enc_blocks:
            if getattr(block, 'requires_embedding', False):
                x = common.apply_block(block, x, emb, remat=remat)
            else:
                x = common.apply_block(block, x, remat=remat)
            features[int(x.shape[1])] = x
        return features

    def seed_feature(self, batch, h, w):
        return jnp.broadcast_to(self.bias, (batch, h, w, self.bias.shape[-1]))

    def forward_end2end(self, im, lmb, training: bool = True,
                        get_latents: bool = False, remat: bool = False):
        x = (im + self.im_shift) * self.im_scale
        emb = self.get_lmb_embedding(lmb).astype(x.dtype)
        enc_features = self.encode(x, emb, remat=remat)
        min_res = min(enc_features.keys())
        f0 = enc_features[min_res]
        feature = self.seed_feature(f0.shape[0], f0.shape[1], f0.shape[2])
        stats_all = []
        for block in self.dec_blocks:
            if getattr(block, 'is_latent_block', False):
                key = int(feature.shape[1])
                feature, stats = common.apply_block(
                    block, feature, enc_features[key], emb, remat=remat,
                    method=lambda m, f, fe, e: m.forward_train(
                        f, fe, e, training, get_latents))
                stats_all.append(stats)
            elif getattr(block, 'requires_embedding', False):
                feature = common.apply_block(block, feature, emb, remat=remat)
            else:
                feature = common.apply_block(block, feature, remat=remat)
        return feature, stats_all

    def forward_sampling(self, lmb, latents, bhw_repeat, t=1.0):
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
            else:
                feature = block(feature)
        return feature

    def __call__(self, im, lmb):  # init
        feature, _ = self.forward_end2end(im, lmb, training=True)
        return feature


log2_e = math.log2(math.e)


class RDModel(VAEModelBase):
    """User-facing RD-model handle (reference: rd/model.py:252-590)."""

    def __init__(self, net: RDVAENet, seed=0, example_hw=64, log_images=()):
        self.lmb_range = tuple(float(v) for v in net.lmb_range)
        self.default_lmb = self.lmb_range[1]
        self._logging_images = list(log_images)
        self.net = net
        dummy = jnp.zeros((1, example_hw, example_hw, 3), jnp.float32)
        dummy_lmb = jnp.full((1,), self.lmb_range[1], jnp.float32)
        self.params = net.init({'params': jax.random.PRNGKey(seed),
                                'noise': jax.random.PRNGKey(1)},
                               dummy, dummy_lmb)['params']
        self.num_latents = sum(1 for b in net.dec_blocks
                               if getattr(b, 'is_latent_block', False))

    def sample_lmb(self, rng, n):
        """Log-uniform lambda sampling (reference: rd/model.py:338-347)."""
        low, high = self.lmb_range
        lo, hi = math.log(low), math.log(high)
        return jnp.exp(jax.random.uniform(rng, (n,), minval=lo, maxval=hi))

    def loss_and_stats(self, params, im, rng, lmb=None, training=True,
                       compute_dtype=None, remat=False):
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

    def forward(self, im, lmb=None, return_rec=False):
        im = to_nhwc_batch(im)
        nB = im.shape[0]
        lmb = self.default_lmb if lmb is None else lmb
        lmb_arr = jnp.full((nB,), float(lmb), jnp.float32) \
            if np.ndim(lmb) == 0 else jnp.asarray(lmb, jnp.float32)
        if not hasattr(self, '_jit_eval_fn'):
            def f(params, im, lmb):
                return self.loss_and_stats(params, im, jax.random.PRNGKey(0),
                                           lmb=lmb, training=True)
            self._jit_eval_fn = jax.jit(f)
        loss, stats = self._jit_eval_fn(self.params, im, lmb_arr)
        # one bulk fetch for the stat scalars (fixed per-transfer floor)
        from lvae_tpu import parallel
        stats = {k: float(v)
                 for k, v in parallel.fast_device_get(stats).items()}
        stats['psnr'] = -10 * math.log10(max(stats.pop('mse_im'), 1e-12))
        return stats

    # --- sampling ---------------------------------------------------------------
    def conditional_sample(self, lmb, latents, bhw_repeat=None, t=1.0, seed=0):
        if latents is None:
            latents = [None] * self.num_latents
            assert bhw_repeat is not None
            nB, nH, nW = bhw_repeat
        else:
            assert len(latents) == self.num_latents
            nB, nH, nW = latents[0].shape[0], latents[0].shape[1], latents[0].shape[2]
        lmb_arr = jnp.full((nB,), float(lmb), jnp.float32) \
            if np.ndim(lmb) == 0 else jnp.asarray(lmb, jnp.float32)
        feature = self.net.apply(
            {'params': self.params}, lmb_arr, list(latents), (nB, nH, nW), t,
            method=self.net.forward_sampling,
            rngs={'sample': jax.random.PRNGKey(seed)})
        return np.clip(np.asarray(feature), -1, 1) * 0.5 + 0.5

    def unconditional_sample(self, lmb, bhw_repeat, t=1.0, seed=0):
        return self.conditional_sample(lmb, None, bhw_repeat=bhw_repeat, t=t,
                                       seed=seed)

    def study(self, save_dir, **kwargs):
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        for k in (1, 2):
            ims = self.unconditional_sample(self.default_lmb, bhw_repeat=(6, k, k))
            grid = np.concatenate(list(ims), axis=1)
            batch_to_image(grid[None]).save(
                save_dir / f'samples_k{k}_hw{ims.shape[1]}.png')

    # --- evaluation (theoretical bpp; reference: rd/model.py:511-590) -----------
    def self_evaluate(self, img_dir, lmb_range=None, steps=8, log_dir=None):
        img_paths = sorted(Path(img_dir).rglob('*.*'))
        start, end = self.lmb_range if lmb_range is None else lmb_range
        p = 3.0
        lambdas = np.linspace(start ** (1 / p), end ** (1 / p), steps) ** p
        all_lmb_stats = defaultdict(list)
        for lmb in lambdas.tolist():
            results = self._self_evaluate(img_paths, lmb)
            for k, v in results.items():
                all_lmb_stats[k].append(v)
        return dict(all_lmb_stats)

    def _self_evaluate(self, img_paths, lmb: float):
        accum = defaultdict(float)
        count = 0
        for impath in img_paths:
            img = Image.open(impath).convert('RGB')
            im = image_to_batch(coding.crop_divisible_by(img, self.net.max_stride))
            stats = self.forward(im, lmb=lmb)
            count += 1
            accum['loss'] += stats['loss']
            accum['bpp'] += stats['bppix']
            accum['psnr'] += stats['psnr']
        avg = {k: v / count for k, v in accum.items()}
        avg['lambda'] = lmb
        return avg

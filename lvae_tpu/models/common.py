"""NN building blocks (L1) — NHWC flax.linen modules.

TPU-native re-design of reference lvae/models/common.py and the block classes
in lvae/models/qresvae/model.py:120-192. Differences from the reference are
deliberate TPU choices:
  * NHWC layout (XLA's preferred conv layout on TPU) instead of NCHW
  * exact (erf) GELU to match torch.nn.functional.gelu numerics
  * PixelShuffle implemented as reshape+transpose with torch-compatible
    channel ordering (for weight porting)
Parameters are float32; compute dtype is configurable per model.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def gelu(x):
    # torch F.gelu default is the exact erf formulation; jax defaults to tanh
    return jax.nn.gelu(x, approximate=False)


def apply_block(block, *args, remat: bool = False, method=None):
    """Apply one NN block, optionally under gradient rematerialization.

    remat=True lifts the single block application through
    ``flax.linen.remat`` (jax.checkpoint): the backward pass recomputes this
    block's activations instead of keeping them resident in HBM for the
    whole forward. Applied per block — the same granularity the reference
    would get from torch.utils.checkpoint around each module — peak
    activation memory drops from O(depth) to O(1) blocks while the extra
    FLOPs stay one forward pass. On TPU this is the standard lever for
    fitting larger per-chip batches (HBM, not MXU, is the usual ceiling).

    ``method``: optional ``fn(module, *args)`` to call instead of
    ``module.__call__`` (used for latent blocks' forward_train, closing
    over static Python bools). Non-Module blocks (plain callables) cannot
    be lifted and are invoked directly.
    """
    fn = method if method is not None else (lambda m, *a: m(*a))
    if remat and isinstance(block, nn.Module):
        return nn.remat(fn)(block, *args)
    return fn(block, *args)


# ---------------------------------------------------------------------------
# Conv factories (reference: common.py:8-45)
# ---------------------------------------------------------------------------

def get_conv(out_ch, kernel_size, stride, padding, zero_bias=True,
             zero_weights=False, name=None):
    """NHWC conv. Bias zero-initialized by default (reference common.py:8-14)."""
    kinit = nn.initializers.zeros_init() if zero_weights else nn.initializers.lecun_normal()
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return nn.Conv(out_ch, (kernel_size, kernel_size), strides=(stride, stride),
                   padding=padding, kernel_init=kinit,
                   bias_init=nn.initializers.zeros_init(), name=name)


def conv_k1s1(out_ch, zero_bias=True, zero_weights=False, name=None):
    return get_conv(out_ch, 1, 1, 0, zero_bias, zero_weights, name=name)


def conv_k3s1(out_ch, zero_bias=True, zero_weights=False, name=None):
    return get_conv(out_ch, 3, 1, 1, zero_bias, zero_weights, name=name)


def conv_k5s1(out_ch, zero_bias=True, zero_weights=False, name=None):
    return get_conv(out_ch, 5, 1, 2, zero_bias, zero_weights, name=name)


def conv_k3s2(out_ch, name=None):
    return get_conv(out_ch, 3, 2, 1, name=name)


def pixel_shuffle(x, rate):
    """Depth-to-space with torch.nn.PixelShuffle channel ordering.

    NHWC input (B,H,W,C*r*r) -> (B,H*r,W*r,C); channel index c*r*r + i*r + j
    maps to spatial offset (i, j), matching torch semantics so ported weights
    reproduce identical outputs.
    """
    B, H, W, CRR = x.shape
    r = rate
    C = CRR // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B H i W j C
    return x.reshape(B, H * r, W * r, C)


class patch_downsample(nn.Module):
    """Strided conv downsample (reference: common.py:29-30)."""
    out_ch: int
    rate: int = 2

    @nn.compact
    def __call__(self, x):
        return get_conv(self.out_ch, self.rate, self.rate, 0, name='conv')(x)


class patch_upsample(nn.Module):
    """1x1 conv + PixelShuffle (reference: common.py:33-38)."""
    out_ch: int
    rate: int = 2

    @nn.compact
    def __call__(self, x):
        x = get_conv(self.out_ch * self.rate ** 2, 1, 1, 0, name='conv')(x)
        return pixel_shuffle(x, self.rate)


class deconv(nn.Module):
    """Transposed conv upsample (reference: common.py:40-45). Output size is
    exactly stride * input size. Padding follows the torch
    ConvTranspose2d(padding=k//2, output_padding=stride-1) convention so
    ported weights (spatially flipped, see models/port.py) reproduce
    identical outputs."""
    out_ch: int
    kernel_size: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        p = k // 2
        lo, hi = k - 1 - p, k - 1 - p + (s - 1)
        return nn.ConvTranspose(self.out_ch, (k, k), strides=(s, s),
                                padding=[(lo, hi), (lo, hi)], name='conv')(x)


class upsample_nearest(nn.Module):
    """Nearest-neighbor upsample (torch nn.Upsample equivalent; used by
    qres17m, reference qresvae/zoo.py:139-141)."""
    rate: int = 2

    def __call__(self, x):
        x = jnp.repeat(x, self.rate, axis=1)
        return jnp.repeat(x, self.rate, axis=2)


# ---------------------------------------------------------------------------
# Graph markers (reference: common.py:48-66)
# ---------------------------------------------------------------------------

class SetKey(nn.Module):
    """Identity marker tagging a feature-tap position in a block list."""
    key: str

    def __call__(self, x):
        return x


class CompressionStopFlag(nn.Module):
    """Identity marker: encode-side early stop (reference: common.py:59-66).
    During `compress`, blocks after this marker need not execute."""

    def __call__(self, x):
        return x


# ---------------------------------------------------------------------------
# Lambda embedding (reference: common.py:101-107)
# ---------------------------------------------------------------------------

def sinusoidal_embedding(values, dim=256, max_period=64):
    """Sinusoidal embedding of a (B,) vector."""
    assert values.ndim == 1 and dim % 2 == 0
    exponents = jnp.linspace(0.0, 1.0, dim // 2)
    freqs = jnp.power(float(max_period), -1.0 * exponents)
    args = values[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


# ---------------------------------------------------------------------------
# Residual blocks
# ---------------------------------------------------------------------------

class Mlp(nn.Module):
    """2-layer MLP acting on the channel axis (timm.layers.mlp.Mlp analog)."""
    hidden_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, name='fc1')(x)
        x = gelu(x)
        x = nn.Dense(self.out_features, name='fc2')(x)
        return x


def dw_shift_add_enabled():
    """Depthwise-conv lowering policy (read at trace time).

    XLA-TPU assigns grouped convolutions a channel-shuffled activation
    layout, inserting {3,0,2,1} relayout copies around every depthwise conv
    in the train step (runs/train-topops-r3.txt: copies dominate the
    profile while matmul/conv is ~2 ms). With LVAE_DW_MODE=shift the
    depthwise conv is instead expressed as K*K shifted multiply-adds — pure
    NHWC elementwise ops that fuse into one VPU loop, giving XLA no reason
    to change layouts. Same parameters, same math (different f32 summation
    order, so NOT for the legacy bit-exact codec trunk — the portable
    Pallas trunk has its own in-kernel depthwise loop)."""
    import os
    return os.environ.get('LVAE_DW_MODE', '') == 'shift'


class DepthwiseConvShiftAdd(nn.Module):
    """Depthwise conv as shifted multiply-adds (layout-neutral on TPU).

    Parameter-compatible with nn.Conv(feature_group_count=dim): kernel
    (K, K, 1, dim), bias (dim,) under the same module name."""
    dim: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (K, K, 1, self.dim))
        bias = self.param('bias', nn.initializers.zeros_init(), (self.dim,))
        p = (K - 1) // 2
        H, W = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        k = kernel.astype(x.dtype).reshape(K, K, self.dim)
        out = jnp.zeros_like(x) + bias.astype(x.dtype)
        for di in range(K):
            for dj in range(K):
                out = out + xp[:, di:di + H, dj:dj + W, :] * k[di, dj]
        return out


def depthwise_conv(dim, kernel_size, name):
    """The depthwise conv used by ConvNeXt blocks; lowering picked by
    dw_shift_add_enabled() (parameters identical either way)."""
    if dw_shift_add_enabled():
        return DepthwiseConvShiftAdd(dim, kernel_size, name=name)
    pad = (kernel_size - 1) // 2
    return nn.Conv(dim, (kernel_size, kernel_size),
                   padding=[(pad, pad), (pad, pad)], feature_group_count=dim,
                   bias_init=nn.initializers.zeros_init(), name=name)


class ConvNeXtBlockAdaLN(nn.Module):
    """ConvNeXt block with adaptive LayerNorm conditioning
    (reference: common.py:110-161).

    depthwise conv k -> LN (no affine) -> AdaLN shift/scale from embedding ->
    MLP -> gamma layer-scale -> residual.
    """
    dim: int
    embed_dim: Optional[int] = None
    out_dim: Optional[int] = None
    kernel_size: int = 7
    mlp_ratio: float = 2
    residual: bool = True
    ls_init_value: float = 1e-6

    requires_embedding = True
    default_embedding_dim = 256

    @nn.compact
    def __call__(self, x, emb):
        dim = self.dim
        out_dim = self.out_dim or dim
        shortcut = x
        x = depthwise_conv(dim, self.kernel_size, name='conv_dw')(x)
        in_dtype = x.dtype
        # LN statistics in f32 (bf16 variance is too noisy), output back in
        # the compute dtype so bf16 runs stay bf16
        x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         name='norm')(x.astype(jnp.float32)).astype(in_dtype)
        # AdaLN: per-sample shift/scale from the conditioning embedding
        e = gelu(emb)
        e = nn.Dense(2 * dim, name='embedding_layer')(e)
        shift, scale = jnp.split(e, 2, axis=-1)
        x = x * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
        hidden = int(self.mlp_ratio * dim)
        x = Mlp(hidden, out_dim, name='mlp')(x)
        if self.ls_init_value >= 0:
            gamma = self.param('gamma',
                               nn.initializers.constant(self.ls_init_value),
                               (out_dim,))
            x = x * gamma
        if self.residual:
            x = x + shortcut
        return x


class MyConvNeXtBlock(nn.Module):
    """Plain ConvNeXt block, mlp_ratio=2 (reference: qresvae/model.py:162-182,
    wrapping timm's ConvNeXtBlock)."""
    dim: int
    kernel_size: int = 7
    mlp_ratio: float = 2
    ls_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = depthwise_conv(self.dim, self.kernel_size, name='conv_dw')(x)
        in_dtype = x.dtype
        x = nn.LayerNorm(epsilon=1e-6, name='norm')(
            x.astype(jnp.float32)).astype(in_dtype)
        x = Mlp(int(self.mlp_ratio * self.dim), self.dim, name='mlp')(x)
        gamma = self.param('gamma', nn.initializers.constant(self.ls_init_value),
                           (self.dim,))
        x = x * gamma
        return x + shortcut


class MyConvNeXtPatchDown(nn.Module):
    """ConvNeXt block followed by patch downsample
    (reference: qresvae/model.py:184-192)."""
    dim: int
    out_ch: int
    down_rate: int = 2
    kernel_size: int = 7
    mlp_ratio: float = 2

    @nn.compact
    def __call__(self, x):
        x = MyConvNeXtBlock(self.dim, kernel_size=self.kernel_size,
                            mlp_ratio=self.mlp_ratio, name='block')(x)
        return patch_downsample(self.out_ch, rate=self.down_rate,
                                name='downsample')(x)


class VDBlock(nn.Module):
    """VDVAE-style 4-conv bottleneck residual block
    (reference: qresvae/model.py:120-149)."""
    hidden_ch: int
    out_ch: int
    residual: bool = True
    use_3x3: bool = True
    zero_last: bool = False
    # post-init residual scaling factor applied to c4's weights; mirrors
    # reference residual_scaling() (qresvae/model.py:138-141)
    rescale_last: float = 1.0

    @nn.compact
    def __call__(self, x):
        c = conv_k3s1 if self.use_3x3 else conv_k1s1
        xhat = conv_k1s1(self.hidden_ch, name='c1')(gelu(x))
        xhat = c(self.hidden_ch, name='c2')(gelu(xhat))
        xhat = c(self.hidden_ch, name='c3')(gelu(xhat))
        if self.zero_last:
            kinit = nn.initializers.zeros_init()
        elif self.rescale_last != 1.0:
            base = nn.initializers.lecun_normal()
            s = self.rescale_last

            def kinit(key, shape, dtype=jnp.float32):
                return base(key, shape, dtype) * s
        else:
            kinit = nn.initializers.lecun_normal()
        xhat = nn.Conv(self.out_ch, (1, 1), kernel_init=kinit,
                       bias_init=nn.initializers.zeros_init(), name='c4')(gelu(xhat))
        return (x + xhat) if self.residual else xhat


class VDBlockPatchDown(nn.Module):
    """VDBlock + patch downsample (reference: qresvae/model.py:151-159)."""
    dim: int
    out_ch: int
    down_rate: int = 2

    @nn.compact
    def __call__(self, x):
        x = VDBlock(hidden_ch=round(self.dim * 0.25), out_ch=self.dim,
                    residual=True, name='block')(x)
        return patch_downsample(self.out_ch, rate=self.down_rate,
                                name='downsample')(x)

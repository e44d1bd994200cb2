"""Unit tests for L1 building blocks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvae_tpu.models import common


def test_pixel_shuffle_matches_torch(rng_np):
    import torch
    B, H, W, C, r = 2, 3, 5, 4, 2
    x = rng_np.normal(size=(B, H, W, C * r * r)).astype(np.float32)
    got = np.asarray(common.pixel_shuffle(jnp.asarray(x), r))
    # torch operates in NCHW
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.PixelShuffle(r)(xt).permute(0, 2, 3, 1).numpy()
    assert np.allclose(got, want)


def test_gelu_matches_torch(rng_np):
    import torch
    x = rng_np.normal(size=(100,)).astype(np.float32)
    got = np.asarray(common.gelu(jnp.asarray(x)))
    want = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    assert np.allclose(got, want, atol=1e-6)


def test_sinusoidal_embedding_matches_reference_formula(rng_np):
    vals = rng_np.uniform(0, 64, 5).astype(np.float32)
    dim, max_period = 32, 64
    got = np.asarray(common.sinusoidal_embedding(jnp.asarray(vals), dim, max_period))
    exponents = np.linspace(0, 1, dim // 2)
    freqs = np.power(float(max_period), -exponents)
    args = vals[:, None] * freqs[None, :]
    want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # f32 trig of large arguments differs from f64 by ~1e-4
    assert np.allclose(got, want, atol=5e-4)


@pytest.mark.parametrize('cls,kwargs,needs_emb', [
    (common.MyConvNeXtBlock, dict(dim=8, kernel_size=3), False),
    (common.ConvNeXtBlockAdaLN, dict(dim=8, embed_dim=16, kernel_size=3), True),
    (common.VDBlock, dict(hidden_ch=4, out_ch=8), False),
])
def test_residual_blocks_shape_preserving(cls, kwargs, needs_emb, rng_np):
    x = jnp.asarray(rng_np.normal(size=(2, 8, 8, 8)).astype(np.float32))
    m = cls(**kwargs)
    if needs_emb:
        emb = jnp.asarray(rng_np.normal(size=(2, 16)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x, emb)
        y = m.apply(params, x, emb)
    else:
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_patch_down_up_shapes(rng_np):
    x = jnp.asarray(rng_np.normal(size=(1, 16, 16, 6)).astype(np.float32))
    down = common.patch_downsample(12, rate=4)
    p = down.init(jax.random.PRNGKey(0), x)
    y = down.apply(p, x)
    assert y.shape == (1, 4, 4, 12)
    up = common.patch_upsample(6, rate=4)
    p = up.init(jax.random.PRNGKey(0), y)
    z = up.apply(p, y)
    assert z.shape == (1, 16, 16, 6)
    dc = common.deconv(3, kernel_size=5, stride=2)
    p = dc.init(jax.random.PRNGKey(0), x)
    w = dc.apply(p, x)
    assert w.shape == (1, 32, 32, 3)
    un = common.upsample_nearest(rate=4)
    assert un(x).shape == (1, 64, 64, 6)


def test_zero_init_conventions():
    """Bias zero-init and prior zero-weights (reference: common.py:8-14,
    qresvae/model.py:233-234)."""
    x = jnp.ones((1, 4, 4, 4))
    conv = common.get_conv(8, 3, 1, 1, zero_weights=True)
    p = conv.init(jax.random.PRNGKey(0), x)
    assert np.all(np.asarray(p['params']['kernel']) == 0)
    assert np.all(np.asarray(p['params']['bias']) == 0)
    assert np.all(np.asarray(conv.apply(p, x)) == 0)


def test_rd_math_helpers(rng_np):
    import torch
    import torch.nn.functional as tnf
    from lvae_tpu.models.rd.model import linear_sqrt, std_smooth, gaussian_kl
    x = rng_np.normal(0, 4, 300).astype(np.float32)
    x[0] = 0.0
    x[1] = 10.0
    got = np.asarray(linear_sqrt(jnp.asarray(x)))
    xt = torch.from_numpy(x)
    soft = torch.sign(xt) * torch.pow(torch.abs(xt), 1 - 0.5 * torch.tanh(torch.abs(xt)))
    soft = torch.where(torch.abs(xt) == 0, xt, soft)
    ssqrt = torch.sign(xt) * torch.sqrt(torch.abs(xt) + 1e-8)
    want = torch.where(torch.abs(xt) <= 6.0, soft, ssqrt).numpy()
    assert np.allclose(got, want, atol=5e-4)

    v = rng_np.normal(0, 8, 300).astype(np.float32)
    got = np.asarray(std_smooth(jnp.asarray(v)))
    want = tnf.softplus(torch.from_numpy(v), beta=float(np.log(2)), threshold=12).numpy()
    assert np.allclose(got, want, atol=5e-4)

    # analytic KL sanity: zero when distributions equal
    z = np.zeros(4, np.float32)
    o = np.ones(4, np.float32)
    kl = np.asarray(gaussian_kl(jnp.asarray(z), jnp.asarray(o),
                                jnp.asarray(z), jnp.asarray(o)))
    assert np.allclose(kl, 0, atol=1e-6)

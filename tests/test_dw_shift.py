"""Depthwise-conv lowering parity (LVAE_DW_MODE=shift).

The shift-add lowering (common.DepthwiseConvShiftAdd) exists to eliminate
the {3,0,2,1} relayout copies XLA-TPU inserts around grouped convolutions
in the train step (runs/train-topops-r3.txt). It must be
parameter-compatible and numerically equivalent (up to f32 summation
order) with nn.Conv(feature_group_count=dim).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvae_tpu.models import common


@pytest.fixture()
def shift_mode():
    os.environ['LVAE_DW_MODE'] = 'shift'
    yield
    os.environ.pop('LVAE_DW_MODE', None)


def test_shift_add_matches_grouped_conv(shift_mode):
    rng = np.random.default_rng(0)
    B, H, W, C, K = 2, 10, 14, 24, 7
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    dw = common.DepthwiseConvShiftAdd(C, K)
    params = dw.init(jax.random.PRNGKey(0), x)['params']
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.2, a.shape), a.dtype), params)
    out = dw.apply({'params': params}, x)
    ref = jax.lax.conv_general_dilated(
        x, params['kernel'], (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=C) + params['bias']
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_convnext_block_same_params_and_output_across_modes():
    """The same ConvNeXt param tree must evaluate equivalently whether the
    depthwise conv lowers to a grouped conv or shifted multiply-adds —
    checkpoints are interchangeable across the modes."""
    rng = np.random.default_rng(1)
    B, H, W, C, E = 1, 8, 8, 16, 32
    blk = common.ConvNeXtBlockAdaLN(C, E, kernel_size=5)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    emb = jnp.asarray(rng.normal(0, 1, (B, E)).astype(np.float32))

    os.environ.pop('LVAE_DW_MODE', None)
    params = blk.init(jax.random.PRNGKey(0), x, emb)['params']
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.1, a.shape), a.dtype), params)
    ref = blk.apply({'params': params}, x, emb)

    os.environ['LVAE_DW_MODE'] = 'shift'
    try:
        # identical param STRUCTURE under shift mode
        p2 = blk.init(jax.random.PRNGKey(0), x, emb)['params']
        assert jax.tree.structure(p2) == jax.tree.structure(params)
        assert all(a.shape == b.shape for a, b in
                   zip(jax.tree.leaves(p2), jax.tree.leaves(params)))
        out = blk.apply({'params': params}, x, emb)
    finally:
        os.environ.pop('LVAE_DW_MODE', None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_shift_add_gradients_finite(shift_mode):
    rng = np.random.default_rng(2)
    C, K = 8, 3
    x = jnp.asarray(rng.normal(0, 1, (1, 6, 6, C)).astype(np.float32))
    dw = common.DepthwiseConvShiftAdd(C, K)
    params = dw.init(jax.random.PRNGKey(0), x)['params']

    def loss(p, x):
        return jnp.sum(dw.apply({'params': p}, x) ** 2)

    g = jax.grad(loss)(params, x)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
    # grad wrt kernel must match the conv formulation's
    ref_g = jax.grad(
        lambda p, x: jnp.sum((jax.lax.conv_general_dilated(
            x, p['kernel'], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=C) + p['bias']) ** 2))(params, x)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

"""Gradient rematerialization (--remat): per-block jax.checkpoint.

jax.checkpoint is semantically a no-op — the backward pass recomputes
activations instead of storing them — so remat=True must reproduce the
non-remat loss and gradients up to float reassociation: the recomputed
forward fuses differently inside the backward program, so individual
gradient elements can drift at the 1e-6-absolute level (measured; NOT
bitwise). These tests pin semantic equality for all three families'
loss paths at tolerances just above that fusion noise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lvae_tpu


def _loss_and_grads(model, im, remat, **kw):
    def f(params):
        loss, stats = model.loss_and_stats(
            params, im, jax.random.PRNGKey(7), training=True,
            remat=remat, **kw)
        return loss
    loss, grads = jax.jit(jax.value_and_grad(f))(model.params)
    return jax.device_get(loss), jax.device_get(grads)


def _assert_tree_close(a, b, rtol=1e-3, atol=2e-5):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            la, lb, rtol=rtol, atol=atol,
            err_msg=f'grad mismatch at {jax.tree_util.keystr(path)}')


@pytest.mark.parametrize('name,kw', [
    ('qarv_tiny', {}),
    ('qres_tiny', {}),
    ('rd_tiny', {}),
])
def test_remat_matches_plain_grads(name, kw):
    model = lvae_tpu.get_model(name)
    rng = np.random.default_rng(3)
    im = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    loss0, g0 = _loss_and_grads(model, im, remat=False, **kw)
    loss1, g1 = _loss_and_grads(model, im, remat=True, **kw)
    np.testing.assert_allclose(loss0, loss1, rtol=1e-6)
    _assert_tree_close(g0, g1)


def test_remat_with_bf16_compute():
    """remat composes with the --amp bf16 compute path."""
    model = lvae_tpu.get_model('qarv_tiny')
    rng = np.random.default_rng(4)
    im = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    loss0, g0 = _loss_and_grads(model, im, remat=False,
                                compute_dtype='bfloat16')
    loss1, g1 = _loss_and_grads(model, im, remat=True,
                                compute_dtype='bfloat16')
    # bf16 activations + refused recompute: grad noise floor is bf16-level
    np.testing.assert_allclose(loss0, loss1, rtol=1e-3)
    _assert_tree_close(g0, g1, rtol=3e-2, atol=1e-3)


def test_remat_train_step_runs():
    """One full jitted train step with remat (the --remat trainer path)."""
    from lvae_tpu import parallel
    from lvae_tpu.training.optim import create_train_state, make_train_step
    model = lvae_tpu.get_model('qarv_tiny')
    mesh = parallel.get_data_mesh()
    state, tx = create_train_state(model.params, optimizer='adam', ema=True)
    state = parallel.replicate(state, mesh)

    def loss_fn(params, batch, rng):
        return model.loss_and_stats(params, batch, rng, training=True,
                                    remat=True)

    step = make_train_step(loss_fn, tx, accum_num=1, grad_clip=2.0,
                           use_ema=True)
    repl = parallel.replicated_sharding(mesh)
    data = parallel.data_sharding(mesh)
    step = jax.jit(step, in_shardings=(repl, data, repl, repl, repl, repl),
                   out_shardings=(repl, repl))
    rng = np.random.default_rng(5)
    batch = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)), jnp.float32)
    state, metrics = step(state, batch, jax.random.PRNGKey(0),
                          jnp.float32(1e-4), jnp.float32(1e9),
                          jnp.float32(0.999))
    assert np.isfinite(float(metrics['loss']))

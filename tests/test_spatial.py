"""Spatial partitioning (SP) over the virtual CPU mesh.

Activations shard along image HEIGHT ('space' axis); XLA's SPMD
partitioner inserts the conv halo exchanges and stat reductions. These
tests pin (a) numerical agreement with the unsharded forward and (b) the
composite 2-D (data, space) sharding of the full train step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lvae_tpu
from lvae_tpu import parallel


@pytest.fixture(scope='module')
def image256():
    rng = np.random.default_rng(11)
    from scipy.ndimage import gaussian_filter
    im = gaussian_filter(rng.uniform(0, 1, (256, 128, 3)), sigma=(3, 3, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    return np.round(im * 255).astype(np.float32)[None] / 255


def test_spatial_eval_matches_unsharded(image256):
    """H-sharded forward stats must match the single-device forward
    (GSPMD reorders reductions, so tolerance is small-but-nonzero)."""
    m = lvae_tpu.get_model('qarv_tiny')
    ref = m.forward(image256, lmb=512)

    mesh = parallel.get_2d_mesh(1, 2)
    stats = parallel.spatial_eval(m, image256, mesh, lmb=512)
    for k in ('loss', 'bppix', 'psnr'):
        assert np.isfinite(stats[k])
        assert stats[k] == pytest.approx(ref[k], rel=2e-3), \
            (k, stats[k], ref[k])

    mesh4 = parallel.get_2d_mesh(1, 4)
    stats4 = parallel.spatial_eval(m, image256, mesh4, lmb=512)
    assert stats4['loss'] == pytest.approx(ref['loss'], rel=2e-3)


def test_train_step_2d_data_space_mesh(image256):
    """The FULL train step (grads, Adam, EMA) compiles and runs with the
    batch sharded over 'data' AND image height sharded over 'space' on a
    2x2 mesh; updated params stay replicated and the loss matches the
    1-device step."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lvae_tpu.training.optim import create_train_state, make_train_step

    model = lvae_tpu.get_model('qarv_tiny')

    def loss_fn(params, batch, rng):
        return model.loss_and_stats(params, batch, rng, training=True)

    rng0 = np.random.default_rng(3)
    batch = rng0.uniform(0, 1, (4, 128, 64, 3)).astype(np.float32)

    def run(mesh, batch_sharding):
        state, tx = create_train_state(model.params, optimizer='adam',
                                       ema=True)
        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, repl)
        step_fn = make_train_step(loss_fn, tx, accum_num=1, grad_clip=2.0,
                                  wdecay=0.0, use_ema=True)
        train_step = jax.jit(step_fn,
                             in_shardings=(repl, batch_sharding, repl,
                                           repl, repl, repl),
                             out_shardings=(repl, repl))
        b = jax.device_put(batch, batch_sharding)
        state, metrics = train_step(state, b, jax.random.PRNGKey(7),
                                    jnp.float32(1e-4), jnp.float32(1e9),
                                    jnp.float32(0.999))
        return state, float(metrics['loss'])

    mesh1 = parallel.get_data_mesh(devices=jax.devices()[:1])
    _, loss1 = run(mesh1, NamedSharding(mesh1, P()))

    mesh22 = parallel.get_2d_mesh(2, 2)
    state22, loss22 = run(mesh22, parallel.image_sharding(mesh22))
    assert np.isfinite(loss22)
    assert loss22 == pytest.approx(loss1, rel=2e-3), (loss22, loss1)

    leaf = jax.tree.leaves(state22.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

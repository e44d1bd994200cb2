"""Spatial partitioning (SP): shard image HEIGHT across the mesh.

TPU-native capability with no reference counterpart (the reference is a
single-GPU torch codebase): for large inputs, activations of the whole
conv stack are partitioned along H over a 'space' mesh axis and XLA's SPMD
partitioner inserts the halo exchanges every (depthwise/strided) conv
needs, plus the cross-device reductions for the KL/MSE statistics. Useful
standalone for high-resolution forward/eval (a 4K image's activations do
not fit one chip comfortably), and composable with data parallelism on a
2-D (data, space) mesh so one jitted train step runs batch-sharded AND
height-sharded.

Sharding rules (NHWC):
  images       P('data', 'space')    batch over data, H over space
  params/state P()                   replicated
XLA derives every intermediate layout from those constraints — no manual
collectives, per the standard jax scaling recipe (annotate + let GSPMD
insert psum/halo/all-gather).

Constraint: H must be divisible by (n_space * net.max_stride) so the
deepest latent grid still splits evenly across the space axis.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['get_2d_mesh', 'image_sharding', 'spatial_eval']


def get_2d_mesh(n_data, n_space, devices=None,
                axis_names=('data', 'space')):
    """2-D (data, space) mesh over n_data*n_space devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_space
    assert len(devices) >= need, \
        f'need {need} devices for a {n_data}x{n_space} mesh, ' \
        f'have {len(devices)}'
    grid = np.asarray(devices[:need]).reshape(n_data, n_space)
    return Mesh(grid, axis_names)


def image_sharding(mesh, axis_names=('data', 'space')):
    """NHWC image sharding: batch over 'data', height over 'space'."""
    return NamedSharding(mesh, P(*axis_names))


def _check_spatial_shape(model, im, n_space):
    s = model.net.max_stride
    H = im.shape[1]
    assert H % (n_space * s) == 0, \
        f'H={H} must divide by n_space*max_stride={n_space * s} for ' \
        f'spatial sharding'


def spatial_eval(model, im, mesh, lmb=None):
    """forward-eval statistics with activations sharded along H.

    im: (B, H, W, 3) float32 in [0, 1]; mesh: from get_2d_mesh (any
    n_data; a (1, n) mesh gives pure spatial sharding of one image).
    Returns the same stats dict as model.forward (loss/bppix/mse/psnr).
    """
    import math
    im = np.asarray(im)
    n_space = mesh.devices.shape[1]
    _check_spatial_shape(model, im, n_space)
    nB = im.shape[0]
    if lmb is None:
        lmb = getattr(model, 'default_lmb', None)
    args = ()
    if lmb is not None:      # lambda-conditioned families (QARV)
        args = (jnp.full((nB,), float(lmb), jnp.float32),)

    repl = NamedSharding(mesh, P())
    imsh = image_sharding(mesh)
    key = ('spatial_eval', mesh.shape_tuple, im.shape)
    cache = model.__dict__.setdefault('_spatial_progs', {})
    fn = cache.get(key)
    if fn is None:
        def stats_fn(params, x, *extra):
            lmb_arr = extra[0] if extra else None
            _, stats = model.loss_and_stats(
                params, x, jax.random.PRNGKey(0), lmb=lmb_arr,
                training=False)
            return stats
        fn = jax.jit(stats_fn,
                     in_shardings=(repl, imsh) + (repl,) * len(args),
                     out_shardings=repl)
        cache[key] = fn
    x = jax.device_put(jnp.asarray(im), imsh)
    stats = fn(model.params, x, *args)
    stats = {k: float(v) for k, v in stats.items()}
    if 'mse_im' in stats:
        stats['psnr'] = -10 * math.log10(max(stats.pop('mse_im'), 1e-12))
    return stats

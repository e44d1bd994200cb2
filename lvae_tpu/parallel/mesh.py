"""Device mesh + sharding helpers (the DP layer).

TPU-native replacement for the reference's DDP/NCCL plumbing
(reference: lvae/trainer.py:101-123, SURVEY.md §2.3): a 1-D `data` mesh over
all chips; parameters replicated, batches sharded over 'data'. XLA inserts
the gradient all-reduce over ICI/DCN automatically when the jitted train
step is compiled with these shardings.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['init_distributed', 'get_data_mesh', 'shard_batch', 'replicate',
           'data_sharding', 'replicated_sharding', 'process_count',
           'process_index', 'local_batch_slice']


def init_distributed():
    """Initialize multi-host jax if a coordinator is configured.

    Single-host runs need nothing; multi-host launchers set the standard
    JAX coordination env vars. This replaces torchrun + init_process_group
    (reference: trainer.py:110-121)."""
    addr = os.environ.get('JAX_COORDINATOR_ADDRESS')
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ.get('JAX_NUM_PROCESSES', '1')),
            process_id=int(os.environ.get('JAX_PROCESS_ID', '0')))
    elif int(os.environ.get('JAX_PROCESS_COUNT', '1')) > 1:
        jax.distributed.initialize()


def process_count():
    return jax.process_count()


def process_index():
    return jax.process_index()


def get_data_mesh(axis_name='data', devices=None):
    """1-D mesh over all (or given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def data_sharding(mesh, axis_name='data'):
    """Batch sharding: leading axis split over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name='data'):
    """Place a host numpy batch onto the mesh, sharded over its first axis."""
    return jax.device_put(batch, data_sharding(mesh, axis_name))


def replicate(tree, mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)


def local_batch_slice(global_batch_size):
    """This host's share of the global batch."""
    n = jax.process_count()
    assert global_batch_size % n == 0
    return global_batch_size // n


_PACK_CACHE = {}    # (n_leaves, dtype-group layout) -> jitted pack fn


def fast_device_get(tree):
    """device_get a large pytree via a few BULK transfers.

    jax.device_get fetches per leaf; on high-latency runtimes (tunneled
    TPU) each fetch pays a fixed ~27 ms floor, so a 1600-leaf train state
    takes minutes. Here a jitted program concatenates all raveled leaves
    into ONE buffer per dtype on device; the host pulls those few buffers
    at full bandwidth and slices the leaves back out. The jitted pack fn is
    cached by leaf-group layout so repeated checkpoint/eval calls don't
    re-trace the ~1600-leaf concatenate each time.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx_by_dtype = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            idx_by_dtype.setdefault(jnp.dtype(leaf.dtype).name, []).append(i)
    if not idx_by_dtype:
        return jax.device_get(tree)

    cache_key = (len(leaves),
                 tuple((d, tuple(idxs)) for d, idxs in idx_by_dtype.items()))
    pack = _PACK_CACHE.get(cache_key)
    if pack is None:
        groups = tuple(tuple(idxs) for idxs in idx_by_dtype.values())

        @jax.jit
        def pack(ls):
            return [jnp.concatenate([ls[i].reshape(-1) for i in idxs])
                    if len(idxs) > 1 else ls[idxs[0]].reshape(-1)
                    for idxs in groups]

        if len(_PACK_CACHE) > 8:
            _PACK_CACHE.clear()
        _PACK_CACHE[cache_key] = pack

    packed = jax.device_get(pack(leaves))
    out = list(leaves)
    for buf, idxs in zip(packed, idx_by_dtype.values()):
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            out[i] = np.asarray(buf[off:off + n]).reshape(leaves[i].shape)
            off += n
    for i, leaf in enumerate(leaves):   # non-array leaves pass through
        if not isinstance(leaf, jax.Array):
            out[i] = leaf
    return jax.tree_util.tree_unflatten(treedef, out)

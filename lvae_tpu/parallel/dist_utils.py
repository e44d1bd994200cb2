"""Distributed debug/verification utilities.

TPU-native equivalents of reference lvae/utils/ddp.py (barrier,
broadcast_object, check_model_equivalence, sync_model_buffers). Built on
jax collectives + multihost utils instead of torch.distributed send/recv.
"""
import jax
import numpy as np

__all__ = ['barrier', 'broadcast_object', 'check_model_equivalence',
           'sync_params_from_host0']


def barrier(name='barrier'):
    """Cross-host sync point (reference: ddp.py:17-22)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def broadcast_object(obj, root=0):
    """Broadcast a picklable object from host `root` to all hosts
    (reference: ddp.py:49-57)."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(
        obj, is_source=jax.process_index() == root)


def check_model_equivalence(params, mesh=None, atol=0.0):
    """Verify parameters are identical across all devices of a mesh
    (reference: ddp.py:60-95). For replicated pytrees this compares every
    device copy against device 0's values. Returns True when equivalent."""
    ok = True
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        arr = jax.device_get(leaf)
        shards = getattr(leaf, 'addressable_shards', None)
        if shards is None or len(shards) <= 1:
            continue
        ref = np.asarray(shards[0].data)
        for sh in shards[1:]:
            if not np.allclose(np.asarray(sh.data), ref, atol=atol, rtol=0):
                ok = False
                print(f'parameter mismatch across devices at {path}')
                break
    return ok


def sync_params_from_host0(params):
    """Force all hosts to adopt host 0's parameters (reference ddp.py:98-117
    sync_model_buffers analog)."""
    if jax.process_count() == 1:
        return params
    from jax.experimental import multihost_utils
    flat, treedef = jax.tree_util.tree_flatten(jax.device_get(params))
    flat = [multihost_utils.broadcast_one_to_all(
        x, is_source=jax.process_index() == 0) for x in flat]
    return jax.tree_util.tree_unflatten(treedef, flat)

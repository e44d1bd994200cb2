"""Checkpoint save/restore (reference: lvae/trainer.py:254-282, 485-543).

Layout mirrors the reference: `last` / `best` / `last_ema` (+ `failed` on
NaN abort). Uses Orbax when available (async-capable, TPU-native), with a
flax-msgpack fallback so checkpoints also work in minimal environments.
"""
import shutil
from pathlib import Path

import jax
import numpy as np
import flax.serialization

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
    # orbax's per-save INFO logging is extremely chatty
    import logging as _logging
    for _name in ('orbax', 'orbax.checkpoint', 'absl'):
        _logging.getLogger(_name).setLevel(_logging.WARNING)
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

__all__ = ['save_checkpoint', 'load_checkpoint', 'checkpoint_exists']


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path, tree, use_orbax=None):
    """Save a pytree checkpoint to `path` (a directory for orbax, a file for
    msgpack)."""
    path = Path(path).resolve()
    use_orbax = _HAS_ORBAX if use_orbax is None else use_orbax
    tree = _to_host(tree)
    if use_orbax:
        if path.exists():
            shutil.rmtree(path, ignore_errors=True)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, tree)
    else:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(flax.serialization.to_bytes(tree))


def load_checkpoint(path, template=None):
    """Load a checkpoint saved by save_checkpoint. `template` (a pytree with
    the right structure) is required for the msgpack format and recommended
    for orbax."""
    path = Path(path).resolve()
    if path.is_dir():
        assert _HAS_ORBAX, f'{path} is an orbax checkpoint but orbax is missing'
        with ocp.PyTreeCheckpointer() as ckptr:
            if template is not None:
                return ckptr.restore(path, item=_to_host(template))
            return ckptr.restore(path)
    data = path.read_bytes()
    assert template is not None, 'msgpack restore needs a template pytree'
    return flax.serialization.from_bytes(template, data)


def checkpoint_exists(path):
    path = Path(path)
    return path.is_dir() or path.is_file()

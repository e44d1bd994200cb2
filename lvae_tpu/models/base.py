"""Shared infrastructure for user-facing model handles.

A "model handle" pairs a flax.linen network definition with its parameter
pytree and exposes the reference's user API (forward / compress / sample /
...). Handles are what `lvae_tpu.get_model(...)` returns.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
import flax.serialization


def to_nhwc_batch(im) -> jnp.ndarray:
    """Accept (B,H,W,3), (B,3,H,W), or (H,W,3) arrays in [0,1]; return
    float32 NHWC batch."""
    arr = np.asarray(im, dtype=np.float32) if not isinstance(im, jnp.ndarray) else im
    if arr.ndim == 3:
        arr = arr[None]
    assert arr.ndim == 4, f'bad image batch shape {arr.shape}'
    if arr.shape[1] == 3 and arr.shape[3] != 3:
        arr = jnp.transpose(jnp.asarray(arr), (0, 2, 3, 1))
    return jnp.asarray(arr, jnp.float32)


def image_to_batch(img: Image.Image) -> jnp.ndarray:
    """PIL image -> (1,H,W,3) float32 in [0,1]."""
    arr = np.asarray(img.convert('RGB'), dtype=np.float32) / 255.0
    return jnp.asarray(arr)[None]


def batch_to_image(batch) -> Image.Image:
    """(1,H,W,3) float array in [0,1] -> PIL image."""
    arr = np.asarray(batch)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return Image.fromarray(arr)


class VAEModelBase:
    """Base class for model handles: owns the network + parameters."""

    def __init__(self, net, seed=0, example_hw=64):
        self.net = net
        dummy = jnp.zeros((1, example_hw, example_hw, 3), jnp.float32)
        variables = net.init({'params': jax.random.PRNGKey(seed)}, dummy)
        self.params = variables['params']

    @property
    def max_stride(self):
        return self.net.max_stride

    def num_params(self):
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))

    # --- checkpoint IO -------------------------------------------------------

    def save_weights(self, path):
        data = flax.serialization.to_bytes(self.params)
        Path(path).write_bytes(data)

    def load_weights(self, path):
        data = Path(path).read_bytes()
        restored = flax.serialization.from_bytes(self.params, data)
        # Weight files may be stored at reduced precision (the committed
        # checkpoint is float16 to halve the repo footprint). Push the
        # STORED precision and cast on device: host->device bandwidth is
        # the scarce resource on tunneled runtimes (the f32 host-cast of
        # the 187 MB f16 checkpoint doubled the upload), while the
        # per-leaf device casts are microseconds of VPU time.
        restored = jax.device_put(restored)
        # keep params DEVICE-RESIDENT: host numpy params would be
        # re-uploaded in full on every jitted call (373 MB per dispatch for
        # qarv_base through a tunneled runtime)
        self.params = jax.tree.map(
            lambda t, r: r if r.dtype == t.dtype else r.astype(t.dtype),
            self.params, restored)

    def load_state_dict(self, params):
        """Replace the parameter pytree (trainer/EMA integration)."""
        jax.tree.map(lambda a, b: None, self.params, params)  # structure check
        self.params = params

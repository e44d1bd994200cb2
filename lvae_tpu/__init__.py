"""lvae_tpu: a TPU-native (JAX/XLA/Pallas) framework for lossy & lossless image
compression with hierarchical ResNet VAEs.

Provides the same capabilities as the reference `lossy-vae` research codebase
(QRes-VAE / QARV / RD-model families) re-designed TPU-first:
  * NHWC data layout, bf16-friendly compute, f32 probability math
  * single-XLA-program encode path (no per-block host sync)
  * native C host rANS entropy coder (interleaved-lane design)
  * data-parallel training via jax.sharding Mesh + jit

Top-level API (mirrors reference lvae/__init__.py:1-2):
    from lvae_tpu import get_model, known_datasets
"""

from lvae_tpu.registry import get_model, register_model
from lvae_tpu.paths import known_datasets

# Import zoos so that @register_model decorators run.
import lvae_tpu.models.qresvae.zoo  # noqa: F401
import lvae_tpu.models.qarv.zoo  # noqa: F401
import lvae_tpu.models.rd.zoo  # noqa: F401
import lvae_tpu.models.rd.zoo_ablation  # noqa: F401
import lvae_tpu.models.dev_zoo  # noqa: F401

__version__ = '0.1.0'

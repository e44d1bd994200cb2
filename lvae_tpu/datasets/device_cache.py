"""Device-resident dataset cache (L5).

Keeps the ENTIRE uint8 training set in accelerator memory and builds each
batch ON DEVICE (gather + crop + flip in one tiny jitted program). The
per-step host->device traffic drops from the full pixel batch (3.1 MB at
batch 16 crop 256 — ~100 ms through a tunneled runtime, the largest
non-device term in the r3 train-step profile) to one (B, 4) int32
parameter array.

Sampling indices and augmentation parameters are still drawn on the HOST
with the exact ShardedSampler + per-batch-number rng scheme the threaded
loader uses (datasets/loader.py), so batches are BITWISE IDENTICAL to the
host loader's uint8 batches (tested in tests/test_device_cache.py) and
--fixseed runs stay reproducible regardless of loader choice.

Use when the raw dataset fits device memory alongside model + optimizer
state (e.g. 512 images x 512x768x3 uint8 = 603 MB; a v5e has 16 GB).
Single-process only: with multi-host DP each host sees only its shard of
the global batch — the trainer falls back to the threaded loader there.

Reference parity note: the reference has no equivalent (its GPUs read
from a torch DataLoader, reference lvae/datasets/loader.py:7-32); this is
a TPU-side throughput feature on top of the same sampling semantics.
"""
import numpy as np

import jax
import jax.numpy as jnp

from lvae_tpu.datasets.loader import ShardedSampler

__all__ = ['DeviceDataLoader']


class DeviceDataLoader:
    """Infinite device-resident batch iterator (drop-in for the threaded
    loader's iterator; yields committed device arrays sharded over the
    mesh's data axis instead of host numpy)."""

    def __init__(self, dataset, batch_size, mesh, num_shards=1, shard_id=0,
                 seed=0, max_bytes=8 << 30):
        from lvae_tpu import parallel
        tr = dataset.transform
        assert tr.crop, 'device data cache requires a crop size'
        self.crop = int(tr.crop)
        self.hflip = bool(tr.hflip)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.shard_id = int(shard_id)
        self.sampler = ShardedSampler(len(dataset), num_shards, shard_id,
                                      seed)
        c = self.crop
        # host-side stacking; images smaller than the crop are reflect-
        # padded EXACTLY as RandomCropFlip does, so the crop-coordinate rng
        # draws below see the same (h, w) ranges as the host loader
        from lvae_tpu.datasets.image import reflect_pad_to
        arrs, dims = [], []
        for i in range(len(dataset)):
            a = reflect_pad_to(dataset._load_u8(i), c)
            dims.append(a.shape[:2])
            arrs.append(a)
        maxH = max(d[0] for d in dims)
        maxW = max(d[1] for d in dims)
        nbytes = len(arrs) * maxH * maxW * 3
        assert nbytes <= max_bytes, (
            f'device data cache would need {nbytes / 1e9:.1f} GB '
            f'({len(arrs)} images padded to {maxH}x{maxW}); use the '
            'threaded loader (--no-device_data) for datasets this large')
        stack = np.zeros((len(arrs), maxH, maxW, 3), np.uint8)
        for i, a in enumerate(arrs):
            stack[i, :a.shape[0], :a.shape[1]] = a
        self.dims = np.asarray(dims, np.int64)
        # replicated images + data-sharded output: each device slices its
        # own batch shard locally, no collective. Batches that don't divide
        # over the mesh (not reachable from the trainer, which asserts
        # divisibility) fall back to replicated output.
        self.images = jax.device_put(stack,
                                     parallel.replicated_sharding(mesh))
        if self.batch_size % mesh.devices.size == 0:
            out_sh = parallel.data_sharding(mesh)
        else:
            out_sh = parallel.replicated_sharding(mesh)

        def build(images, prm):
            imgs = images[prm[:, 0]]                     # (B,maxH,maxW,3)

            def crop1(img, top, left, flip):
                cpd = jax.lax.dynamic_slice(
                    img, (top, left, jnp.int32(0)), (c, c, 3))
                return jnp.where(flip > 0, cpd[:, ::-1], cpd)

            return jax.vmap(crop1)(imgs, prm[:, 1], prm[:, 2], prm[:, 3])

        self._build = jax.jit(build, out_shardings=out_sh)
        self._bn = 0

    def _params_for(self, bn):
        """(B, 4) int32 [image index, crop top, crop left, hflip] — same
        rng stream and draw ORDER as loader.make_trainloader.build_batch +
        RandomCropFlip, hence bitwise-equal batches."""
        from lvae_tpu.datasets.loader import batch_rng
        B = self.batch_size
        rng = batch_rng(self.seed, self.shard_id, bn)
        out = np.zeros((B, 4), np.int32)
        c = self.crop
        for j in range(B):
            i = self.sampler.index_at(bn * B + j)
            h, w = (int(v) for v in self.dims[i])
            top = int(rng.integers(0, h - c + 1))
            left = int(rng.integers(0, w - c + 1))
            flip = 1 if (self.hflip and rng.random() < 0.5) else 0
            out[j] = (i, top, left, flip)
        return out

    def __iter__(self):
        return self

    def __next__(self):
        prm = self._params_for(self._bn)
        self._bn += 1
        # epoch bookkeeping (set_epoch/logging parity with the host loader)
        self.sampler.epoch = (self._bn * self.batch_size) \
            // self.sampler.shard_len
        return self._build(self.images, jnp.asarray(prm))

    def stop(self):
        pass

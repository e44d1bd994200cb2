"""Training data loader (L5).

Replaces the reference's torch DataLoader + DistributedSampler
(reference: lvae/datasets/loader.py:7-32) with a thread-prefetched infinite
numpy loader. Multi-host data sharding is index-based: host k of N draws
only indices congruent to k mod N, re-shuffled every epoch from a shared
seed — the jax-native equivalent of DistributedSampler + set_epoch.
"""
import queue
import threading

import numpy as np

__all__ = ['make_trainloader', 'ShardedSampler']


class ShardedSampler:
    """Deterministic per-host epoch shuffling (DistributedSampler analog)."""

    def __init__(self, num_items, num_shards=1, shard_id=0, seed=0):
        self.num_items = num_items
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.seed = seed
        self.epoch = 0

    def epoch_indices(self, epoch):
        rng = np.random.default_rng(self.seed + epoch)
        perm = rng.permutation(self.num_items)
        return perm[self.shard_id::self.num_shards]

    def __iter__(self):
        while True:
            for idx in self.epoch_indices(self.epoch):
                yield int(idx)
            self.epoch += 1

    def set_epoch(self, epoch):
        self.epoch = epoch


def make_trainloader(dataset, batch_size: int, workers: int = 2,
                     num_shards: int = 1, shard_id: int = 0, seed: int = 0,
                     prefetch: int = 4):
    """Infinite generator of (B,H,W,3) float32 batches + its sampler.

    workers: number of loader threads (PIL decode releases the GIL for the
    heavy part, so threads are effective without subprocess overhead).
    """
    sampler = ShardedSampler(len(dataset), num_shards, shard_id, seed)
    index_iter = iter(sampler)
    index_lock = threading.Lock()
    q = queue.Queue(maxsize=max(prefetch, 1))
    stop = threading.Event()

    def worker(worker_id):
        rng = np.random.default_rng((seed + 1) * 100003 + shard_id * 1009 + worker_id)
        while not stop.is_set():
            with index_lock:
                idxs = [next(index_iter) for _ in range(batch_size)]
            batch = np.stack([dataset.get(i, rng) for i in idxs])
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    threads = [threading.Thread(target=worker, args=(w,), daemon=True)
               for w in range(max(workers, 1))]
    for t in threads:
        t.start()

    class _Loader:
        """Infinite batch iterator with explicit shutdown."""

        def __iter__(self):
            return self

        def __next__(self):
            return q.get()

        def stop(self):
            stop.set()

    return _Loader(), sampler

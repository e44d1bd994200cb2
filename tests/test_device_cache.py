"""Device-resident dataset cache: bitwise parity with the threaded host
loader, sharding, and determinism (lvae_tpu/datasets/device_cache.py)."""
import numpy as np


def _make_dataset(tmp_path, sizes, crop=64, seed=5):
    from PIL import Image
    from lvae_tpu.datasets import get_image_dateset
    rng = np.random.default_rng(seed)
    d = tmp_path / 'imgs'
    d.mkdir()
    for i, (h, w) in enumerate(sizes):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f'im{i}.png')
    ds = get_image_dateset(str(d), transform_cfg=f'crop={crop},hflip=True')
    ds.out_dtype = np.dtype(np.uint8)
    return ds


def test_device_loader_matches_host_loader(tmp_path):
    """Batches must be BITWISE identical to the threaded loader's: the
    device path replays the same ShardedSampler indices and rng draw order
    (incl. the reflect-pad small-image case), so --fixseed runs are
    loader-independent."""
    import jax
    from lvae_tpu import parallel
    from lvae_tpu.datasets import make_trainloader
    from lvae_tpu.datasets.device_cache import DeviceDataLoader

    # mixed sizes incl. one smaller than the crop (reflect-pad path)
    ds = _make_dataset(tmp_path, [(80, 96), (70, 90), (64, 64), (50, 72),
                                  (100, 100)])
    mesh = parallel.get_data_mesh()

    host_loader, _ = make_trainloader(ds, batch_size=8, workers=1, seed=7)
    host_batches = [next(host_loader).copy() for _ in range(6)]
    host_loader.stop()

    dev_loader = DeviceDataLoader(ds, batch_size=8, mesh=mesh, seed=7)
    for i in range(6):
        got = np.asarray(next(dev_loader))
        assert got.dtype == np.uint8
        assert np.array_equal(got, host_batches[i]), f'batch {i} differs'

    # output is committed and sharded over the data axis
    b = next(dev_loader)
    assert b.sharding == parallel.data_sharding(mesh)
    assert len(b.sharding.device_set) == len(jax.devices())


def test_device_loader_sharded_sampling(tmp_path):
    """Per-shard streams must match the host loader's per-shard streams."""
    from lvae_tpu import parallel
    from lvae_tpu.datasets import make_trainloader
    from lvae_tpu.datasets.device_cache import DeviceDataLoader

    ds = _make_dataset(tmp_path, [(72, 80)] * 6, seed=9)
    mesh = parallel.get_data_mesh()
    for shard_id in (0, 1):
        host_loader, _ = make_trainloader(
            ds, batch_size=4, workers=1, num_shards=2, shard_id=shard_id,
            seed=3)
        want = [next(host_loader).copy() for _ in range(4)]
        host_loader.stop()
        dev = DeviceDataLoader(ds, batch_size=4, mesh=mesh, num_shards=2,
                               shard_id=shard_id, seed=3)
        for i in range(4):
            assert np.array_equal(np.asarray(next(dev)), want[i])


def test_device_loader_capacity_guard(tmp_path):
    import pytest
    from lvae_tpu import parallel
    from lvae_tpu.datasets.device_cache import DeviceDataLoader

    ds = _make_dataset(tmp_path, [(80, 96)] * 2, seed=1)
    mesh = parallel.get_data_mesh()
    with pytest.raises(AssertionError, match='device data cache'):
        DeviceDataLoader(ds, batch_size=2, mesh=mesh, max_bytes=1000)

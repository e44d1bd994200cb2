"""Training-runtime tests on the virtual 8-device CPU mesh: DP sharding,
grad accumulation, EMA, spike LR cut, checkpoint save/restore, schedules."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lvae_tpu
from lvae_tpu import parallel
from lvae_tpu.training.optim import create_train_state, make_train_step
from lvae_tpu.training.schedules import lr_factor
from lvae_tpu.training import checkpoint as ckpt


@pytest.fixture(scope='module')
def setup():
    model = lvae_tpu.get_model('qres_tiny', lmb=64)
    mesh = parallel.get_data_mesh()
    state, tx = create_train_state(model.params, optimizer='adam', ema=True)
    state = parallel.replicate(state, mesh)

    def loss_fn(params, batch, rng):
        return model.loss_and_stats(params, batch, rng, training=True)

    return model, mesh, state, tx, loss_fn


def _jit_step(step_fn, mesh):
    repl = parallel.replicated_sharding(mesh)
    data = parallel.data_sharding(mesh)
    return jax.jit(step_fn,
                   in_shardings=(repl, data, repl, repl, repl, repl),
                   out_shardings=(repl, repl))


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, 'conftest must provide 8 virtual devices'


def test_dp_train_steps_decrease_nothing_nan(setup):
    model, mesh, state, tx, loss_fn = setup
    step_fn = make_train_step(loss_fn, tx, accum_num=1, grad_clip=2.0,
                              wdecay=0.0, use_ema=True)
    train_step = _jit_step(step_fn, mesh)
    rng = jax.random.PRNGKey(0)
    batch = np.random.default_rng(0).uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
    batch = parallel.shard_batch(batch, mesh)
    losses = []
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, batch, sub, jnp.float32(1e-3),
                                    jnp.float32(1e9), jnp.float32(0.99))
        losses.append(float(metrics['loss']))
        assert math.isfinite(losses[-1])
        assert float(metrics['grad_norm']) > 0
    assert int(jax.device_get(state.step)) == 3
    # params must stay replicated-identical across devices
    assert parallel.dist_utils.check_model_equivalence(state.params)


def test_grad_accumulation_matches_big_batch(setup):
    """accum_num=2 over two half-batches == one step over the full batch."""
    model, mesh, _, tx, loss_fn = setup
    rng = np.random.default_rng(1)
    full = rng.uniform(0, 1, (16, 64, 64, 3)).astype(np.float32)
    key = jax.random.PRNGKey(42)

    state0, tx0 = create_train_state(model.params, optimizer='adam', ema=False)
    big = make_train_step(loss_fn, tx0, accum_num=1, grad_clip=1e9,
                          wdecay=0.0, use_ema=False)
    sb, _ = jax.jit(big)(state0, full, key, jnp.float32(1e-3),
                         jnp.float32(1e9), jnp.float32(0.99))

    state1, tx1 = create_train_state(model.params, optimizer='adam', ema=False)
    acc = make_train_step(loss_fn, tx1, accum_num=2, grad_clip=1e9,
                          wdecay=0.0, use_ema=False)
    acc = jax.jit(acc)
    # same rng key for both microbatches would double-count the same noise
    # pattern only if shapes matched the full batch; here the point is the
    # accumulator math, so reuse the key deliberately
    sa, _ = acc(state1, full[:8], key, jnp.float32(1e-3),
                jnp.float32(1e9), jnp.float32(0.99))
    sa, _ = acc(sa, full[8:], key, jnp.float32(1e-3),
                jnp.float32(1e9), jnp.float32(0.99))
    # parameters moved (update applied on the 2nd microstep)
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), sa.params, model.params)
    assert max(jax.tree.leaves(moved)) > 0
    assert int(jax.device_get(sa.accum_count)) == 0


def test_spike_lr_cut_and_ema_skip(setup):
    model, mesh, _, tx, loss_fn = setup
    state, tx2 = create_train_state(model.params, optimizer='adam', ema=True)
    step_fn = jax.jit(make_train_step(loss_fn, tx2, accum_num=1,
                                      grad_clip=1e9, wdecay=0.0, use_ema=True))
    batch = np.random.default_rng(2).uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    # grad_median tiny -> spike triggers: EMA must stay identical to params' old value
    s1, m1 = step_fn(state, batch, key, jnp.float32(1e-3),
                     jnp.float32(1e-12), jnp.float32(0.5))
    ema_moved = max(jax.tree.leaves(jax.tree.map(
        lambda e, p0: float(jnp.max(jnp.abs(e - p0))),
        s1.ema_params, model.params)))
    assert ema_moved == 0.0, 'EMA must not update on spike steps'


def test_nonfinite_grad_step_is_skipped(setup):
    """A batch that produces non-finite grads must leave params, EMA and
    step-to-step trainability intact (optim.py non-finite guard): the
    r5-mixed40k 40k-step run died at step 6162 when one overflowed bf16
    forward NaN-poisoned all 93M params through the clip (NaN*scale=NaN)."""
    model, mesh, _, tx, loss_fn = setup
    state, tx3 = create_train_state(model.params, optimizer='adam', ema=True)
    step_fn = jax.jit(make_train_step(loss_fn, tx3, accum_num=1,
                                      grad_clip=2.0, wdecay=0.0,
                                      use_ema=True))
    key = jax.random.PRNGKey(0)
    good = np.random.default_rng(3).uniform(
        0, 1, (4, 64, 64, 3)).astype(np.float32)
    bad = good.copy()
    bad[0, 0, 0, 0] = np.nan          # poisons loss and every gradient
    s1, m1 = step_fn(state, bad, key, jnp.float32(1e-3),
                     jnp.float32(1e9), jnp.float32(0.5))
    assert not math.isfinite(float(m1['grad_norm']))
    # params and EMA bitwise unchanged — the update was skipped
    p_moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s1.params, model.params)))
    e_moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s1.ema_params, model.params)))
    assert p_moved == 0.0 and e_moved == 0.0
    # training continues: the next good batch takes a normal finite step
    s2, m2 = step_fn(s1, good, key, jnp.float32(1e-3),
                     jnp.float32(1e9), jnp.float32(0.5))
    assert math.isfinite(float(m2['loss']))
    assert math.isfinite(float(m2['grad_norm']))
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s2.params, s1.params)))
    assert moved > 0
    assert all(bool(jnp.all(jnp.isfinite(leaf)))
               for leaf in jax.tree.leaves(s2.params))


def test_checkpoint_roundtrip(tmp_path, setup):
    model, mesh, state, tx, loss_fn = setup
    host_state = jax.device_get(state)
    payload = {'state': host_state, 'iter': 7, 'epoch': 0.5, 'best_loss': 1.23}
    ckpt.save_checkpoint(tmp_path / 'last', payload)
    restored = ckpt.load_checkpoint(tmp_path / 'last', payload)
    assert int(restored['iter']) == 7
    a = jax.tree.leaves(host_state.params)[0]
    b = jax.tree.leaves(restored['state'].params)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_lr_schedules():
    # warmup ramp
    assert lr_factor(0, 100, 'constant', warmup=10) == pytest.approx(0.1)
    assert lr_factor(9, 100, 'constant', warmup=10) == pytest.approx(1.0)
    # constant
    assert lr_factor(50, 100, 'constant') == 1.0
    # cosine endpoints
    assert lr_factor(0, 100, 'cosine', warmup=0) == pytest.approx(1.0)
    assert lr_factor(99, 100, 'cosine', warmup=0, lrf_min=0.01) == pytest.approx(0.01)
    # const-0.5-cos
    assert lr_factor(49, 100, 'const-0.5-cos') == 1.0
    assert lr_factor(99, 100, 'const-0.5-cos', lrf_min=0.01) == pytest.approx(0.01)


def test_dataset_and_loader(tmp_path):
    from PIL import Image
    from lvae_tpu.datasets import get_image_dateset, make_trainloader
    rng = np.random.default_rng(0)
    d = tmp_path / 'imgs'
    d.mkdir()
    for i in range(4):
        arr = rng.integers(0, 255, (70 + i, 90, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f'im{i}.png')
    ds = get_image_dateset(str(d), transform_cfg='crop=64,hflip=True')
    assert len(ds) == 4
    loader, sampler = make_trainloader(ds, batch_size=2, workers=1)
    b = next(loader)
    assert b.shape == (2, 64, 64, 3)
    assert b.dtype == np.float32 and 0 <= b.min() and b.max() <= 1
    loader.stop()
    # sharded sampling covers all items across shards with no overlap
    from lvae_tpu.datasets import ShardedSampler
    s0 = ShardedSampler(10, num_shards=2, shard_id=0, seed=1)
    s1 = ShardedSampler(10, num_shards=2, shard_id=1, seed=1)
    i0 = set(s0.epoch_indices(0).tolist())
    i1 = set(s1.epoch_indices(0).tolist())
    assert i0 | i1 == set(range(10)) and not (i0 & i1)


def test_parse_helpers():
    from lvae_tpu.training.trainer import parse_model_args
    assert parse_model_args('lmb=2048,flag=True,x=1.5') == \
        {'lmb': 2048, 'flag': True, 'x': 1.5}
    assert parse_model_args('') == {}


def test_bd_rate_known_value():
    from lvae_tpu.utils.coding import bd_rate
    # identical curves -> 0% BD-rate
    r = [0.1, 0.3, 0.7, 1.5]
    p = [30.0, 34.0, 38.0, 42.0]
    assert abs(bd_rate(r, p, r, p)) < 1e-9
    # uniformly 10% cheaper curve -> -10%
    r2 = [x * 0.9 for x in r]
    assert abs(bd_rate(r, p, r2, p) - (-10.0)) < 1e-6


def test_bd_rate_committed_anchors():
    """RDList BD-rate on the real committed result files (reference:
    lvae/utils/coding.py:167-267 + results/*.json): QARV and QRes-VAE each
    beat the VTM 18.0 anchor on Kodak by the known margins."""
    from pathlib import Path
    from lvae_tpu.utils.coding import RDList
    root = Path(__file__).resolve().parent.parent / 'results' / 'kodak'
    rd = RDList()
    rd.add_json(root / 'kodak-vtm18.0.json', label='vtm18.0')
    rd.add_json(root / 'kodak-qarv_base.json', label='qarv_base')
    rd.add_json(root / 'kodak-qres34m.json', label='qres34m')
    rd.set_bdrate_anchor('vtm18.0')
    out = rd.compute_bdrate()
    assert abs(out['vtm18.0']) < 1e-9
    assert abs(out['qarv_base'] - (-5.899)) < 0.05
    assert abs(out['qres34m'] - (-4.086)) < 0.05


def test_loader_determinism_across_worker_counts(tmp_path):
    """--fixseed reproducibility: batch stream depends only on
    (seed, shard, batch_number), not on worker count or thread timing
    (round-1 used a shared index iterator and was scheduling-dependent)."""
    from PIL import Image
    from lvae_tpu.datasets import get_image_dateset, make_trainloader
    rng = np.random.default_rng(3)
    d = tmp_path / 'imgs'
    d.mkdir()
    for i in range(5):
        arr = rng.integers(0, 255, (80, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f'im{i}.png')
    ds = get_image_dateset(str(d), transform_cfg='crop=64,hflip=True')

    def first_batches(workers, n=6):
        loader, _ = make_trainloader(ds, batch_size=2, workers=workers,
                                     seed=7)
        out = [next(loader).copy() for _ in range(n)]
        loader.stop()
        return out

    a = first_batches(1)
    b = first_batches(3)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_decode_cache_matches_direct(tmp_path):
    """decode_cache=True must return byte-identical samples (it only moves
    PNG decode out of the per-epoch hot loop) and reuse a valid cache."""
    from PIL import Image
    from lvae_tpu.datasets import get_image_dateset
    rng = np.random.default_rng(11)
    d = tmp_path / 'imgs'
    d.mkdir()
    for i in range(4):
        arr = rng.integers(0, 255, (70 + 10 * i, 90, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f'im{i}.png')
    plain = get_image_dateset(str(d), transform_cfg='crop=64,hflip=True')
    cached = get_image_dateset(str(d), transform_cfg='crop=64,hflip=True',
                               decode_cache=True)
    assert (d / '.lvae_u8cache' / 'blob.bin').is_file()
    for i in range(len(plain)):
        a = plain.get(i, np.random.default_rng(i))
        b = cached.get(i, np.random.default_rng(i))
        assert np.array_equal(a, b)
    # a second construction must REUSE the blob (same inode/mtime)
    m0 = (d / '.lvae_u8cache' / 'blob.bin').stat().st_mtime_ns
    again = get_image_dateset(str(d), transform_cfg='crop=64',
                              decode_cache=True)
    assert (d / '.lvae_u8cache' / 'blob.bin').stat().st_mtime_ns == m0
    assert np.array_equal(again._load_u8(2), plain._load_u8(2))

"""2-process multi-host validation on CPU.

The reference validates DP only on real multi-GPU boxes via torchrun
(qresvae/README.md:105-109); the TPU-native answer is jax.distributed over
multiple OS processes. This test launches TWO separate Python processes
(4 virtual CPU devices each -> 8 global), exercising
parallel/mesh.init_distributed (jax.distributed.initialize + coordinator
rendezvous), cross-process collectives, per-host batch sharding, and the
dist_utils param-equivalence checker — the code paths a single-process
8-device mesh never reaches.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 4)
    sys.path.insert(0, os.environ['LVAE_REPO'])
    from lvae_tpu.parallel import mesh as pmesh
    from lvae_tpu.parallel import dist_utils

    pmesh.init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    m = pmesh.get_data_mesh()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # global array sharded over both processes' devices
    gshape = (16, 4)
    global_arr = np.arange(np.prod(gshape), dtype=np.float32).reshape(gshape)
    local = pmesh.local_batch_slice(gshape[0])
    start = jax.process_index() * local
    arrs = jax.make_array_from_process_local_data(
        pmesh.data_sharding(m), global_arr[start:start + local])

    @jax.jit
    def global_sum(x):
        return jnp.sum(x)

    s = float(global_sum(arrs))
    expect = float(global_arr.sum())
    assert abs(s - expect) < 1e-3, (s, expect)

    # replicated params equivalence across processes
    params = {'w': jnp.full((3, 3), 1.5), 'b': jnp.zeros((3,))}
    params = pmesh.replicate(params, m)
    assert dist_utils.check_model_equivalence(params, mesh=m)
    dist_utils.barrier('end')
    print(f'rank {jax.process_index()} OK', flush=True)
""")


_TRAIN_WORKER = textwrap.dedent("""
    import os, sys, hashlib
    import numpy as np
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 4)
    sys.path.insert(0, os.environ['LVAE_REPO'])
    import jax.numpy as jnp
    from lvae_tpu.parallel import mesh as pmesh
    from lvae_tpu.parallel import dist_utils
    import lvae_tpu
    from lvae_tpu.training.optim import create_train_state, make_train_step

    pmesh.init_distributed()
    m = pmesh.get_data_mesh()
    model = lvae_tpu.get_model('qres_tiny')

    state, tx = create_train_state(model.params, optimizer='adam', ema=True)
    state = pmesh.replicate(state, m)

    def loss_fn(params, batch, rng):
        return model.loss_and_stats(params, batch, rng, training=True)

    step_fn = make_train_step(loss_fn, tx, accum_num=1, grad_clip=2.0,
                              use_ema=True)
    repl = pmesh.replicated_sharding(m)
    data = pmesh.data_sharding(m)
    step = jax.jit(step_fn, in_shardings=(repl, data, repl, repl, repl, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))

    gbs = 8
    batch_np = np.random.default_rng(3).uniform(
        0, 1, (gbs, 64, 64, 3)).astype(np.float32)
    local = pmesh.local_batch_slice(gbs)
    start = jax.process_index() * local
    batch = jax.make_array_from_process_local_data(
        data, batch_np[start:start + local])

    for i in range(2):
        rng = jax.random.PRNGKey(42 + i)
        state, metrics = step(state, batch, rng, jnp.float32(1e-3),
                              jnp.float32(1e9), jnp.float32(0.9))

    # the one thing DDP gives the reference implicitly: after the
    # all-reduced update, every process holds identical params
    assert dist_utils.check_model_equivalence(state.params, mesh=m)

    leaves = jax.device_get(jax.tree.leaves(state.params))
    ema = jax.device_get(jax.tree.leaves(state.ema_params))
    h = hashlib.md5()
    for leaf in leaves + ema:
        h.update(np.ascontiguousarray(leaf).tobytes())
    if jax.process_index() == 0:
        np.savez(os.environ['LVAE_DUMP'],
                 **{f'l{i}': leaf for i, leaf in enumerate(leaves + ema)})
    dist_utils.barrier('end')
    print(f'rank {jax.process_index()} DIGEST {h.hexdigest()} '
          f'LOSS {float(metrics["loss"]):.6f}', flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_train_digest():
    """Same 2 train steps on this process's 8-device mesh (conftest CPU)."""
    import hashlib
    import numpy as np
    import jax
    import jax.numpy as jnp
    import lvae_tpu
    from lvae_tpu.parallel import mesh as pmesh
    from lvae_tpu.training.optim import create_train_state, make_train_step

    m = pmesh.get_data_mesh()
    model = lvae_tpu.get_model('qres_tiny')
    state, tx = create_train_state(model.params, optimizer='adam', ema=True)
    state = pmesh.replicate(state, m)

    def loss_fn(params, batch, rng):
        return model.loss_and_stats(params, batch, rng, training=True)

    step_fn = make_train_step(loss_fn, tx, accum_num=1, grad_clip=2.0,
                              use_ema=True)
    repl = pmesh.replicated_sharding(m)
    data = pmesh.data_sharding(m)
    step = jax.jit(step_fn, in_shardings=(repl, data, repl, repl, repl, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))
    batch_np = np.random.default_rng(3).uniform(
        0, 1, (8, 64, 64, 3)).astype(np.float32)
    batch = jax.device_put(batch_np, data)
    for i in range(2):
        rng = jax.random.PRNGKey(42 + i)
        state, metrics = step(state, batch, rng, jnp.float32(1e-3),
                              jnp.float32(1e9), jnp.float32(0.9))
    leaves = jax.device_get(jax.tree.leaves(state.params))
    ema = jax.device_get(jax.tree.leaves(state.ema_params))
    return leaves + ema, float(metrics['loss'])


@pytest.mark.timeout(300)
def test_two_process_data_parallel(tmp_path):
    port = _free_port()
    script = tmp_path / 'worker.py'
    script.write_text(_WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop('JAX_PLATFORMS', None)
        env.update({
            'LVAE_REPO': os.path.dirname(os.path.dirname(__file__)),
            'JAX_COORDINATOR_ADDRESS': f'localhost:{port}',
            'JAX_NUM_PROCESSES': '2',
            'JAX_PROCESS_ID': str(rank),
            # keep the spawned jax off any TPU plugin
            'JAX_PLATFORM_NAME': 'cpu',
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=280)
            outs.append(out)
    finally:
        for p in procs:           # a failed/hung rank must not orphan the
            if p.poll() is None:  # other (it would wait on the coordinator
                p.kill()          # forever)
                p.wait()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {rank} failed:\n{out}'
        assert f'rank {rank} OK' in out


@pytest.mark.timeout(600)
def test_two_process_train_step_equivalence(tmp_path):
    """The gradient all-reduce of the ACTUAL train step across 2 processes:
    updated params (and EMA) must byte-equal the single-process 8-device
    result for the same seed and global batch (reference: trainer.py:364
    DDP all-reduce, which torch gives implicitly)."""
    port = _free_port()
    script = tmp_path / 'train_worker.py'
    script.write_text(_TRAIN_WORKER)
    dump = tmp_path / 'rank0_params.npz'
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop('JAX_PLATFORMS', None)
        env.update({
            'LVAE_REPO': os.path.dirname(os.path.dirname(__file__)),
            'LVAE_DUMP': str(dump),
            'JAX_COORDINATOR_ADDRESS': f'localhost:{port}',
            'JAX_NUM_PROCESSES': '2',
            'JAX_PROCESS_ID': str(rank),
            'JAX_PLATFORM_NAME': 'cpu',
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=580)
            outs.append(out)
    finally:
        for p in procs:           # see test_two_process_data_parallel
            if p.poll() is None:
                p.kill()
                p.wait()
    digests = {}
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {rank} failed:\n{out}'
        for line in out.splitlines():
            if line.startswith(f'rank {rank} DIGEST'):
                parts = line.split()
                digests[rank] = (parts[3], float(parts[5]))
    assert set(digests) == {0, 1}, f'missing digest lines:\n{outs}'
    # within-topology: ranks must agree BYTE-exactly (the DDP guarantee)
    assert digests[0] == digests[1], 'ranks disagree after the step'

    # across topologies (2proc x 4dev vs 1proc x 8dev) psum partial-sum
    # order may differ, so compare numerically, not byte-wise
    import numpy as np
    ref_leaves, ref_loss = _single_process_train_digest()
    got_loss = digests[0][1]
    assert abs(got_loss - ref_loss) < 1e-4, (got_loss, ref_loss)
    with np.load(dump) as z:
        got_leaves = [z[f'l{i}'] for i in range(len(ref_leaves))]
    for i, (a, b) in enumerate(zip(got_leaves, ref_leaves)):
        np.testing.assert_allclose(
            a, b, rtol=0, atol=5e-6,
            err_msg=f'param/EMA leaf {i} diverges across process topologies')

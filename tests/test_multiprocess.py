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


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


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
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {rank} failed:\n{out}'
        assert f'rank {rank} OK' in out

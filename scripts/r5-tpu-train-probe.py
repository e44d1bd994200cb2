"""Round-5 train-probe adjudication (VERDICT r4 weak item 3).

The r5 in-trainer probe (--probe_device_step, trainer.py:315) reported
the donated qarv_base bf16 batch-16 step at 195 ms, while (a) the r4
suite15 standalone measurement of the same donated executable said
77.7 ms and (b) the r5 e2e wall clock did 599 steps in ~52 s (~87 ms/
step INCLUDING host work, with synchronizing bulk metric pulls bounding
any device lag). Two of the three say ~80 ms; the probe is the outlier.

The one structural difference: the trainer probe clones the state with
``jax.tree.map(jnp.copy, state)`` — ~3.6k per-leaf device programs —
where suite15 used ONE jitted whole-tree clone. This script times the
identical donated step under both clone styles AND takes an xplane
trace of the chained run (per-step module envelope = authoritative
device time), writing runs/train-probe-r5.json. Whatever the envelope
says is the number the trainer probe must be fixed to reproduce.

Usage: nohup python scripts/r5-tpu-train-probe.py > /tmp/r5-probe.log 2>&1 &
"""
import json
import os
import shutil
import sys
import time
from pathlib import Path

os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np

V5E_PEAK_BF16 = 197e12
BATCH, CROP = 16, 256


def main():
    import jax
    import jax.numpy as jnp
    from lvae_tpu.utils.general import enable_compile_cache
    enable_compile_cache()
    import lvae_tpu
    from lvae_tpu import parallel
    from lvae_tpu.training.optim import create_train_state, make_train_step
    from lvae_tpu.utils.profiling import program_envelope_ms

    print(f'device: {jax.devices()}', flush=True)
    t0 = time.time()
    np.asarray(jnp.zeros((8,)))
    print(f'first fetch: {time.time() - t0:.0f}s', flush=True)

    mesh = parallel.get_data_mesh()
    model = lvae_tpu.get_model('qarv_base')
    state, tx = create_train_state(model.params, optimizer='adam', ema=True)
    state = parallel.replicate(state, mesh)
    repl = parallel.replicated_sharding(mesh)
    data = parallel.data_sharding(mesh)
    batch = parallel.shard_batch(
        np.random.default_rng(0).uniform(
            0, 1, (BATCH, CROP, CROP, 3)).astype(np.float32), mesh)
    key = jax.random.PRNGKey(0)
    sargs = (jnp.float32(1e-4), jnp.float32(1e9), jnp.float32(0.5))

    def loss_fn(params, b, rng):
        return model.loss_and_stats(params, b, rng, training=True,
                                    compute_dtype='bfloat16')

    step = jax.jit(
        make_train_step(loss_fn, tx, accum_num=1, grad_clip=2.0,
                        use_ema=True),
        in_shardings=(repl, data, repl, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,))
    clone_jit = jax.jit(lambda t: jax.tree.map(lambda x: x + 0, t))

    t0 = time.time()
    s, m = step(clone_jit(state), batch, key, *sargs)
    float(m['loss'])
    del s, m
    print(f'compiled in {time.time() - t0:.0f}s', flush=True)

    out = {}

    def run(k, clone):
        s = clone(state)
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            s, o = step(s, batch, key, *sargs)
        float(o['loss'])
        del s
        return time.perf_counter() - t0

    for label, clone in (
            ('treemap_jnp_copy',                      # trainer-probe style
             lambda t: jax.tree.map(jnp.copy, t)),
            ('jitted_clone', clone_jit)):             # suite15 style
        run(1, clone)
        samples = [(run(5, clone) - run(1, clone)) / 4 for _ in range(3)]
        out[label + '_ms'] = round(min(samples) * 1e3, 2)
        out[label + '_samples_ms'] = [round(x * 1e3, 2) for x in samples]
        print(f'{label}: {out[label + "_ms"]} ms '
              f'(samples {out[label + "_samples_ms"]})', flush=True)

    # clone OUTSIDE the timed window, fully synced before t0: the purest
    # host-side measurement of k chained steps
    s0 = clone_jit(state)
    jax.block_until_ready(jax.tree.leaves(s0)[0])
    np.asarray(jax.tree.leaves(s0)[0].ravel()[:1])    # axon: only fetches sync
    t0 = time.perf_counter()
    o = None
    s = s0
    for _ in range(8):
        s, o = step(s, batch, key, *sargs)
    float(o['loss'])
    out['presynced_8step_ms_per_step'] = round(
        (time.perf_counter() - t0) / 8 * 1e3, 2)
    del s, s0
    print(f'presynced 8-step: {out["presynced_8step_ms_per_step"]} ms/step',
          flush=True)

    # authoritative: xplane module envelope of 5 chained steps
    logdir = '/tmp/jaxtrace-r5-trainprobe'
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        s = clone_jit(state)
        o = None
        for _ in range(5):
            s, o = step(s, batch, key, *sargs)
        float(o['loss'])
        del s
    env = program_envelope_ms(logdir, 'train_step')
    if env is None:
        # jitted lambda names vary; fall back to scanning plane totals
        from lvae_tpu.utils.profiling import op_class_breakdown
        out['envelope_fallback'] = op_class_breakdown(logdir)
        print('envelope: no jit_<name> match; op-class fallback recorded',
              flush=True)
    else:
        out['envelope_ms_per_step'], out['envelope_count'] = (
            round(env[0], 2), env[1])
        print(f'device envelope: {out["envelope_ms_per_step"]} ms/step '
              f'x{out["envelope_count"]}', flush=True)

    flops = None
    try:
        cost = step.lower(state, batch, key, *sargs).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get('flops', float('nan')))
    except Exception as e:
        print(f'cost analysis failed: {e}', flush=True)
    if flops and flops == flops:
        out['gflop'] = round(flops / 1e9)
        ms = out.get('envelope_ms_per_step') or out['jitted_clone_ms']
        out['device_mfu_bf16'] = round(flops / (ms / 1e3) / V5E_PEAK_BF16, 4)

    (ROOT / 'runs' / 'train-probe-r5.json').write_text(
        json.dumps(out, indent=2))
    print('=== r5 train probe done ===', flush=True)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()



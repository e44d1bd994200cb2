"""Trace the qarv_base train step on the real chip: top ops + roofline.

Attributes the device-only step time to individual HLO ops via an xplane
trace (see CLAUDE.md "Performance lessons"), classifies them
(MXU convs vs elementwise/copy = bandwidth-bound), and prints a roofline
summary: achieved FLOP/s vs peak, achieved bytes/s vs HBM peak — the
quantified argument for whatever device MFU remains (VERDICT r2 item 4d).

Usage: python scripts/profile-train-step.py [--batch 16] [--amp]
"""
import argparse
import glob
import os
import re
import shutil
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.5e12  # no native f32 matmul; xla uses bf16x3 or f32 on MXU
V5E_HBM_BPS = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--crop', type=int, default=256)
    ap.add_argument('--amp', action='store_true')
    ap.add_argument('--remat', action='store_true',
                    help='per-block gradient rematerialization (--remat '
                         'trainer flag): fits batch 32 on one v5e')
    ap.add_argument('--logdir', default='/tmp/traintrace')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    from lvae_tpu import parallel
    from lvae_tpu.training.optim import create_train_state, make_train_step

    mesh = parallel.get_data_mesh()
    model = lvae_tpu.get_model('qarv_base')
    state, tx = create_train_state(model.params, optimizer='adam', ema=True)
    state = parallel.replicate(state, mesh)
    cd = 'bfloat16' if args.amp else None

    def loss_fn(params, batch, rng):
        return model.loss_and_stats(params, batch, rng, training=True,
                                    compute_dtype=cd, remat=args.remat)

    step_fn = make_train_step(loss_fn, tx, accum_num=1, grad_clip=2.0,
                              use_ema=True)
    repl = parallel.replicated_sharding(mesh)
    data = parallel.data_sharding(mesh)
    step = jax.jit(step_fn, in_shardings=(repl, data, repl, repl, repl, repl),
                   out_shardings=(repl, repl))

    rng_np = np.random.default_rng(0)
    batch = rng_np.uniform(0, 1, (args.batch, args.crop, args.crop, 3)
                           ).astype(np.float32)
    batch = parallel.shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    sargs = (jnp.float32(1e-4), jnp.float32(1e9), jnp.float32(0.5))

    s, m = step(state, batch, key, *sargs)
    float(m['loss'])
    print('compiled + warm', flush=True)

    # step FLOPs from XLA
    compiled = step.lower(state, batch, key, *sargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get('flops', float('nan')))

    # timed chain (no trace overhead)
    def run(k):
        t0 = time.perf_counter()
        s = state
        out = None
        for _ in range(k):
            s, out = step(s, batch, key, *sargs)
        float(out['loss'])
        return time.perf_counter() - t0
    run(1)
    dt = min((run(5) - run(1)) / 4 for _ in range(3))
    peak = V5E_PEAK_BF16 if args.amp else V5E_PEAK_F32
    print(f'device step: {dt * 1e3:.1f} ms, {flops / 1e9:.0f} GFLOP '
          f'-> {flops / dt / 1e12:.1f} TFLOP/s '
          f'({100 * flops / dt / peak:.1f}% of '
          f'{"bf16" if args.amp else "f32"} peak)', flush=True)

    shutil.rmtree(args.logdir, ignore_errors=True)
    with jax.profiler.trace(args.logdir):
        s2, m2 = step(state, batch, key, *sargs)
        float(m2['loss'])

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = glob.glob(os.path.join(args.logdir, '**', '*.xplane.pb'),
                     recursive=True)[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, 'rb').read())
    for plane in xs.planes:
        if 'TPU' not in plane.name:
            continue
        emeta = {mm.id: mm.name for mm in plane.event_metadata.values()}
        tot = defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            for ev in line.events:
                nm = emeta.get(ev.metadata_id, '?')
                tot[nm][0] += ev.duration_ps / 1e9
                tot[nm][1] += 1

        def klass(nm):
            if 'convolution' in nm or 'dot' in nm:
                return 'matmul/conv'
            if 'copy' in nm:
                return 'copy'
            if 'all-reduce' in nm or 'reduce-scatter' in nm:
                return 'collective'
            if 'fusion' in nm:
                return 'fusion'
            return 'other'
        by_class = defaultdict(float)
        prog_ms = 0.0
        for nm, (ms, n) in tot.items():
            if nm.startswith('jit_'):
                prog_ms = max(prog_ms, ms)
                continue
            by_class[klass(nm)] += ms
        print(f'\nplane {plane.name}: program {prog_ms:.1f} ms; by class:')
        for k, v in sorted(by_class.items(), key=lambda kv: -kv[1]):
            print(f'  {k:<12s} {v:8.2f} ms')
        print('top 20 ops:')
        for nm, (ms, n) in sorted(tot.items(), key=lambda kv: -kv[1][0])[:20]:
            if nm.startswith('jit_'):
                continue
            print(f'  {ms:8.2f} ms x{n:<4d} {nm[:100]}')


if __name__ == '__main__':
    main()

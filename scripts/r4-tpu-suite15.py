"""Round-4 TPU evidence runs, part 15 — train-step layout A/B (MFU claim).

VERDICT r3 item 6: the r3 train profile (runs/train-topops-r3.txt) shows
{3,0,2,1} relayout copies around every depthwise conv dominating the
copy class. LVAE_DW_MODE=shift lowers the depthwise conv to K*K shifted
multiply-adds (common.DepthwiseConvShiftAdd) — layout-neutral NHWC
elementwise ops. This suite measures the qarv_base train step (batch 16 @
256x256, full DP step incl. Adam/EMA/clip) in both lowerings x both
precisions in ONE process (the env var is read at trace time; fresh
closures => fresh jit entries), and attributes device time per class from
an xplane trace for the bf16 pair.

Writes runs/train-layout-r4.json (+ topops appended to
runs/train-topops-r3.txt).

Usage: nohup python scripts/r4-tpu-suite15.py > /tmp/r4-suite15.log 2>&1 &
"""
import glob
import json
import os
import shutil
import sys
import time
from collections import defaultdict
from pathlib import Path

os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.5e12
BATCH, CROP = 16, 256


def trace_classes(logdir, label):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                            recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, 'rb').read())
    out = {}
    lines_txt = [f'== {label} ==']
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
            if 'copy' in nm or 'transpose' in nm:
                return 'copy'
            if 'fusion' in nm:
                return 'fusion'
            return 'other'
        by_class = defaultdict(float)
        relayout_ms = 0.0
        prog_ms = 0.0
        for nm, (ms, n) in tot.items():
            if nm.startswith('jit_'):
                prog_ms = max(prog_ms, ms)
                continue
            by_class[klass(nm)] += ms
            if ('copy' in nm) and ('{3,0,2,1}' in nm or '3,0,2,1' in nm):
                relayout_ms += ms
        out = {'program_ms': round(prog_ms, 2),
               'relayout_3021_ms': round(relayout_ms, 2),
               **{k: round(v, 2) for k, v in by_class.items()}}
        lines_txt.append(f'plane {plane.name}: program {prog_ms:.1f} ms; '
                         f'relayout({{3,0,2,1}}) {relayout_ms:.1f} ms')
        for nm, (ms, n) in sorted(tot.items(), key=lambda kv: -kv[1][0])[:15]:
            if nm.startswith('jit_'):
                continue
            lines_txt.append(f'  {ms:8.2f} ms x{n:<4d} {nm[:110]}')
    txt = '\n'.join(lines_txt)
    print(txt, flush=True)
    with open(ROOT / 'runs' / 'train-topops-r3.txt', 'a') as f:
        f.write('\n\n' + txt)
    return out


def main():
    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import lvae_tpu
    from lvae_tpu import parallel
    from lvae_tpu.training.optim import create_train_state, make_train_step

    print(f'device: {jax.devices()}', flush=True)
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
    np.asarray(batch[0, :1, :1, 0])              # prepay first fetch

    results = {}
    for dw_mode in ('conv', 'shift'):
        if dw_mode == 'shift':
            os.environ['LVAE_DW_MODE'] = 'shift'
        else:
            os.environ.pop('LVAE_DW_MODE', None)
        for amp in (True, False):
            label = f'{dw_mode}_{"bf16" if amp else "f32"}'
            cd = 'bfloat16' if amp else None

            def loss_fn(params, b, rng, _cd=cd):
                return model.loss_and_stats(params, b, rng, training=True,
                                            compute_dtype=_cd)

            # donate the state like the production trainer: an undonated
            # chained run holds k live (params+adam+ema) copies — the f32
            # leg OOMed HBM at k=5 (suite15b). The per-run state clone
            # cancels in the (t(k) - t(1)) / (k-1) delta.
            step = jax.jit(
                make_train_step(loss_fn, tx, accum_num=1, grad_clip=2.0,
                                use_ema=True),
                in_shardings=(repl, data, repl, repl, repl, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,))
            clone = jax.jit(lambda t: jax.tree.map(lambda x: x + 0, t))
            t0 = time.time()
            s, m = step(clone(state), batch, key, *sargs)
            float(m['loss'])
            print(f'{label}: compiled in {time.time() - t0:.0f}s',
                  flush=True)
            del s, m

            def run(k):
                t0 = time.perf_counter()
                s = clone(state)
                out = None
                for _ in range(k):
                    s, out = step(s, batch, key, *sargs)
                float(out['loss'])
                del s
                return time.perf_counter() - t0
            run(1)
            dt = min((run(5) - run(1)) / 4 for _ in range(3))
            compiled = step.lower(state, batch, key, *sargs).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get('flops', float('nan')))
            peak = V5E_PEAK_BF16 if amp else V5E_PEAK_F32
            entry = {'step_ms': round(dt * 1e3, 2),
                     'img_per_s': round(BATCH / dt, 1),
                     'gflop': round(flops / 1e9),
                     'mfu_pct': round(100 * flops / dt / peak, 2)}
            # attribute device time per class (both precisions, both modes)
            logdir = f'/tmp/traintrace-{label}'
            shutil.rmtree(logdir, ignore_errors=True)
            with jax.profiler.trace(logdir):
                s2, m2 = step(clone(state), batch, key, *sargs)
                float(m2['loss'])
            entry['classes'] = trace_classes(logdir, f'train {label} r4')
            results[label] = entry
            print(f'{label}: {entry}', flush=True)
            # incremental artifact + free the leg's executables/buffers:
            # four live train-step programs OOMed HBM in the orchestrated
            # run (suite17b) — each leg stands alone
            (ROOT / 'runs' / 'train-layout-r4.json').write_text(
                json.dumps(results, indent=2))
            del step, compiled, clone, s2, m2
            import gc
            jax.clear_caches()
            gc.collect()

    out = ROOT / 'runs' / 'train-layout-r4.json'
    out.write_text(json.dumps(results, indent=2))
    print('=== suite15 done ===', flush=True)


if __name__ == '__main__':
    main()

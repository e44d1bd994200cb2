"""Round-3 TPU evidence runs, part 3 — retries + divergence probe.

suite2's in-process chaining leaked HBM across scripts (batch-32 roofline
and the train run hit RESOURCE_EXHAUSTED after earlier programs' buffers
accumulated), so this runner clears jit caches + garbage-collects between
scripts, and orders the HBM-heavy train run last.

  1. scripts/probe-fused-divergence.py  (locate the fused-coder quality bug)
  2. scripts/profile-train-step.py --amp --batch 32  (batch scaling)
  3. train-var-rate.py --data_cache 600 iters (end-to-end cached img/s)

Usage: nohup python scripts/r3-tpu-suite3.py > /tmp/r3suite3.log 2>&1 &
"""
import gc
import io
import json
import contextlib
import runpy
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def run(script, argv):
    print(f'\n===== {script} {" ".join(argv)} =====', flush=True)
    sys.argv = [script] + argv
    t0 = time.time()
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            sys.__stdout__.flush()
            return len(s)

    try:
        with contextlib.redirect_stdout(Tee()):
            runpy.run_path(str(ROOT / script), run_name='__main__')
        rc = 0
    except SystemExit as e:
        rc = int(e.code or 0)
    except Exception as e:
        print(f'ERROR in {script}: {type(e).__name__}: {e}', flush=True)
        import traceback
        traceback.print_exc()
        rc = 1
    # free device buffers before the next script (suite2 lesson)
    import jax
    jax.clear_caches()
    gc.collect()
    print(f'----- {script} done rc={rc} in {time.time() - t0:.0f}s -----',
          flush=True)
    return rc, buf.getvalue()


def main():
    results = {}

    rc, out = run('scripts/probe-fused-divergence.py', ['--lmb', '2048'])
    results['divergence_rc'] = rc
    (ROOT / 'runs' / 'fused-divergence-r3.txt').write_text(out)

    rc, out = run('scripts/profile-train-step.py',
                  ['--amp', '--batch', '32'])
    results['roofline_b32_rc'] = rc
    lines = [l for l in out.splitlines() if 'device step' in l]
    if lines:
        (ROOT / 'runs' / 'train-roofline-b32-r3.txt').write_text(
            '\n'.join(lines))

    rc, _ = run('train-var-rate.py',
                ['--trainset', 'runs/synth-train',
                 '--valset', 'runs/synth-val',
                 '--name', 'r3-cache-throughput',
                 '--data_cache', '--amp', '--probe_device_step',
                 '--iterations', '600',
                 '--batch_size', '16'])
    results['train600_rc'] = rc
    log = ROOT / 'runs' / 'default' / 'r3-cache-throughput' / \
        'train_log.jsonl'
    if log.exists():
        rows = [json.loads(l) for l in log.read_text().splitlines() if l]
        imgs = sorted(r['img_per_s'] for r in rows if 'img_per_s' in r)
        if imgs:
            results['train600_imgps_median'] = imgs[len(imgs) // 2]
            results['train600_imgps_max'] = imgs[-1]
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()

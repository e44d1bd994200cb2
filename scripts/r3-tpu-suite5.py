"""Round-3 TPU evidence runs, part 5 — re-run suite4's poisoned tail.

Suite4's batch-32 roofline probe OOM'd the TPU backend and every job after
it failed instantly with RESOURCE_EXHAUSTED (see /tmp/r3suite4.log) — the
rc=1 validate entries it wrote were fallout, not codec failures.  This
suite runs the same jobs with the OOM-risk job LAST:

  1. tpu-validate --weights ... --esc_cap 8192          trained f32
  2. tpu-validate --weights ... --esc_cap 8192 --bf16   trained bf16
  3. tpu-validate (random init, esc stress, f32)
  4. probe-distortion-parity      acceptance: fused PSNR == host PSNR
  5. train-var-rate 600 iters     cached end-to-end img/s
  6. profile-train-step --amp -b32   (OOM here poisons nothing downstream)

Usage: nohup python scripts/r3-tpu-suite5.py > /tmp/r3suite5.log 2>&1 &
"""
import gc
import io
import json
import contextlib
import runpy
import shutil
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
    import jax
    jax.clear_caches()
    gc.collect()
    print(f'----- {script} done rc={rc} in {time.time() - t0:.0f}s -----',
          flush=True)
    return rc, buf.getvalue()


def main():
    results = {}
    W = 'runs/qarv_base_synth6k_ema.msgpack'

    validate = {}
    rc, out = run('scripts/tpu-validate-codec.py',
                  ['--weights', W, '--esc_cap', '8192', '--iters', '3'])
    validate['trained_f32_esc8192'] = {
        'rc': rc,
        'bit_exact': ('BIT-EXACT vs encode-side recon: True' in out)
        and rc == 0, 'tail': out.strip().splitlines()[-8:]}
    rc, out = run('scripts/tpu-validate-codec.py',
                  ['--weights', W, '--esc_cap', '8192', '--iters', '3',
                   '--bf16'])
    validate['trained_bf16_esc8192'] = {
        'rc': rc,
        'bit_exact': ('BIT-EXACT vs encode-side recon: True' in out)
        and rc == 0, 'tail': out.strip().splitlines()[-8:]}
    rc, out = run('scripts/tpu-validate-codec.py', ['--iters', '3'])
    validate['randinit_f32_escstress'] = {
        'rc': rc,
        'bit_exact': ('BIT-EXACT vs encode-side recon: True' in out)
        and rc == 0, 'tail': out.strip().splitlines()[-8:]}
    vpath = ROOT / 'runs' / 'tpu-validate-r3.json'
    art = json.loads(vpath.read_text())
    art['canonical_decode_fix'] = validate
    vpath.write_text(json.dumps(art, indent=2))
    results['validate_ok'] = all(v['bit_exact'] for v in validate.values())
    print(f'validate_ok={results["validate_ok"]}', flush=True)

    rc, out = run('scripts/probe-distortion-parity.py', [])
    results['distortion_rc'] = rc
    (ROOT / 'runs' / 'distortion-parity-r3-post-fix.txt').write_text(out)

    shutil.rmtree(ROOT / 'runs' / 'default' / 'r3-cache-throughput',
                  ignore_errors=True)
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

    rc, out = run('scripts/profile-train-step.py', ['--amp', '--batch', '32'])
    results['roofline_b32_rc'] = rc
    lines = [l for l in out.splitlines() if 'device step' in l]
    (ROOT / 'runs' / 'train-roofline-b32-r3.txt').write_text(
        '\n'.join(lines) if lines else out[-2000:])

    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()

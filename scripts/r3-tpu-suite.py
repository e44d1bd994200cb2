"""Chained round-3 TPU evidence runs in ONE process.

Each fresh process on this environment's tunneled TPU pays a multi-minute
first-device-fetch stall, so the round's evidence artifacts are produced in
one process back-to-back:
  1. scripts/prove-rate-correctness.py  -> runs/rate-proof-r3.json
  2. eval-var-rate.py (synth-val, trained weights)
       -> runs/results/synth-val-qarv_base.json
  3. scripts/tpu-validate-codec.py f32+bf16 at 512x768 and 768x512
       -> runs/tpu-validate-r3.json (stdout-parsed summary)

Usage: nohup python scripts/r3-tpu-suite.py > /tmp/r3suite.log 2>&1 &
"""
import io
import json
import contextlib
import runpy
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def run(script, argv, tee=True):
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
    print(f'----- {script} done rc={rc} in {time.time() - t0:.0f}s -----',
          flush=True)
    return rc, buf.getvalue()


def main():
    results = {}

    rc, _ = run('scripts/prove-rate-correctness.py', [])
    results['rate_proof'] = rc

    rc, _ = run('eval-var-rate.py',
                ['-n', 'runs/synth-val', '-w',
                 'runs/qarv_base_synth6k_ema.msgpack', '-s', '8'])
    results['eval_var_rate'] = rc

    validate = {}
    for hw in ((512, 768), (768, 512)):
        for bf16 in (False, True):
            argv = ['--hw', str(hw[0]), str(hw[1]), '--iters', '3']
            if bf16:
                argv.append('--bf16')
            rc, out = run('scripts/tpu-validate-codec.py', argv)
            validate[f'{hw[0]}x{hw[1]}_{"bf16" if bf16 else "f32"}'] = {
                'rc': rc,
                'bit_exact': ('BIT-EXACT vs encode-side recon: True' in out)
                and rc == 0,
                'tail': out.strip().splitlines()[-8:],
            }
    import jax
    artifact = {'device': str(jax.devices()[0]),
                'validate': validate, 'suite_rc': results}
    (ROOT / 'runs' / 'tpu-validate-r3.json').write_text(
        json.dumps(artifact, indent=2))
    print('\nwrote runs/tpu-validate-r3.json', flush=True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()

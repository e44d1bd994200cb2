"""Round-3 TPU evidence runs, part 6 — unified-codec acceptance.

Suite5 exposed that the canonical-decode fix was NOT sufficient: with
trained weights even the f32 two-program codec desyncs (cross-program
trunk drift amplified by the latent feedback). The codec was rebuilt as
ONE executable for both directions (qarv/fused.py module docstring).
This suite is the acceptance gate:

  1-2. tpu-validate trained f32 + bf16 (esc_cap 8192, the production
       config that failed before the rebuild)
  3.   tpu-validate random-init escape-stress f32 (regression)
  4.   probe-distortion-parity: fused-coded PSNR must equal host/forward
  5.   bench.py: fresh headline numbers with the unified codec

Usage: nohup python scripts/r3-tpu-suite6.py > /tmp/r3suite6.log 2>&1 &
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
    for name, argv in [
            ('trained_f32_esc8192',
             ['--weights', W, '--esc_cap', '8192', '--iters', '3']),
            ('trained_bf16_esc8192',
             ['--weights', W, '--esc_cap', '8192', '--iters', '3',
              '--bf16']),
            ('randinit_f32_escstress', ['--iters', '3'])]:
        rc, out = run('scripts/tpu-validate-codec.py', argv)
        validate[name] = {
            'rc': rc,
            'bit_exact': ('BIT-EXACT vs encode-side recon: True' in out)
            and rc == 0, 'tail': out.strip().splitlines()[-8:]}
    vpath = ROOT / 'runs' / 'tpu-validate-r3.json'
    art = json.loads(vpath.read_text())
    art['unified_codec'] = validate
    vpath.write_text(json.dumps(art, indent=2))
    results['validate_ok'] = all(v['bit_exact'] for v in validate.values())
    print(f'validate_ok={results["validate_ok"]}', flush=True)

    rc, out = run('scripts/probe-distortion-parity.py', [])
    results['distortion_rc'] = rc
    (ROOT / 'runs' / 'distortion-parity-r3-post-fix.txt').write_text(out)

    rc, out = run('bench.py', [])
    results['bench_rc'] = rc
    for line in out.splitlines():
        if line.startswith('{"metric"'):
            (ROOT / 'runs' / 'bench-r3-unified.json').write_text(line)

    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()

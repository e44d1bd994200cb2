"""Round-3 TPU evidence runs, part 7 — trained-weight acceptance after the
checkpoint regeneration.

The workspace lost runs/qarv_base_synth6k_ema.msgpack (runs/ is
gitignored; only the small JSON evidence artifacts are force-committed),
so suite6 could only complete its random-init leg. After regenerating the
synthetic dataset + retraining (scripts/gen-synthetic-dataset.py,
train-var-rate.py, scripts/export-ema.py), this suite runs the
trained-weight acceptance of the unified single-executable codec in ONE
process (the per-process first-device-fetch stall makes separate processes
prohibitively slow — CLAUDE.md):

  1-2. tpu-validate trained f32 + bf16 (esc_cap 8192, production config —
       exactly the runs that caught desync bugs 2 and 3)
  3.   probe-distortion-parity: fused-coded PSNR == host/forward PSNR
  4.   prove-rate-correctness: coded bits == KL estimate across the λ sweep
       (regenerated for the new checkpoint)
  5.   measure-rate-overhead at λ∈{16,64,256}: flush overhead still <1%
  6.   bench.py: headline numbers with the unified codec + trained weights

Usage: nohup python scripts/r3-tpu-suite7.py > /tmp/r3suite7.log 2>&1 &
"""
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# reuse suite6's tee-ing runner (dashed filename, so runpy not import)
import runpy  # noqa: E402
_runner = runpy.run_path(str(ROOT / 'scripts' / 'r3-tpu-suite6.py'))
run = _runner['run']

W = 'runs/qarv_base_synth6k_ema.msgpack'


def main():
    results = {}
    assert (ROOT / W).is_file(), f'{W} missing — retrain + export first'

    validate = {}
    for name, argv in [
            ('trained_f32_esc8192',
             ['--weights', W, '--esc_cap', '8192', '--iters', '3']),
            ('trained_bf16_esc8192',
             ['--weights', W, '--esc_cap', '8192', '--iters', '3',
              '--bf16'])]:
        rc, out = run('scripts/tpu-validate-codec.py', argv)
        validate[name] = {
            'rc': rc,
            'bit_exact': ('BIT-EXACT vs encode-side recon: True' in out)
            and rc == 0, 'tail': out.strip().splitlines()[-8:]}
    vpath = ROOT / 'runs' / 'tpu-validate-r3.json'
    art = json.loads(vpath.read_text())
    art.setdefault('unified_codec', {}).update(
        {k: v for k, v in validate.items()})
    art['unified_codec']['note'] = (
        'trained-weight legs from the REGENERATED checkpoint '
        '(same seeds/config as the r2 run; the original was lost with the '
        'uncommitted runs/ dir)')
    vpath.write_text(json.dumps(art, indent=2))
    results['validate_ok'] = all(v['bit_exact'] for v in validate.values())
    print(f'validate_ok={results["validate_ok"]}', flush=True)

    rc, out = run('scripts/probe-distortion-parity.py', [])
    results['distortion_rc'] = rc
    (ROOT / 'runs' / 'distortion-parity-r3-post-fix.txt').write_text(out)

    # new --out: keep the r2-checkpoint artifact intact for history
    rc, out = run('scripts/prove-rate-correctness.py',
                  ['--out', 'runs/rate-proof-r3-unified.json'])
    results['rate_proof_rc'] = rc

    rc, out = run('scripts/measure-rate-overhead.py',
                  ['--weights', W, '--images', 'runs/synth-val',
                   '--first', '6', '--lmb', '16', '64', '256'])
    results['overhead_rc'] = rc
    (ROOT / 'runs' / 'rate-overhead-r3-unified.txt').write_text(out)

    rc, out = run('bench.py', [])
    results['bench_rc'] = rc
    for line in out.splitlines():
        if line.startswith('{"metric"'):
            (ROOT / 'runs' / 'bench-r3-unified.json').write_text(line)

    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()

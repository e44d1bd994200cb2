"""Round-3 TPU evidence runs, part 8 — lane-oriented rANS kernel rework.

The encode kernel's per-lane state chain (the ~45-op exact divmod) ran in
(N,1) orientation — 1 of 128 lanes used across 16 sublane-tiles per op
under TPU (8,128) tiling — and dominated its runtime. Both kernels were
reworked to (1,N) lane orientation with K=8-row batching (one 2048-word
window RMW/read per batch). CPU byte-identity is covered by the test
suite; this suite is the hardware gate:

  1.   profile-rans-kernels: microbench the reworked kernels
  2-5. tpu-validate: trained f32 + bf16 (esc_cap 8192), trained f32 at the
       second shape 768x512, random-init escape-stress f32 (regression)
  6.   tpu-validate --lanes 32: small-lane config on hardware (the auto
       lane count uses N<128 at low rates)
  7.   bench.py: fresh headline numbers

Usage: nohup python scripts/r3-tpu-suite8.py > /tmp/r3suite8.log 2>&1 &
"""
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import runpy  # noqa: E402
_runner = runpy.run_path(str(ROOT / 'scripts' / 'r3-tpu-suite6.py'))
run = _runner['run']

W = 'runs/qarv_base_synth6k_ema.msgpack'


def main():
    results = {}
    assert (ROOT / W).is_file(), f'{W} missing — retrain + export first'

    rc, out = run('scripts/profile-rans-kernels.py', [])
    results['kernels_rc'] = rc
    results['kernels'] = [ln for ln in out.splitlines() if 'kernel' in ln]

    validate = {}
    for name, argv in [
            ('v2_trained_f32_esc8192',
             ['--weights', W, '--esc_cap', '8192', '--iters', '3']),
            ('v2_trained_bf16_esc8192',
             ['--weights', W, '--esc_cap', '8192', '--iters', '3',
              '--bf16']),
            ('v2_trained_f32_768x512',
             ['--weights', W, '--esc_cap', '8192', '--iters', '2',
              '--hw', '768', '512']),
            ('v2_randinit_f32_escstress', ['--iters', '2']),
            ('v2_trained_f32_lanes32',
             ['--weights', W, '--esc_cap', '8192', '--iters', '2',
              '--lanes', '32'])]:
        rc, out = run('scripts/tpu-validate-codec.py', argv)
        validate[name] = {
            'rc': rc,
            'bit_exact': ('BIT-EXACT vs encode-side recon: True' in out)
            and rc == 0, 'tail': out.strip().splitlines()[-8:]}
    vpath = ROOT / 'runs' / 'tpu-validate-r3.json'
    art = json.loads(vpath.read_text())
    art.setdefault('kernel_rework_v2', {}).update(validate)
    art['kernel_rework_v2']['note'] = (
        'lane-oriented (1,N) K=8-batched rANS kernels: hardware '
        'bit-exactness re-acceptance after the rework')
    vpath.write_text(json.dumps(art, indent=2))
    results['validate_ok'] = all(v['bit_exact'] for v in validate.values())
    print(f'validate_ok={results["validate_ok"]}', flush=True)

    rc, out = run('bench.py', [])
    results['bench_rc'] = rc
    for line in out.splitlines():
        if line.startswith('{"metric"'):
            (ROOT / 'runs' / 'bench-r3-kernelv2.json').write_text(line)

    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()

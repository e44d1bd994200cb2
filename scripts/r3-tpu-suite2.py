"""Round-3 TPU evidence runs, part 2 — one process (first-fetch stall paid
once; see CLAUDE.md "Performance lessons").

  1. scripts/measure-rate-overhead.py with num_lanes='auto' + trained EMA
     weights at low-rate lambdas -> runs/rate-overhead-r3.json
     (the <1%-overhead-at-low-rate proof, VERDICT r2 item 3)
  2. scripts/profile-train-step.py --amp (batch 16 and 32): device-step
     roofline + batch-scaling evidence (VERDICT r2 item 4c/4d)
  3. train-var-rate.py --data_cache, 300 iters on runs/synth-train:
     end-to-end img/s with the pre-decoded uint8 cache (item 4a)

Usage: nohup python scripts/r3-tpu-suite2.py > /tmp/r3suite2.log 2>&1 &
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
    print(f'----- {script} done rc={rc} in {time.time() - t0:.0f}s -----',
          flush=True)
    return rc, buf.getvalue()


def main():
    results = {}

    # re-validate bf16 (now backbone-only) on hardware at both shapes;
    # merge into runs/tpu-validate-r3.json over the failed r3a entries
    validate = {}
    for hw in ((512, 768), (768, 512)):
        rc, out = run('scripts/tpu-validate-codec.py',
                      ['--hw', str(hw[0]), str(hw[1]), '--iters', '3',
                       '--bf16'])
        validate[f'{hw[0]}x{hw[1]}_bf16'] = {
            'rc': rc,
            'bit_exact': ('BIT-EXACT vs encode-side recon: True' in out)
            and rc == 0,
            'note': 'backbone-only bf16 (commit a6b368f)',
            'tail': out.strip().splitlines()[-8:],
        }
    vpath = ROOT / 'runs' / 'tpu-validate-r3.json'
    art = json.loads(vpath.read_text())
    art.setdefault('revalidate_bf16_backbone_only', {}).update(validate)
    vpath.write_text(json.dumps(art, indent=2))
    results['revalidate_bf16_ok'] = all(
        v['bit_exact'] for v in validate.values())
    print(f'revalidate_bf16_ok={results["revalidate_bf16_ok"]}', flush=True)

    # forward-eval vs coded-recon PSNR (explains the eval-var-rate curve)
    rc, out = run('scripts/probe-distortion-parity.py', [])
    results['distortion_probe_rc'] = rc
    (ROOT / 'runs' / 'distortion-parity-r3.txt').write_text(out)

    # post-searchsorted-fix latency attribution (STATUS ms-by-ms budget)
    rc, out = run('scripts/profile-fused-attrib.py', [])
    results['attrib_rc'] = rc
    (ROOT / 'runs' / 'fused-attrib-r3.txt').write_text(out)

    rc, out = run('scripts/measure-rate-overhead.py',
                  ['--weights', 'runs/qarv_base_synth6k_ema.msgpack',
                   '--images', 'runs/synth-val',
                   '--lmb', '16', '48', '64', '256',
                   '--first', '6'])
    results['rate_overhead_rc'] = rc
    # last JSON blob printed is the full table
    try:
        tail = out[out.rindex('{\n'):]
        (ROOT / 'runs' / 'rate-overhead-r3.json').write_text(tail)
        print('wrote runs/rate-overhead-r3.json', flush=True)
    except ValueError:
        pass

    roofline = {}
    for batch in (16, 32):
        rc, out = run('scripts/profile-train-step.py',
                      ['--amp', '--batch', str(batch)])
        roofline[f'batch{batch}'] = {
            'rc': rc,
            'lines': [l for l in out.splitlines()
                      if 'device step' in l or 'by class' in l],
        }
    (ROOT / 'runs' / 'train-roofline-r3.json').write_text(
        json.dumps(roofline, indent=2))
    results['roofline_rc'] = max(v['rc'] for v in roofline.values())

    rc, _ = run('train-var-rate.py',
                ['--trainset', 'runs/synth-train',
                 '--valset', 'runs/synth-val',
                 '--name', 'r3-cache-throughput',
                 '--data_cache', '--amp', '--probe_device_step',
                 '--iterations', '600',
                 '--batch_size', '16'])
    results['train300_rc'] = rc
    log = ROOT / 'runs' / 'default' / 'r3-cache-throughput' / \
        'train_log.jsonl'
    if log.exists():
        rows = [json.loads(l) for l in log.read_text().splitlines() if l]
        imgs = sorted(r['img_per_s'] for r in rows if 'img_per_s' in r)
        if imgs:
            results['train300_imgps_median'] = imgs[len(imgs) // 2]
            results['train300_imgps_max'] = imgs[-1]
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()

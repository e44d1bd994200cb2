"""Round-3 TPU evidence runs, part 10 — staged-async metric copy + train
step op breakdown.

Suite9 showed batch-16 --device_data at 114 img/s vs a 104.5 ms device
step (~153 img/s): the residual host cost is dominated by the per-step
packed metric fetch (fixed ~30 ms tunnel floor, synchronous at consume
time). The trainer now packs the metric scalars into one array right
after the step dispatch and STARTS the device->host copy immediately
(copy_to_host_async); the consume one step later should find it resident.

  1. train-var-rate 600 steps batch 16 --amp --device_data (async staging)
  2. same at batch 32 --remat
  3. profile-train-step --amp: top-20 device ops + roofline classes (the
     quantified answer for what device MFU remains)

Usage: nohup python scripts/r3-tpu-suite10.py > /tmp/r3suite10.log 2>&1 &
"""
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import runpy  # noqa: E402
_runner = runpy.run_path(str(ROOT / 'scripts' / 'r3-tpu-suite6.py'))
run = _runner['run']
_s9 = runpy.run_path(str(ROOT / 'scripts' / 'r3-tpu-suite9.py'))
train_leg = _s9['train_leg']


def main():
    results = {}
    train_leg(results, 'r3-asyncmetrics-b16',
              ['--device_data', '--batch_size', '16'])
    train_leg(results, 'r3-asyncmetrics-b32-remat',
              ['--device_data', '--remat', '--batch_size', '32'])

    rc, out = run('scripts/profile-train-step.py', ['--amp'])
    results['profile_rc'] = rc
    keep = []
    on = False
    for ln in out.splitlines():
        if 'device step:' in ln or 'by class' in ln:
            on = True
        if on:
            keep.append(ln)
    (ROOT / 'runs' / 'train-topops-r3.txt').write_text('\n'.join(keep))

    (ROOT / 'runs' / 'train-asyncmetrics-r3.json').write_text(
        json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()

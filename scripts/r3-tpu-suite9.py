"""Round-3 TPU evidence runs, part 9 — train-throughput with the
device-resident dataset cache.

The r3 train-step profile attributed the end-to-end vs device-only gap
(52.7 vs 170 img/s) to per-step host->device pixel upload (~3.1 MB through
the ~30 MB/s tunnel) plus per-metric device->host fetches (~27 ms fixed
floor each, 5 metrics). Both were removed: --device_data keeps the uint8
trainset in HBM and uploads only a (B,4) int32 parameter array per step,
and the trainer now pulls all metric scalars in ONE bulk fetch. This suite
records the resulting end-to-end throughput:

  1. train-var-rate 600 steps, batch 16, --amp --device_data
     (+ --probe_device_step for the device-only reference point)
  2. same with --remat --batch 32 (the remat memory headroom case)

Usage: nohup python scripts/r3-tpu-suite9.py > /tmp/r3suite9.log 2>&1 &
"""
import json
import shutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import runpy  # noqa: E402
_runner = runpy.run_path(str(ROOT / 'scripts' / 'r3-tpu-suite6.py'))
run = _runner['run']


def train_leg(results, tag, extra_args):
    shutil.rmtree(ROOT / 'runs' / 'default' / tag, ignore_errors=True)
    rc, _ = run('train-var-rate.py',
                ['--trainset', 'runs/synth-train',
                 '--valset', 'runs/synth-val',
                 '--name', tag,
                 '--amp', '--probe_device_step',
                 '--iterations', '600'] + extra_args)
    results[f'{tag}_rc'] = rc
    log = ROOT / 'runs' / 'default' / tag / 'train_log.jsonl'
    if log.exists():
        rows = [json.loads(ln) for ln in log.read_text().splitlines() if ln]
        imgs = sorted(r['img_per_s'] for r in rows if 'img_per_s' in r)
        if imgs:
            results[f'{tag}_imgps_median'] = imgs[len(imgs) // 2]
            results[f'{tag}_imgps_max'] = imgs[-1]
        dev = [r for r in rows if 'device_step_ms' in r]
        if dev:
            results[f'{tag}_device_step_ms'] = dev[-1]['device_step_ms']
            results[f'{tag}_device_mfu'] = dev[-1].get('device_mfu')
        mfu = [r['mfu'] for r in rows if 'mfu' in r]
        if mfu:
            results[f'{tag}_mfu_median'] = sorted(mfu)[len(mfu) // 2]


def main():
    results = {}
    train_leg(results, 'r3-devdata-throughput',
              ['--device_data', '--batch_size', '16'])
    train_leg(results, 'r3-devdata-b32-remat',
              ['--device_data', '--remat', '--batch_size', '32'])
    (ROOT / 'runs' / 'train-devdata-r3.json').write_text(
        json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()

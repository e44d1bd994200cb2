"""Round-4 TPU evidence runs, part 20 — trainer e2e throughput at HEAD.

suite15's donated-state probe put the production bf16 batch-16 train step
at 77.7 ms (206 img/s device-only); the r3 e2e record is 188.6 img/s
(runs/train-asyncmetrics-r3.json). This re-runs the REAL trainer (600
steps, --amp --device_data, async metric staging) to record the e2e
number at HEAD. Writes runs/train-e2e-r4.json.

Usage: nohup python scripts/r4-tpu-suite20.py > /tmp/r4-suite20.log 2>&1 &
"""
import json
import runpy
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

_s9 = runpy.run_path(str(ROOT / 'scripts' / 'r3-tpu-suite9.py'))
train_leg = _s9['train_leg']


def main():
    results = {}
    train_leg(results, 'r4-e2e-b16',
              ['--device_data', '--batch_size', '16'])
    (ROOT / 'runs' / 'train-e2e-r4.json').write_text(
        json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()

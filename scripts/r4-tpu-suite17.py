"""Round-4 TPU evidence runs, part 17 — one-process acceptance orchestrator.

HEAD carries three codec changes that only hardware can truly validate
(the r3 lesson: three desync bugs were invisible to every CPU test):
  1. pair-emission rANS encode kernels — the kernels now emit the WIRE
     packing directly (pair j = word 2j | word 2j+1 << 16), deleting the
     ~17 ms/image XLA strided re-pack seen in the batch-6 profile.
  2. the portable trunk (ops/pallas/trunk.py) — cross-executable
     bitwise-deterministic decode path.
  3. max_program_batch chunked serving (B=8 as two pipelined B=4).

Each TPU process pays a 10-25 min first-fetch stall (CLAUDE.md), so this
wrapper runs the relevant phases of suites 13/14/16 sequentially in ONE
process:
  suite13 KAB — kernel microbench + trained batch acceptance (B in
                {2,4,6,8} x {f32, bf16}) + qres/lossless batch, all on
                the NEW pair-emitting kernels.
  suite14 SX  — portable single acceptance + cross-executable decode
                (B=3 binary <-> B=1 binary, fresh-codec recompile).
  suite16 EG  — single-image enc/dec attribution AFTER the pack rework
                (compare runs/fused-attrib-r4.txt pre-change: enc 22.5 ms
                envelope) + chunked-B=8 revalidation.

Usage: nohup python scripts/r4-tpu-suite17.py [spec] > /tmp/r4-suite17.log 2>&1 &
       spec default "13:KAB,14:SX,16:EG" (comma-separated suite:phases).
"""
import importlib.util
import os
import sys
import time
from pathlib import Path

os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SCRIPTS = {
    '13': 'r3-tpu-suite13.py',
    '14': 'r4-tpu-suite14.py',
    '15': 'r4-tpu-suite15.py',
    '16': 'r4-tpu-suite16.py',
}


def run_suite(num, phases):
    script = ROOT / 'scripts' / SCRIPTS[num]
    spec = importlib.util.spec_from_file_location(f'suite{num}', script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv0 = sys.argv
    sys.argv = [str(script)] + ([phases] if phases else [])
    t0 = time.time()
    print(f'===== suite{num} phases={phases or "default"} =====', flush=True)
    try:
        mod.main()
    finally:
        sys.argv = argv0
    print(f'===== suite{num} done in {(time.time() - t0) / 60:.1f} min =====',
          flush=True)


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else '13:KAB,14:SX,16:EG'
    t00 = time.time()
    failures = []
    for item in spec.split(','):
        num, _, phases = item.partition(':')
        try:
            run_suite(num, phases)
        except Exception:                 # one suite must not kill the rest
            import traceback
            traceback.print_exc()
            failures.append(item)
    print(f'=== suite17 orchestration done in '
          f'{(time.time() - t00) / 60:.1f} min; '
          f'failures: {failures or "none"} ===', flush=True)


if __name__ == '__main__':
    main()

#!/bin/bash
# Round-5 TPU evidence chain, part 2 (sequential: 1 CPU core, and the
# per-process first-fetch stall is paid once per step anyway).
#   1. suite2: HEAD re-acceptance after the prepare_inband gather fix +
#      chained-iter portable device exec + fresh attribution (VERDICT
#      r4 items 3/6/8)
#   2. fresh-process decode of the committed .bits files (re-run: the
#      first attempt crashed on a mid-edit module mix)
#   3. train-probe adjudication (VERDICT r4 weak item 3)
cd /root/repo
echo "=== 1. suite2 (re-acceptance + exec + attrib) ==="
timeout 3000 python scripts/r5-tpu-suite2.py > /tmp/r5-suite2.log 2>&1
echo "suite2 rc=$?"
echo "=== 2. fresh-process decode ==="
timeout 1800 python scripts/r5-tpu-decode-files.py > /tmp/r5-decode2.log 2>&1
echo "decode rc=$?"
echo "=== 3. train-probe adjudication ==="
timeout 2400 python scripts/r5-tpu-train-probe.py > /tmp/r5-probe.log 2>&1
echo "probe rc=$?"
echo "=== chain2 done ==="

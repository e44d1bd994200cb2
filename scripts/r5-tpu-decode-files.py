"""Round-5 fresh-process decode test: THE decode-anywhere proof.

Runs in a SEPARATE OS process from scripts/r5-tpu-suite.py (phase F),
so every executable here is a fresh compilation: decoding the committed
.bits files bit-exactly (sha256 of the decoded pixels vs the encoder
process's manifest) proves the portable streams are device-independent
files in the reference's sense (lvae/models/qarv/model.py:572-581,
qresvae/model.py:689-725) — not binary-pinned artifacts.

Usage: nohup python scripts/r5-tpu-decode-files.py > /tmp/r5-decode.log 2>&1 &
       (after the suite's phase F has written runs/r5-files/)
"""
import hashlib
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

WEIGHT_CANDIDATES = (
    'runs/qarv_base_synth6k_ema.msgpack',
    'checkpoints/qarv_base_synth6k_ema_f16.msgpack',
)


def sha(a):
    import numpy as np
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()[:16]


def main():
    import numpy as np
    import jax
    import lvae_tpu
    from lvae_tpu.utils.general import enable_compile_cache
    # fresh executables are the point: do NOT reuse the encode process's
    # persistent compile cache
    os.environ.setdefault('LVAE_TPU_NO_CACHE', '1')
    enable_compile_cache()
    print(f'device: {jax.devices()}', flush=True)
    t0 = time.time()
    np.asarray(jax.numpy.zeros((8,)))
    print(f'first fetch: {time.time() - t0:.0f}s', flush=True)

    fdir = ROOT / 'runs' / 'r5-files'
    manifest = json.loads((fdir / 'manifest.json').read_text())
    models = {}
    out = {}
    ok_all = True
    for fname, meta in manifest.items():
        name = meta['model']
        if name not in models:
            m = lvae_tpu.get_model(name)
            if name == 'qarv_base':
                w = next((p for p in WEIGHT_CANDIDATES
                          if (ROOT / p).is_file()), None)
                assert w
                m.load_weights(str(ROOT / w))
            m.compress_mode(coder='fused',
                            **(dict(esc_cap=8192, word_cap=1 << 17)
                               if name == 'qarv_base' else {}))
            models[name] = m
        m = models[name]
        t0 = time.time()
        dec = m.decompress_file(str(fdir / fname))
        got = sha(dec)
        ok = got == meta['recon_sha']
        ok_all &= ok
        out[fname] = {'bit_exact': ok, 'decode_first_s':
                      round(time.time() - t0, 1)}
        print(f'  {fname}: {"BIT-EXACT" if ok else "MISMATCH"} '
              f'({time.time() - t0:.0f}s first decode)', flush=True)
    (ROOT / 'runs' / 'r5-fresh-process-decode.json').write_text(
        json.dumps({'all_bit_exact': ok_all, 'files': out}, indent=2))
    assert ok_all, out
    print('=== fresh-process decode: ALL BIT-EXACT ===', flush=True)


if __name__ == '__main__':
    main()

"""Round-4 TPU evidence runs, part 19 — capped-codec xplane attribution.

suite18 put the word_cap=128k f32 codec at enc 16.2 + dec 7.6 = 23.8 ms
chained-iter device exec (target: <20 ms, VERDICT r3 item 4). This traces
the capped single-image f32 encode and decode programs and appends the
top-op tables to runs/fused-attrib-r4.txt, to find the next lever.

Usage: nohup python scripts/r4-tpu-suite19.py > /tmp/r4-suite19.log 2>&1 &
"""
import glob
import json
import os
import shutil
import struct
import sys
import time
from collections import defaultdict
from pathlib import Path

os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np

WEIGHT_CANDIDATES = (
    'runs/qarv_base_synth6k_ema.msgpack',
    'checkpoints/qarv_base_synth6k_ema_f16.msgpack',
)
WORD_CAP = 1 << 17


def attribute(logdir, label, fh):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                            recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, 'rb').read())
    summary = {}
    lines = [f'== {label} ==']
    for plane in xs.planes:
        if 'TPU' not in plane.name:
            continue
        emeta = {mm.id: mm.name for mm in plane.event_metadata.values()}
        tot = defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            for ev in line.events:
                nm = emeta.get(ev.metadata_id, '?')
                tot[nm][0] += ev.duration_ps / 1e9
                tot[nm][1] += 1

        def klass(nm):
            if 'convolution' in nm or 'dot' in nm:
                return 'matmul/conv'
            if 'custom-call' in nm or 'tpu_custom_call' in nm:
                return 'pallas'
            if 'copy' in nm or 'transpose' in nm:
                return 'copy/layout'
            if 'fusion' in nm:
                return 'fusion'
            return 'other'
        by_class = defaultdict(float)
        prog_ms = 0.0
        for nm, (ms, n) in tot.items():
            if nm.startswith('jit_'):
                prog_ms = max(prog_ms, ms)
                continue
            by_class[klass(nm)] += ms
        summary = {'program_ms': round(prog_ms, 2),
                   **{k: round(v, 2) for k, v in by_class.items()}}
        lines.append(f'plane {plane.name}: program envelope {prog_ms:.1f} ms')
        for k, v in sorted(by_class.items(), key=lambda kv: -kv[1]):
            lines.append(f'  {k:<12s} {v:8.2f} ms')
        lines.append('top 30 ops:')
        for nm, (ms, n) in sorted(tot.items(), key=lambda kv: -kv[1][0])[:30]:
            if nm.startswith('jit_'):
                continue
            lines.append(f'  {ms:8.2f} ms x{n:<4d} {nm[:130]}')
    txt = '\n'.join(lines)
    print(txt, flush=True)
    fh.write(txt + '\n\n')
    fh.flush()
    return summary


def main():
    import jax
    import jax.numpy as jnp
    import lvae_tpu
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    print(f'device: {jax.devices()}', flush=True)

    model = lvae_tpu.get_model('qarv_base')
    w = next((p for p in WEIGHT_CANDIDATES if (ROOT / p).is_file()), None)
    assert w
    model.load_weights(str(ROOT / w))
    jax.block_until_ready(jax.tree.leaves(model.params)[0])

    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(0)
    im = gaussian_filter(rng.uniform(0, 1, (512, 768, 3)), sigma=(4, 4, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = jnp.asarray((np.round(im * 255) / 255).astype(np.float32)[None])
    np.asarray(im[0, :1, :1, 0])

    model.compress_mode(coder='fused', esc_cap=8192, word_cap=WORD_CAP)
    t0 = time.time()
    body = model.compress(im, lmb=512.0)
    print(f'compile/warm encode {time.time() - t0:.0f}s', flush=True)
    _, nH, nW = struct.unpack('3H', body[4:10])
    lmb_f32 = struct.unpack('f', struct.pack('f', 512.0))[0]
    img = model.decompress_to_device(lmb_f32, 1, nH, nW, body[10:])
    np.asarray(img[0, :1, :1, 0])

    out = {}
    fh = open(ROOT / 'runs' / 'fused-attrib-r4.txt', 'a')
    for what in ('enc', 'dec'):
        logdir = f'/tmp/jaxtrace-capped-{what}'
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir):
            if what == 'enc':
                body = model.compress(im, lmb=512.0)
            else:
                img = model.decompress_to_device(
                    lmb_f32, 1, nH, nW, body[10:])
                np.asarray(img[0, :1, :1, 0])
        out[f'capped_{what}'] = attribute(
            logdir, f'single-image {what} f32 word_cap=128k trained r4', fh)
    (ROOT / 'runs' / 'suite19-r4.json').write_text(json.dumps(out, indent=2))
    print('=== suite19 done ===', flush=True)


if __name__ == '__main__':
    main()

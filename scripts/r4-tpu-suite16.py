"""Round-4 TPU evidence runs, part 16 — device-compute attribution for the
20 ms north star + the B=8 decode cliff.

VERDICT r3 items 4 and 5. One process:
  E. single-image fused codec (trained qarv_base, 512x768, f32): xplane
     traces of encode and decode, top-op attribution — the ground truth
     for where the remaining device time lives (enc ~24.5 ms + dec
     ~9.5 ms in r3; target < 20 ms combined).
  F. B=8 decode xplane trace: why does the decode leg (no backbone)
     cliff 3.6x vs B=6 (457 ms vs 126 ms, runs/suite13-r3.json)?
     Attribution decides between HBM pressure, a layout flip, and
     fusion-boundary changes.
  G. the mitigation: B=8 served as two pipelined B=4 chunks
     (compress_mode(max_program_batch=4), fused_base._chunk_sizes) —
     bit-exact acceptance + per-image ms vs the monolithic B=8 and B=6
     numbers from suite13.

Appends attributions to runs/fused-attrib-r4.txt and writes summary JSON
runs/suite16-r4.json.

Usage: nohup python scripts/r4-tpu-suite16.py [phases] > /tmp/r4-suite16.log 2>&1 &
       phases default "EF".
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


def make_images(n, H, Wd, seed=3):
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    ims = []
    for i in range(n):
        im = gaussian_filter(rng.uniform(0, 1, (H, Wd, 3)),
                             sigma=(3 + (i % 4), 3 + (i % 4), 0))
        im = (im - im.min()) / (im.max() - im.min() + 1e-9)
        ims.append((np.round(im * 255) / 255).astype(np.float32))
    return np.stack(ims)


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
    phases = sys.argv[1] if len(sys.argv) > 1 else 'EFG'
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
    out = {}
    fh = open(ROOT / 'runs' / 'fused-attrib-r4.txt', 'a')

    def save():
        (ROOT / 'runs' / 'suite16-r4.json').write_text(
            json.dumps(out, indent=2))

    if 'E' in phases:
        print('--- phase E: single-image enc/dec attribution ---', flush=True)
        im = jnp.asarray(make_images(1, 512, 768))
        np.asarray(im[0, :1, :1, 0])
        model.compress_mode(coder='fused', esc_cap=8192)
        t0 = time.time()
        body = model.compress(im, lmb=512.0)
        print(f'  compile/warm encode {time.time() - t0:.0f}s', flush=True)
        _, nH, nW = struct.unpack('3H', body[4:10])
        lmb_f32 = struct.unpack('f', struct.pack('f', 512.0))[0]
        img = model.decompress_to_device(lmb_f32, 1, nH, nW, body[10:])
        np.asarray(img[0, :1, :1, 0])
        for what in ('enc', 'dec'):
            logdir = f'/tmp/jaxtrace-single-{what}'
            shutil.rmtree(logdir, ignore_errors=True)
            with jax.profiler.trace(logdir):
                if what == 'enc':
                    body = model.compress(im, lmb=512.0)
                else:
                    img = model.decompress_to_device(
                        lmb_f32, 1, nH, nW, body[10:])
                    np.asarray(img[0, :1, :1, 0])
            out[f'single_{what}'] = attribute(
                logdir, f'single-image {what} f32 trained r4', fh)
        save()

    if 'F' in phases:
        print('--- phase F: B=8 decode cliff attribution ---', flush=True)
        ims = jnp.asarray(make_images(8, 512, 768, seed=5))
        np.asarray(ims[0, :1, :1, 0])
        model.compress_mode(coder='fused', esc_cap=8192)
        lmbs = [512.0] * 8
        t0 = time.time()
        bodies = model.compress_batch(ims, lmb=lmbs)
        print(f'  compile/warm B=8 encode {time.time() - t0:.0f}s',
              flush=True)
        imgd = model.decompress_batch_to_device(bodies)
        np.asarray(imgd[0, :1, :1, 0])
        logdir = '/tmp/jaxtrace-b8-dec'
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir):
            imgd = model.decompress_batch_to_device(bodies)
            np.asarray(imgd[0, :1, :1, 0])
        out['b8_dec'] = attribute(logdir, 'batch8 dec f32 trained r4', fh)
        # B=6 same day, same process — the apples-to-apples comparator
        bodies6 = model.compress_batch(ims[:6], lmb=lmbs[:6])
        imgd6 = model.decompress_batch_to_device(bodies6)
        np.asarray(imgd6[0, :1, :1, 0])
        logdir = '/tmp/jaxtrace-b6-dec'
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir):
            imgd6 = model.decompress_batch_to_device(bodies6)
            np.asarray(imgd6[0, :1, :1, 0])
        out['b6_dec'] = attribute(logdir, 'batch6 dec f32 trained r4', fh)
        save()

    if 'G' in phases:
        print('--- phase G: B=8 as two pipelined B=4 chunks ---', flush=True)
        ims = jnp.asarray(make_images(8, 512, 768, seed=5))
        np.asarray(ims[0, :1, :1, 0])
        model.compress_mode(coder='fused', esc_cap=8192,
                            max_program_batch=4)
        lmbs = [512.0] * 8
        lmb_f32 = struct.unpack('f', struct.pack('f', 512.0))[0]
        t0 = time.time()
        bodies = model.compress_batch(ims, lmb=lmbs)
        print(f'  chunked B=8 first encode (compile) {time.time() - t0:.0f}s',
              flush=True)
        det = model.compress_batch(ims, lmb=lmbs) == bodies
        _, recon = model._fused.encode_check_batch(
            model.params, ims, jnp.asarray([lmb_f32] * 8, jnp.float32))
        dec = np.asarray(model.decompress_batch(bodies))
        bit_exact = bool(np.array_equal(dec, np.asarray(recon, np.float32)))
        enc_t, dec_t = [], []
        for _ in range(7):
            t0 = time.perf_counter()
            bodies = model.compress_batch(ims, lmb=lmbs)
            t1 = time.perf_counter()
            imgd = model.decompress_batch_to_device(bodies)
            np.asarray(imgd[0, :1, :1, 0])
            dec_t.append(time.perf_counter() - t1)
            enc_t.append(t1 - t0)
        med = lambda v: float(sorted(v)[len(v) // 2] * 1e3)
        out['b8_chunked'] = {
            'bit_exact': bit_exact, 'deterministic': bool(det),
            'encode_ms_total': round(med(enc_t), 2),
            'decode_ms_total': round(med(dec_t), 2),
            'encdec_ms_per_image': round((med(enc_t) + med(dec_t)) / 8, 2)}
        print(f'  b8_chunked: {out["b8_chunked"]}', flush=True)
        assert bit_exact and det
        save()

    fh.close()
    save()
    print('=== suite16 done ===', flush=True)


if __name__ == '__main__':
    main()

"""Round-3 TPU evidence runs, part 12 — batch-serving follow-ups.

One process (the per-process first-fetch stall is 10-25 min; CLAUDE.md):
  A. qres34m batch acceptance: B=4 random-init 512x768 streams round-trip
     bitwise against the encode-side reconstruction (selfcheck), encode is
     deterministic.
  B. qres34m_lossless batch acceptance: B=2 exact uint8 round-trip of the
     pixel grid on hardware (the pixel head's (T,N) rows are ~50x a latent
     block's; CPU tests only cover 128x128).
  C. xplane profile of the batch-6 qarv_base encode + decode programs
     (trained weights, f32): by-class device-time and top ops, so the
     ~200 ms encode device time is attributed, not guessed.
  D. bf16 (encoder-backbone-only) batch throughput at B in {4,6,8} with
     trained weights — candidates to soften the B=8 HBM cliff (f32
     backbone activations were the suspect) and cut encode time.

Usage: nohup python scripts/r3-tpu-suite12.py [phases] > /tmp/r3suite12.log 2>&1 &
       phases default "ABCD" (e.g. "CD" to skip acceptance).
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

W = 'runs/qarv_base_synth6k_ema.msgpack'


def med_ms(v):
    return float(sorted(v)[len(v) // 2] * 1e3)


def make_images(n, H, Wd, seed=3):
    import numpy as np
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    ims = []
    for i in range(n):
        im = gaussian_filter(rng.uniform(0, 1, (H, Wd, 3)),
                             sigma=(3 + (i % 4), 3 + (i % 4), 0))
        im = (im - im.min()) / (im.max() - im.min() + 1e-9)
        ims.append((np.round(im * 255) / 255).astype(np.float32))
    return np.stack(ims)


def parse_trace(logdir, label):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                            recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, 'rb').read())
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
            if 'while' in nm:
                return 'while'
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
        lines.append(f'plane {plane.name}: program envelope {prog_ms:.1f} ms')
        for k, v in sorted(by_class.items(), key=lambda kv: -kv[1]):
            lines.append(f'  {k:<12s} {v:8.2f} ms')
        lines.append('top 25 ops:')
        for nm, (ms, n) in sorted(tot.items(), key=lambda kv: -kv[1][0])[:25]:
            if nm.startswith('jit_'):
                continue
            lines.append(f'  {ms:8.2f} ms x{n:<4d} {nm[:110]}')
    txt = '\n'.join(lines)
    print(txt, flush=True)
    return txt


def phase_a(np, jnp):
    import lvae_tpu
    print('--- phase A: qres34m batch acceptance (random init) ---',
          flush=True)
    m = lvae_tpu.get_model('qres34m', lmb=1024)
    import jax
    m.params = jax.device_put(m.params)
    jax.block_until_ready(jax.tree.leaves(m.params)[0])
    ims = make_images(4, 512, 768, seed=5)
    m.compress_mode(coder='fused', esc_cap=1 << 17)
    sub = jnp.asarray(ims)
    np.asarray(sub[0, :1, :1, 0])
    t0 = time.time()
    objs = m.compress_batch(sub)
    print(f'  first encode (compile) {time.time() - t0:.0f}s', flush=True)
    _, recon = m._fused.encode_check_batch(m.params, sub)
    dec = np.asarray(m.decompress_batch(objs))
    bit_exact = bool(np.array_equal(dec, np.asarray(recon, np.float32)))
    det = m.compress_batch(sub) == objs
    n_words = [struct.unpack('<IIH', o[0][:10])[0] for o in objs]
    res = {'bit_exact': bit_exact, 'deterministic': bool(det),
           'n_words': n_words}
    print(f'  qres34m B=4: {res}', flush=True)
    assert bit_exact and det
    return res


def phase_b(np, jnp):
    import lvae_tpu
    print('--- phase B: qres34m_lossless batch acceptance ---', flush=True)
    m = lvae_tpu.get_model('qres34m_lossless')
    import jax
    m.params = jax.device_put(m.params)
    jax.block_until_ready(jax.tree.leaves(m.params)[0])
    ims = make_images(2, 256, 384, seed=7)
    m.compress_mode(coder='fused', esc_cap=1 << 17)
    sub = jnp.asarray(ims)
    np.asarray(sub[0, :1, :1, 0])
    t0 = time.time()
    objs = m.compress_batch(sub)
    print(f'  first encode (compile) {time.time() - t0:.0f}s', flush=True)
    dec = np.asarray(m.decompress_batch(objs))
    exact = bool(np.array_equal(np.round(dec * 255).astype(np.uint8),
                                np.round(ims * 255).astype(np.uint8)))
    bpp = sum(len(o[0]) for o in objs) * 8 / (2 * 256 * 384)
    res = {'exact_uint8': exact, 'bpp': round(bpp, 3)}
    print(f'  qres34m_lossless B=2: {res}', flush=True)
    assert exact
    return res


def load_trained_qarv(np, jnp):
    import jax
    import lvae_tpu
    model = lvae_tpu.get_model('qarv_base')
    assert (ROOT / W).is_file(), f'{W} missing — retrain + export first'
    model.load_weights(str(ROOT / W))
    model.params = jax.device_put(model.params)
    jax.block_until_ready(jax.tree.leaves(model.params)[0])
    return model


def phase_c(np, jnp, model):
    import jax
    print('--- phase C: batch-6 xplane profile (trained, f32) ---',
          flush=True)
    ims = make_images(6, 512, 768)
    sub = jnp.asarray(ims)
    np.asarray(sub[0, :1, :1, 0])
    lmbs = [512.0] * 6
    model.compress_mode(coder='fused', esc_cap=8192)
    bodies = model.compress_batch(sub, lmb=lmbs)          # compile
    model.decompress_batch_to_device(bodies)              # compile
    texts = []
    for what in ('enc', 'dec'):
        logdir = f'/tmp/jaxtrace-batch-{what}'
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir):
            if what == 'enc':
                bodies = model.compress_batch(sub, lmb=lmbs)
            else:
                img = model.decompress_batch_to_device(bodies)
                np.asarray(img[0, :1, :1, 0])
        texts.append(parse_trace(logdir, f'batch6 {what} f32 trained'))
    (ROOT / 'runs' / 'batch-profile-r3.txt').write_text('\n\n'.join(texts))
    return True


def phase_d(np, jnp, model):
    print('--- phase D: bf16 batch throughput (trained) ---', flush=True)
    ims = make_images(8, 512, 768)
    results = {}
    model.compress_mode(coder='fused', esc_cap=8192,
                        compute_dtype='bfloat16')
    for B in (4, 6, 8):
        sub = jnp.asarray(ims[:B])
        np.asarray(sub[0, :1, :1, 0])
        lmbs = [512.0] * B
        lmb_f32 = struct.unpack('f', struct.pack('f', 512.0))[0]
        try:
            t0 = time.time()
            bodies = model.compress_batch(sub, lmb=lmbs)
            print(f'  B={B} bf16: first encode (compile) '
                  f'{time.time() - t0:.0f}s', flush=True)
            _, recon = model._fused.encode_check_batch(
                model.params, sub, jnp.asarray([lmb_f32] * B, jnp.float32))
            dec = np.asarray(model.decompress_batch(bodies))
            bit_exact = bool(np.array_equal(dec, np.asarray(recon,
                                                            np.float32)))
            enc_t, dec_t = [], []
            for _ in range(7):
                t0 = time.perf_counter()
                bodies = model.compress_batch(sub, lmb=lmbs)
                t1 = time.perf_counter()
                img_dev = model.decompress_batch_to_device(bodies)
                np.asarray(img_dev[0, :1, :1, 0])
                dec_t.append(time.perf_counter() - t1)
                enc_t.append(t1 - t0)
            bpp = sum(len(b) for b in bodies) * 8 / (B * 512 * 768)
            results[f'B{B}_bf16'] = {
                'bit_exact': bit_exact,
                'encode_ms_total': round(med_ms(enc_t), 2),
                'decode_ms_total': round(med_ms(dec_t), 2),
                'encdec_ms_per_image': round(
                    (med_ms(enc_t) + med_ms(dec_t)) / B, 2),
                'bpp': round(bpp, 4)}
        except Exception as e:                      # e.g. B=8 OOM
            results[f'B{B}_bf16'] = {'error': f'{type(e).__name__}: {e}'[:300]}
        print(f'  B={B} bf16: {results[f"B{B}_bf16"]}', flush=True)
    out = ROOT / 'runs' / 'batch-throughput-r3.json'
    prev = json.loads(out.read_text()) if out.is_file() else {}
    prev.update(results)
    out.write_text(json.dumps(prev, indent=2))
    return results


def main():
    phases = sys.argv[1] if len(sys.argv) > 1 else 'ABCD'
    import jax
    import jax.numpy as jnp
    import numpy as np
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    summary = {}
    if 'A' in phases:
        summary['qres34m_batch'] = phase_a(np, jnp)
    if 'B' in phases:
        summary['qres34m_lossless_batch'] = phase_b(np, jnp)
    model = None
    if 'C' in phases or 'D' in phases:
        model = load_trained_qarv(np, jnp)
    if 'C' in phases:
        summary['profile'] = phase_c(np, jnp, model)
    if 'D' in phases:
        summary['bf16_batch'] = phase_d(np, jnp, model)
    out = ROOT / 'runs' / 'suite12-r3.json'
    out.write_text(json.dumps(summary, indent=2, default=str))
    print('SUITE12 DONE', flush=True)
    print(json.dumps(summary, default=str), flush=True)


if __name__ == '__main__':
    main()

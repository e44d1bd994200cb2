"""Round-4 TPU evidence runs, part 14 — portable codec (stream portability).

VERDICT r3 item 3: a stream must be decodable by executables other than
the one that wrote it (the reference's bitstreams decode on any decoder
instance, /root/reference/lvae/models/qarv/model.py:531-557). The
portable trunk (ops/pallas/trunk.py) achieves this by running every
arithmetic op of the decode-critical path inside fixed-block-spec Pallas
kernels — Mosaic compiles those in isolation from the enclosing XLA
program, so any executable reproduces bitwise-identical trunk floats.

One process (the per-process first-fetch stall is 10-25 min; CLAUDE.md):
  P. the determinism probe (scripts/r4-probe-determinism.py): XLA stage
     drift across programs/batch vs Pallas stage zero-drift, on hardware.
  S. trained qarv_base 512x768 portable single-image: self round-trip
     bit-exact + deterministic + enc/dec latency (vs legacy numbers from
     suite13/bench for context).
  X. CROSS-EXECUTABLE: encode with the B=3 batch binary, decode each
     stream with the B=1 binary — decoded pixels must equal the batch
     binary's own encode-side recon bitwise; and the reverse (B=1-encoded
     streams decoded by the batch binary). Also a FRESH codec object
     (new pallas_call closures + new jit, models a future recompile)
     decodes the same stream bit-exactly.

Usage: nohup python scripts/r4-tpu-suite14.py [phases] > /tmp/r4-suite14.log 2>&1 &
       phases default "PSX".
"""
import json
import os
import struct
import sys
import time
from pathlib import Path

os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

WEIGHT_CANDIDATES = (
    'runs/qarv_base_synth6k_ema.msgpack',
    'checkpoints/qarv_base_synth6k_ema_f16.msgpack',
)


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


def phase_p():
    print('--- phase P: cross-program determinism probe ---', flush=True)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'r4_probe', ROOT / 'scripts' / 'r4-probe-determinism.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    res = json.loads((ROOT / 'runs' / 'probe-determinism-r4.json')
                     .read_text())
    assert res['pallas_deterministic'], res
    return res


def load_trained_qarv(np, jnp):
    import jax
    import lvae_tpu
    model = lvae_tpu.get_model('qarv_base')
    w = next((p for p in WEIGHT_CANDIDATES if (ROOT / p).is_file()), None)
    assert w, f'none of {WEIGHT_CANDIDATES} present'
    print(f'  weights: {w}', flush=True)
    model.load_weights(str(ROOT / w))
    jax.block_until_ready(jax.tree.leaves(model.params)[0])
    return model


def phase_s(np, jnp, model):
    print('--- phase S: portable single-image acceptance + latency ---',
          flush=True)
    im = make_images(1, 512, 768)
    im_dev = jnp.asarray(im)
    np.asarray(im_dev[0, :1, :1, 0])
    model.compress_mode(coder='fused', esc_cap=8192, portable=True)
    lmb_f32 = struct.unpack('f', struct.pack('f', 512.0))[0]
    t0 = time.time()
    body = model.compress(im_dev, lmb=512.0)
    print(f'  portable B=1 first encode (compile) {time.time() - t0:.0f}s',
          flush=True)
    det = model.compress(im_dev, lmb=512.0) == body
    _, recon = model._fused.encode_check(
        model.params, im_dev, jnp.full((1,), lmb_f32, jnp.float32))
    t0 = time.time()
    dec = np.asarray(model.decompress(body))
    print(f'  portable B=1 first decode {time.time() - t0:.0f}s', flush=True)
    bit_exact = bool(np.array_equal(dec, np.asarray(recon, np.float32)))
    enc_t, dec_t = [], []
    for _ in range(9):
        t0 = time.perf_counter()
        body = model.compress(im_dev, lmb=512.0)
        t1 = time.perf_counter()
        _, nH, nW = struct.unpack('3H', body[4:10])
        img_dev = model.decompress_to_device(lmb_f32, 1, nH, nW, body[10:])
        np.asarray(img_dev[0, :1, :1, 0])
        dec_t.append(time.perf_counter() - t1)
        enc_t.append(t1 - t0)
    res = {'bit_exact': bit_exact, 'deterministic': bool(det),
           'encode_ms': round(med_ms(enc_t), 2),
           'decode_ms': round(med_ms(dec_t), 2),
           'bpp': round(len(body) * 8 / (512 * 768), 4)}
    print(f'  portable single: {res}', flush=True)
    assert bit_exact and det
    return res


def phase_x(np, jnp, model):
    print('--- phase X: cross-executable decode (B=3 <-> B=1) ---',
          flush=True)
    B = 3
    ims = make_images(B, 512, 768, seed=11)
    sub = jnp.asarray(ims)
    np.asarray(sub[0, :1, :1, 0])
    lmbs = [512.0, 512.0, 1024.0]
    lmb_arr = jnp.asarray(
        [struct.unpack('f', struct.pack('f', v))[0] for v in lmbs],
        jnp.float32)
    res = {}

    # batch binary encodes; its own encode-side recon is the pixel oracle
    t0 = time.time()
    bodies = model.compress_batch(sub, lmb=lmbs)
    print(f'  portable B=3 first encode (compile) {time.time() - t0:.0f}s',
          flush=True)
    _, recon_b = model._fused.encode_check_batch(model.params, sub, lmb_arr)
    recon_np = np.asarray(recon_b, np.float32)

    # B=1 binary (compiled in phase S) decodes each batch-encoded stream
    cross_ok = True
    for b, body in enumerate(bodies):
        dec = np.asarray(model.decompress(body))
        ok = bool(np.array_equal(dec[0], recon_np[b]))
        cross_ok &= ok
        print(f'  batch-encoded stream {b} -> B=1 binary: '
              f'{"bit-exact" if ok else "DESYNC"}', flush=True)
    res['batch_to_single_bit_exact'] = cross_ok

    # reverse: B=1-encoded streams decoded by the batch binary
    solo = [model.compress(sub[b:b + 1], lmb=lmbs[b]) for b in range(B)]
    dec_b = np.asarray(model.decompress_batch(solo))
    solo_dec = np.stack([np.asarray(model.decompress(s))[0] for s in solo])
    rev_ok = bool(np.array_equal(dec_b, solo_dec))
    res['single_to_batch_bit_exact'] = rev_ok
    print(f'  B=1-encoded streams -> batch binary: '
          f'{"bit-exact" if rev_ok else "DESYNC"}', flush=True)

    # fresh codec object = new pallas_call closures + new jit programs
    # (models decoding by a future recompile / another process)
    model._fused_by_lanes = {}
    model._fused = model._get_fused(model.num_lanes)
    dec_fresh = np.asarray(model.decompress(bodies[0]))
    fresh_ok = bool(np.array_equal(dec_fresh[0], recon_np[0]))
    res['fresh_codec_bit_exact'] = fresh_ok
    print(f'  fresh codec object decode: '
          f'{"bit-exact" if fresh_ok else "DESYNC"}', flush=True)

    assert cross_ok and rev_ok and fresh_ok
    return res


def main():
    phases = sys.argv[1] if len(sys.argv) > 1 else 'PSX'
    import numpy as np
    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    out = {}
    t00 = time.time()
    print(f'device: {jax.devices()}', flush=True)
    if 'P' in phases:
        out['probe'] = phase_p()
    if 'S' in phases or 'X' in phases:
        model = load_trained_qarv(np, jnp)
    if 'S' in phases:
        out['single'] = phase_s(np, jnp, model)
    if 'X' in phases:
        out['cross'] = phase_x(np, jnp, model)
    (ROOT / 'runs' / 'suite14-r4.json').write_text(json.dumps(out, indent=2))
    print(f'=== suite14 done in {(time.time() - t00) / 60:.1f} min ===',
          flush=True)


if __name__ == '__main__':
    main()

"""Round-5 TPU evidence runs, part 2 — the prepare_inband gather fix.

prepare_inband's packed (offset|length) table lookup was a 617k-element
jnp.take (~6 ms at TPU-XLA's ~10 ns/element gather cost — the largest
single op in the encode envelope, runs/fused-attrib-r5.txt %cond.186).
It is now an unrolled select-accumulate over the static table (same
lesson as build_indexes, round 3). This run:

  V. HEAD re-acceptance (the r3 rule: every codec-path change re-proves
     bit-exactness on hardware): trained qarv_base portable on a real
     photo — bit-exact, deterministic, AND the stream bytes are
     byte-identical to the pre-change file written by suite phase F
     (runs/r5-files/photo1_512x768.qarv.bits) — the lookup change is
     value-equivalent, so the wire must not move.
  E. chained-iter device exec of the capped PORTABLE codec (enc + dec)
     after the fix, plus a fresh xplane attribution — the VERDICT r4
     item-3 scoreline (target: enc+dec <= 20 ms in portable mode).
  L. portable e2e single-image latency (bench methodology) for the
     record.

Usage: nohup python scripts/r5-tpu-suite2.py > /tmp/r5-suite2.log 2>&1 &
"""
import json
import os
import shutil
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
WORD_CAP = 1 << 17


def med_ms(v):
    return float(sorted(v)[len(v) // 2] * 1e3)


def chained_exec(np, fn, sync, k=6, reps=3):
    """Device exec per iter: (t(k) - t(1)) / (k-1); on axon only fetches
    synchronize."""
    def run(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn()
        sync(r)
        return time.perf_counter() - t0
    run(1)
    return min((run(k) - run(1)) / (k - 1) for _ in range(reps)) * 1e3


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from lvae_tpu.utils.general import enable_compile_cache
    enable_compile_cache()
    import lvae_tpu
    out = {}
    print(f'device: {jax.devices()}', flush=True)
    t0 = time.time()
    np.asarray(jnp.zeros((8,)))
    print(f'first fetch: {time.time() - t0:.0f}s', flush=True)

    model = lvae_tpu.get_model('qarv_base')
    w = next((p for p in WEIGHT_CANDIDATES if (ROOT / p).is_file()), None)
    assert w
    model.load_weights(str(ROOT / w))
    jax.block_until_ready(jax.tree.leaves(model.params)[0])
    model.compress_mode(coder='fused', esc_cap=8192, word_cap=WORD_CAP,
                        portable=True)

    # ---- V: HEAD re-acceptance + wire byte-identity -----------------------
    print('--- phase V: re-acceptance + wire byte-identity ---', flush=True)
    src = ROOT / 'images' / 'photo1_512x768.png'
    im = np.asarray(Image.open(src).convert('RGB'), np.float32)[None] / 255.0
    im_dev = jnp.asarray(im)
    np.asarray(im_dev[0, :1, :1, 0])
    t0 = time.time()
    body = model.compress(im_dev, lmb=512.0)
    print(f'  first encode (compile) {time.time() - t0:.0f}s', flush=True)
    det = model.compress(im_dev, lmb=512.0) == body
    lmb_f32 = struct.unpack('f', struct.pack('f', 512.0))[0]
    _, recon = model._fused.encode_check(
        model.params, im_dev, jnp.full((1,), lmb_f32, jnp.float32))
    dec = np.asarray(model.decompress(body))
    bit_exact = bool(np.array_equal(dec, np.asarray(recon, np.float32)))
    old_file = ROOT / 'runs' / 'r5-files' / 'photo1_512x768.qarv.bits'
    wire_same = None
    if old_file.is_file():
        # compress_file layout: [2H orig h/w][body]; body must match
        wire_same = old_file.read_bytes()[4:] == body
    out['reaccept'] = {'bit_exact': bit_exact, 'deterministic': bool(det),
                       'wire_byte_identical_to_prefix_file': wire_same}
    print(f'  {out["reaccept"]}', flush=True)
    assert bit_exact and det and wire_same is not False

    # ---- E: chained-iter exec + attribution -------------------------------
    print('--- phase E: chained-iter device exec (portable, capped) ---',
          flush=True)
    fused = model._fused
    H, W = 512, 768
    codec_fn = fused._codec(H, W)
    dm = fused._dummies(H, W)
    lmb_arr = jnp.full((1,), 512.0, jnp.float32)

    def enc_fn():
        p, _ = codec_fn(model.params, im_dev, dm['enc'], dm['off'],
                        dm['states'], dm['packed'], dm['esc_pos'],
                        dm['esc_val'], lmb_arr)
        return p
    enc_ms = chained_exec(np, enc_fn, lambda p: np.asarray(p[:4]))

    st, pk, ep, ev = fused.parse_payload(body[10:])
    PK, EB = fused._canon_sizes(H // 64, W // 64)
    pk_c = np.zeros(PK, np.int32)
    pk_c[:pk.size] = pk.view(np.int32)
    ep_c = np.full(EB, -1, np.int32)
    ep_c[:ep.size] = ep
    ev_c = np.zeros(EB, np.int32)
    ev_c[:ev.size] = ev
    sj, pj, ej, vj = (jnp.asarray(st), jnp.asarray(pk_c),
                      jnp.asarray(ep_c), jnp.asarray(ev_c))

    def dec_fn():
        _, img = codec_fn(model.params, dm['im'], dm['dec'], dm['on'],
                          sj, pj, ej, vj, lmb_arr)
        return img
    dec_ms = chained_exec(np, dec_fn, lambda r: np.asarray(r[0, :1, :1, 0]))
    out['exec'] = {'enc_exec_ms': round(enc_ms, 2),
                   'dec_exec_ms': round(dec_ms, 2),
                   'encdec_exec_ms': round(enc_ms + dec_ms, 2)}
    print(f'  portable f32 device exec: enc {enc_ms:.1f} + dec {dec_ms:.1f} '
          f'= {enc_ms + dec_ms:.1f} ms', flush=True)

    from lvae_tpu.utils.profiling import op_class_breakdown
    fh = open(ROOT / 'runs' / 'fused-attrib-r5.txt', 'a')
    for what, fn in (('enc', enc_fn), ('dec', dec_fn)):
        logdir = f'/tmp/jaxtrace-r5b-{what}'
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir):
            r = fn()
            (np.asarray(r[:4]) if what == 'enc'
             else np.asarray(r[0, :1, :1, 0]))
        d = op_class_breakdown(logdir)
        out[f'attrib_{what}'] = d
        fh.write(f'== r5b portable {what} f32 (post gather fix) ==\n')
        if d:
            for k, v in d.items():
                if k != 'top_ops':
                    fh.write(f'  {k}: {v}\n')
            fh.write('top 30 ops:\n')
            for ms, n, nm in d['top_ops']:
                fh.write(f'  {ms:8.2f} ms x{n:<4d} {nm}\n')
        fh.write('\n')
        print(f'  {what}: ' + json.dumps(
            {k: v for k, v in (d or {}).items() if k != 'top_ops'}),
            flush=True)
    fh.close()

    # ---- L: e2e latency (bench methodology) -------------------------------
    print('--- phase L: portable e2e latency ---', flush=True)
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
    out['e2e'] = {'encode_ms': round(med_ms(enc_t), 1),
                  'decode_ms': round(med_ms(dec_t), 1),
                  'encdec_ms': round(med_ms(enc_t) + med_ms(dec_t), 1)}
    print(f'  {out["e2e"]}', flush=True)

    (ROOT / 'runs' / 'suite2-r5.json').write_text(json.dumps(out, indent=2))
    print('=== r5 suite2 done ===', flush=True)


if __name__ == '__main__':
    main()

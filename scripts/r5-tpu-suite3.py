"""Round-5 TPU evidence runs, part 3 — the escape-compaction switch.

pack_payload's escape extraction ran a full-symbol-range scatter
(~5.9 ms/image on v5e for ~100 live escapes: runs/suite2-r5.json
attrib_enc %cond.92 + %fusion.10 — scatter cost scales with the UPDATE
count = 617k symbols, not the escape count). It is now a three-way
lax.switch: constants (no escapes) / scatter-free chunked compaction
(sparse: every 1024-symbol chunk <= 16 escapes — all trained operating
points) / the original scatter (dense random-init stress). All branches
produce identical outputs on their domains (tests/test_escape_compaction
.py), so the wire must not move. This run:

  S. on-TPU branch equivalence of the chunked compaction vs the numpy
     scatter reference at the trained escape density (the unit test
     covers CPU; integer ops are exact everywhere, but the TPU lowering
     is what production runs)
  V. HEAD re-acceptance (r3 rule): trained qarv_base portable on the
     committed real photo — bit-exact, deterministic, stream bytes
     byte-identical to the committed .bits file; records which branch
     the trained stream takes (escape count + per-chunk max)
  E. chained-iter device exec of the capped PORTABLE codec + fresh
     xplane attribution — the VERDICT r4 item-3 scoreline
     (target: enc+dec <= 20 ms portable)
  L. portable e2e single-image latency (bench methodology)

Usage: nohup python scripts/r5-tpu-suite3.py > /tmp/r5-suite3.log 2>&1 &
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
    from lvae_tpu.models.fused_base import (
        _compact_escapes_chunked, _escape_chunk_counts, _ESC_CHUNK,
        _ESC_CHUNK_CAP)
    out = {}
    print(f'device: {jax.devices()}', flush=True)
    t0 = time.time()
    np.asarray(jnp.zeros((8,)))
    print(f'first fetch: {time.time() - t0:.0f}s', flush=True)

    # ---- S: on-TPU branch equivalence --------------------------------------
    print('--- phase S: chunked compaction on TPU vs scatter reference ---',
          flush=True)
    rng = np.random.default_rng(5)
    S, esc_cap = 617_472, 8192
    place = rng.choice(S, size=123, replace=False)     # trained density
    mask = np.zeros(S, bool)
    mask[place] = True
    vals = rng.integers(-1000, 1000, S).astype(np.int32)
    assert int(np.asarray(_escape_chunk_counts(
        jnp.asarray(mask, jnp.int32))).max()) <= _ESC_CHUNK_CAP
    gp, gv = jax.jit(lambda m, v: _compact_escapes_chunked(m, v, esc_cap))(
        jnp.asarray(mask), jnp.asarray(vals))
    want_p = np.full(esc_cap, -1, np.int32)
    want_p[:123] = np.sort(place).astype(np.int32)
    want_v = np.zeros(esc_cap, np.int32)
    want_v[:123] = vals[np.sort(place)]
    s_ok = (np.array_equal(np.asarray(gp), want_p)
            and np.array_equal(np.asarray(gv), want_v))
    out['tpu_branch_equivalence'] = bool(s_ok)
    print(f'  sparse branch on TPU == scatter reference: {s_ok}', flush=True)
    assert s_ok

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
        wire_same = old_file.read_bytes()[4:] == body
    st, pk, ep, ev = model._fused.parse_payload(body[10:])
    n_esc = int((ep >= 0).sum())
    out['reaccept'] = {
        'bit_exact': bit_exact, 'deterministic': bool(det),
        'wire_byte_identical_to_committed_file': wire_same,
        'stream_escapes': n_esc,
        'branch_taken': ('none' if n_esc == 0 else 'sparse'),
    }
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
        logdir = f'/tmp/jaxtrace-r5c-{what}'
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir):
            r = fn()
            (np.asarray(r[:4]) if what == 'enc'
             else np.asarray(r[0, :1, :1, 0]))
        d = op_class_breakdown(logdir)
        out[f'attrib_{what}'] = d
        fh.write(f'== r5c portable {what} f32 (post escape-switch) ==\n')
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

    (ROOT / 'runs' / 'suite3-r5.json').write_text(json.dumps(out, indent=2))
    print('=== r5 suite3 done ===', flush=True)


if __name__ == '__main__':
    main()

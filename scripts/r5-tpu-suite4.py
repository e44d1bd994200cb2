"""Round-5 TPU acceptance of the LONG-RUN (mixed real+synthetic) trained
operating point — VERDICT r4 weak item 2.

The r4 verdict: "all rate/distortion/parity evidence rests on one 6k-step
run on 512 synthetic images ... a longer run (>=50k steps, ideally mixing
in the committed real photos) would make the rate-proof and overhead
numbers representative of an actual codec operating point."

This suite re-runs the whole trained-weight evidence stack against the
new 40k-step mixed-trainset EMA checkpoint (runs/r5-trainset: 2048
synthetic + 184 real-photo tiles; scripts/r5-make-trainset.py), in ONE
process (the per-process first-fetch stall is 10-25 min; CLAUDE.md).

Phases (argv via --phases, default ATLVOE):
  A. real-photo portable acceptance: bit-exact vs encode_check,
     deterministic, bpp/PSNR on the 4 committed photos at lambda=512
     (photo1 also at lambda=2048 + host-coder bpp comparison).
  T. chained-iter portable device exec (enc/dec) at the new operating
     point — confirms the 18.7 ms headline class carries over.
  L. e2e latency at the new operating point (bench.py methodology) —
     the number the driver bench will see with this checkpoint.
  V. rate proof: host-coded file bits vs forward-pass KL bppix across
     6 lambdas (scripts/prove-rate-correctness.py, tol 2%).
  O. device-coder flush overhead vs the host coder across lambdas
     (scripts/measure-rate-overhead.py).
  E. true-file eval-var-rate sweep on the real photos -> a NEW results
     file (runs/results/realphotos-r5mix-qarv_base.json; the r4 lesson:
     never overwrite a committed artifact in place).

Usage:
  nohup python scripts/r5-tpu-suite4.py \
      --weights runs/qarv_base_mixed40k_ema.msgpack \
      > /tmp/r5-suite4.log 2>&1 &
"""
import argparse
import json
import runpy
import struct
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

PHOTOS = ('images/photo1_512x768.png', 'images/photo2_512x768.png',
          'images/photo3_512x768.png', 'images/hopper_576x512.png')
WORD_CAP = 1 << 17


def med_ms(v):
    return float(sorted(v)[len(v) // 2] * 1e3)


def chained_exec(np, fn, sync, k=6, reps=3):
    """Marginal per-iteration device time: (t(k chained) - t(1)) / (k-1).
    On this tunnel block_until_ready does not wait — only the sync fetch
    does — so the chained delta removes the fixed sync floor."""
    def run(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn()
        sync(r)
        return time.perf_counter() - t0
    run(1)
    return min((run(k) - run(1)) / (k - 1) for _ in range(reps)) * 1e3


def load_photo(np, path):
    from PIL import Image
    im = np.asarray(Image.open(ROOT / path).convert('RGB'), np.float32)
    return (im / 255.0)[None]


def run_cli(script, argv):
    """Run a repo CLI in-process (stall already paid) with argv patched."""
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(str(ROOT / script), run_name='__main__')
    finally:
        sys.argv = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--weights', required=True,
                    help='flat msgpack EMA weights of the long run')
    ap.add_argument('--tag', default='r5mix')
    ap.add_argument('--phases', default='ATLVOE')
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from lvae_tpu.utils.general import enable_compile_cache
    enable_compile_cache()
    import lvae_tpu

    out = {'weights': args.weights, 'tag': args.tag}
    outpath = ROOT / 'runs' / f'suite4-{args.tag}.json'
    print(f'device: {jax.devices()}', flush=True)
    t0 = time.time()
    np.asarray(jnp.zeros((8,)))
    print(f'first fetch: {time.time() - t0:.0f}s', flush=True)

    model = lvae_tpu.get_model('qarv_base')
    model.load_weights(str(ROOT / args.weights))
    jax.block_until_ready(jax.tree.leaves(model.params)[0])
    model.compress_mode(coder='fused', esc_cap=8192, word_cap=WORD_CAP,
                        portable=True)

    def _save():
        outpath.write_text(json.dumps(out, indent=2, default=str))

    def _run(tag, fn):
        try:
            out[tag] = fn()
        except Exception as e:  # noqa: BLE001 — phases are independent
            import traceback
            traceback.print_exc()
            out[tag] = {'FAILED': f'{type(e).__name__}: {e}'}
        _save()

    # ---------------------------------------------------------- phase A
    def phase_a():
        res = {}
        for pi, path in enumerate(PHOTOS):
            im = load_photo(np, path)
            im_dev = jnp.asarray(im)
            np.asarray(im_dev[0, :1, :1, 0])
            lmbs = (512.0, 2048.0) if pi == 0 else (512.0,)
            for lmb in lmbs:
                lmb_f32 = struct.unpack('f', struct.pack('f', lmb))[0]
                t0 = time.time()
                body = model.compress(im_dev, lmb=lmb)
                det = model.compress(im_dev, lmb=lmb) == body
                _, recon = model._fused.encode_check(
                    model.params, im_dev,
                    jnp.full((1,), lmb_f32, jnp.float32))
                dec = np.asarray(model.decompress(body))
                bit_exact = bool(np.array_equal(
                    dec, np.asarray(recon, np.float32)))
                H, W = im.shape[1], im.shape[2]
                mse = float(np.mean((dec - im) ** 2))
                entry = {'bit_exact': bit_exact, 'deterministic': bool(det),
                         'bpp': round(len(body) * 8 / (H * W), 4),
                         'psnr': round(-10 * float(np.log10(mse + 1e-12)),
                                       2),
                         'first_roundtrip_s': round(time.time() - t0, 1)}
                if pi == 0:
                    model.compress_mode(coder='host')
                    host = model.compress(im, lmb=lmb)
                    entry['host_bpp'] = round(len(host) * 8 / (H * W), 4)
                    model.compress_mode(coder='fused', esc_cap=8192,
                                        word_cap=WORD_CAP, portable=True)
                res[f'{path}@{lmb:g}'] = entry
                print(f'  {path}@{lmb:g}: {entry}', flush=True)
                assert bit_exact and det
        return res

    if 'A' in args.phases:
        print('--- phase A: real-photo portable acceptance (long-run '
              'weights) ---', flush=True)
        _run('real_photos', phase_a)

    # ---------------------------------------------------------- phase T
    def phase_t():
        im = load_photo(np, PHOTOS[0])
        im_dev = jnp.asarray(im)
        np.asarray(im_dev[0, :1, :1, 0])
        body = model.compress(im_dev, lmb=512.0)
        st, pk, ep, ev = model._fused.parse_payload(body[10:])
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
        dec_ms = chained_exec(np, dec_fn,
                              lambda r: np.asarray(r[0, :1, :1, 0]))
        print(f'  portable f32 device exec: enc {enc_ms:.1f} + dec '
              f'{dec_ms:.1f} = {enc_ms + dec_ms:.1f} ms', flush=True)
        return {'enc_exec_ms': round(enc_ms, 2),
                'dec_exec_ms': round(dec_ms, 2),
                'encdec_exec_ms': round(enc_ms + dec_ms, 2),
                'stream_words': int(pk.size * 2)}

    if 'T' in args.phases:
        print('--- phase T: chained-iter portable device exec ---',
              flush=True)
        _run('exec', phase_t)

    # ---------------------------------------------------------- phase L
    def phase_l():
        """e2e latency, bench.py methodology (device-resident input, timed
        until stream bytes on host / image resident on device + sync)."""
        im_dev = jnp.asarray(load_photo(np, PHOTOS[0]))
        np.asarray(im_dev[0, :1, :1, 0])
        lmb_f32 = struct.unpack('f', struct.pack('f', 512.0))[0]
        body = model.compress(im_dev, lmb=512.0)
        model.decompress(body)
        enc_t, dec_t = [], []
        for _ in range(9):
            t0 = time.perf_counter()
            body = model.compress(im_dev, lmb=512.0)
            t1 = time.perf_counter()
            _, nH, nW = struct.unpack('3H', body[4:10])
            img_dev = model.decompress_to_device(lmb_f32, 1, nH, nW,
                                                 body[10:])
            np.asarray(img_dev[0, :1, :1, 0])
            dec_t.append(time.perf_counter() - t1)
            enc_t.append(t1 - t0)
        r = {'encode_ms': round(med_ms(enc_t), 1),
             'decode_ms': round(med_ms(dec_t), 1),
             'encdec_ms': round(med_ms(enc_t) + med_ms(dec_t), 1),
             'bpp': round(len(body) * 8 / (512 * 768), 4)}
        print(f'  {r}', flush=True)
        return r

    if 'L' in args.phases:
        print('--- phase L: portable e2e latency (bench methodology) ---',
              flush=True)
        _run('e2e', phase_l)

    # ---------------------------------------------------------- phase V
    if 'V' in args.phases:
        print('--- phase V: rate proof (KL vs coded bits) ---', flush=True)
        _run('rate_proof', lambda: run_cli(
            'scripts/prove-rate-correctness.py',
            ['--weights', args.weights, '--images', 'runs/synth-val',
             '--first', '6',
             '--out', f'runs/rate-proof-{args.tag}.json']) or json.loads(
            (ROOT / f'runs/rate-proof-{args.tag}.json').read_text()))

    # ---------------------------------------------------------- phase O
    if 'O' in args.phases:
        print('--- phase O: flush overhead vs host coder ---', flush=True)
        _run('overhead', lambda: run_cli(
            'scripts/measure-rate-overhead.py',
            ['--weights', args.weights, '--images', 'runs/synth-val',
             '--first', '6', '--lmb', '16', '64', '256', '1024'])
            or 'printed to log')

    # ---------------------------------------------------------- phase E
    if 'E' in args.phases:
        print('--- phase E: real-photo eval-var-rate sweep ---', flush=True)
        # distinct dataset dir name so the output is a NEW results file
        pdir = ROOT / 'runs' / f'realphotos-{args.tag}'
        pdir.mkdir(parents=True, exist_ok=True)
        import shutil
        for p in PHOTOS[:3]:
            shutil.copyfile(ROOT / p, pdir / Path(p).name)
        _run('realphoto_sweep', lambda: run_cli(
            'eval-var-rate.py',
            ['-w', args.weights, '-n', f'runs/realphotos-{args.tag}',
             '-s', '6']) or json.loads(
            (ROOT / 'runs' / 'results' /
             f'realphotos-{args.tag}-qarv_base.json').read_text()))

    print('=== suite4 done ===', flush=True)


if __name__ == '__main__':
    main()

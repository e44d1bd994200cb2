"""Round-3 TPU evidence runs, part 13 — batched encode-pack rework.

The batch-6 profile (runs/batch-profile-r3.txt) attributed ~96 ms of the
encode envelope to the pack conditional: B serial rANS encode kernels
(each using 1 of 8 VPU sublanes for its state chain) plus per-image
escape/layout/assembly ops. pack_payload_batch reworks that tail: the B
state chains run sublane-stacked in VMEM-budgeted groups
(ops/pallas/rans_encode.rans_encode_all_multi) and the escape/layout/word
ops become single (B, ...) XLA ops. This suite validates the new binary
on hardware and re-measures batch throughput.

One process (the per-process first-fetch stall is 10-25 min; CLAUDE.md):
  K. kernel microbench: rans_encode_all_multi G=2 vs 2x rans_encode_all
     at the qarv_base 512x768 stream shape (direct kernel-level number).
  A. trained qarv_base batch acceptance + throughput, B in {2,4,6,8},
     f32 AND bf16(backbone-only): selfcheck bit-exact + deterministic,
     enc/dec ms per image.
  B. qres34m B=4 random-init acceptance + qres34m_lossless B=2 exact
     uint8 round-trip (lossless falls back to group=1: its per-image
     VMEM footprint exceeds the pairing budget).
  C. xplane profile of the batch-6 encode (trained, f32): pack-cost
     attribution after the rework.

Usage: nohup python scripts/r3-tpu-suite13.py [phases] > /tmp/r3suite13.log 2>&1 &
       phases default "KABC".
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

# trained operating point: prefer the local f32 export, fall back to the
# committed float16 checkpoint (rate/PSNR-identical; runs/ artifacts have
# been lost twice, the committed file survives any workspace reset)
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


def phase_k(np, jnp):
    import jax
    from lvae_tpu.ops.cdf import build_cdf_table, \
        default_gaussian_scale_table
    from lvae_tpu.ops.pallas import rans_decode as prd
    from lvae_tpu.ops.pallas import rans_encode as pre
    print('--- phase K: multi-image encode kernel microbench ---',
          flush=True)
    table = build_cdf_table(default_gaussian_scale_table())
    cdfs_np, _ = prd.prepare_device_cdf(table)
    cdfs = jnp.asarray(cdfs_np)
    N, T = 128, 4824                 # qarv_base 512x768 stream layout
    rng = __import__('numpy').random.default_rng(0)
    S = len(table.offsets)
    res = {}
    idx = rng.integers(0, S, (2, T, N)).astype('int32')
    val = rng.integers(0, 8, (2, T, N)).astype('int32')
    row_n = __import__('numpy').full(T, N, 'int32')
    inband, _ = pre.prepare_inband(jnp.asarray(val), jnp.asarray(idx),
                                   table.offsets, table.cdf_lengths)
    syms2, idx2 = jnp.asarray(inband), jnp.asarray(idx)

    # single kernel x2
    b0, n0, s0 = pre.rans_encode_all(syms2[0], idx2[0], row_n, cdfs)
    b1, n1, s1 = pre.rans_encode_all(syms2[1], idx2[1], row_n, cdfs)
    jax.block_until_ready(b1)
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        b0, n0, s0 = pre.rans_encode_all(syms2[0], idx2[0], row_n, cdfs)
        b1, n1, s1 = pre.rans_encode_all(syms2[1], idx2[1], row_n, cdfs)
        float(jnp.sum(n0 + n1))     # tiny sync
        ts.append(time.perf_counter() - t0)
    res['single_x2_ms'] = round(med_ms(ts), 2)

    wb, nb, sb = pre.rans_encode_all_multi(syms2, idx2, row_n, cdfs)
    jax.block_until_ready(wb)
    tm = []
    for _ in range(9):
        t0 = time.perf_counter()
        wb, nb, sb = pre.rans_encode_all_multi(syms2, idx2, row_n, cdfs)
        float(jnp.sum(nb))
        tm.append(time.perf_counter() - t0)
    res['multi_g2_ms'] = round(med_ms(tm), 2)

    # byte identity on hardware (not just interpret mode)
    n0i, n1i = int(n0), int(n1)
    ok = (bool(jnp.array_equal(wb[0, :n0i], b0[:n0i])) and
          bool(jnp.array_equal(wb[1, :n1i], b1[:n1i])) and
          bool(jnp.array_equal(sb[0], s0.reshape(-1))) and
          bool(jnp.array_equal(sb[1], s1.reshape(-1))) and
          int(nb[0]) == n0i and int(nb[1]) == n1i)
    res['hw_byte_identical'] = ok
    print(f'  kernel microbench: {res}', flush=True)
    assert ok
    return res


def load_trained_qarv(np, jnp):
    import jax
    import lvae_tpu
    model = lvae_tpu.get_model('qarv_base')
    w = next((p for p in WEIGHT_CANDIDATES if (ROOT / p).is_file()), None)
    assert w, f'none of {WEIGHT_CANDIDATES} present — retrain + export first'
    print(f'  weights: {w}', flush=True)
    model.load_weights(str(ROOT / w))
    model.params = jax.device_put(model.params)
    jax.block_until_ready(jax.tree.leaves(model.params)[0])
    return model


def phase_a(np, jnp, model):
    print('--- phase A: trained batch acceptance + throughput (new pack) '
          '---', flush=True)
    ims = make_images(8, 512, 768)
    results = {}
    # headline configs first (B=6 is the per-chip pick; B=8 is a known
    # HBM cliff — suite12 — and each config is a fresh encode compile)
    for mode, cd in (('bf16', 'bfloat16'), ('f32', None)):
        model.compress_mode(coder='fused', esc_cap=8192, compute_dtype=cd)
        # B=8 stays in the sweep as the HBM-cliff probe (ADVICE r3): its
        # exception path below records the failure mode instead of hiding it
        for B in (6, 4, 2, 8):
            sub = jnp.asarray(ims[:B])
            np.asarray(sub[0, :1, :1, 0])
            lmbs = [512.0] * B
            lmb_f32 = struct.unpack('f', struct.pack('f', 512.0))[0]
            key = f'B{B}_{mode}'
            try:
                t0 = time.time()
                bodies = model.compress_batch(sub, lmb=lmbs)
                print(f'  {key}: first encode (compile) '
                      f'{time.time() - t0:.0f}s', flush=True)
                det = model.compress_batch(sub, lmb=lmbs) == bodies
                _, recon = model._fused.encode_check_batch(
                    model.params, sub,
                    jnp.asarray([lmb_f32] * B, jnp.float32))
                dec = np.asarray(model.decompress_batch(bodies))
                bit_exact = bool(np.array_equal(
                    dec, np.asarray(recon, np.float32)))
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
                results[key] = {
                    'bit_exact': bit_exact, 'deterministic': bool(det),
                    'encode_ms_total': round(med_ms(enc_t), 2),
                    'decode_ms_total': round(med_ms(dec_t), 2),
                    'encdec_ms_per_image': round(
                        (med_ms(enc_t) + med_ms(dec_t)) / B, 2),
                    'bpp': round(bpp, 4)}
                assert bit_exact and det
            except AssertionError:
                raise
            except Exception as e:                      # e.g. B=8 OOM
                results[key] = {'error': f'{type(e).__name__}: {e}'[:300]}
            print(f'  {key}: {results[key]}', flush=True)
    out = ROOT / 'runs' / 'batch-throughput-r3.json'
    prev = json.loads(out.read_text()) if out.is_file() else {}
    # merge, don't replace: earlier packv2 entries (e.g. prior B=8 cliff
    # records) must stay visible across reruns (ADVICE r3)
    prev.setdefault('packv2', {}).update(results)
    out.write_text(json.dumps(prev, indent=2))
    return results


def phase_b(np, jnp):
    import jax
    import lvae_tpu
    print('--- phase B: qres34m + lossless batch acceptance (new pack) '
          '---', flush=True)
    res = {}
    m = lvae_tpu.get_model('qres34m', lmb=1024)
    m.params = jax.device_put(m.params)
    jax.block_until_ready(jax.tree.leaves(m.params)[0])
    ims = make_images(4, 512, 768, seed=5)
    m.compress_mode(coder='fused', esc_cap=1 << 17)
    sub = jnp.asarray(ims)
    np.asarray(sub[0, :1, :1, 0])
    t0 = time.time()
    objs = m.compress_batch(sub)
    print(f'  qres34m first encode (compile) {time.time() - t0:.0f}s',
          flush=True)
    _, recon = m._fused.encode_check_batch(m.params, sub)
    dec = np.asarray(m.decompress_batch(objs))
    res['qres34m_B4'] = {
        'bit_exact': bool(np.array_equal(dec, np.asarray(recon,
                                                         np.float32))),
        'deterministic': bool(m.compress_batch(sub) == objs)}
    print(f'  qres34m B=4: {res["qres34m_B4"]}', flush=True)
    assert all(res['qres34m_B4'].values())

    m2 = lvae_tpu.get_model('qres34m_lossless')
    m2.params = jax.device_put(m2.params)
    jax.block_until_ready(jax.tree.leaves(m2.params)[0])
    ims2 = make_images(2, 256, 384, seed=7)
    m2.compress_mode(coder='fused', esc_cap=1 << 17)
    sub2 = jnp.asarray(ims2)
    t0 = time.time()
    objs2 = m2.compress_batch(sub2)
    print(f'  lossless first encode (compile) {time.time() - t0:.0f}s',
          flush=True)
    dec2 = np.asarray(m2.decompress_batch(objs2))
    res['lossless_B2'] = {
        'exact_uint8': bool(np.array_equal(
            np.round(dec2 * 255).astype(np.uint8),
            np.round(ims2 * 255).astype(np.uint8)))}
    print(f'  lossless B=2: {res["lossless_B2"]}', flush=True)
    assert res['lossless_B2']['exact_uint8']
    return res


def phase_c(np, jnp, model):
    import jax
    print('--- phase C: batch-6 encode xplane profile (new pack) ---',
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
        logdir = f'/tmp/jaxtrace-batch2-{what}'
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir):
            if what == 'enc':
                bodies = model.compress_batch(sub, lmb=lmbs)
            else:
                img = model.decompress_batch_to_device(bodies)
                np.asarray(img[0, :1, :1, 0])
        texts.append(parse_trace(logdir, f'batch6 {what} f32 packv2'))
    with open(ROOT / 'runs' / 'batch-profile-r3.txt', 'a') as f:
        f.write('\n\n' + '\n\n'.join(texts))
    return True


def main():
    phases = sys.argv[1] if len(sys.argv) > 1 else 'KABC'
    import numpy as np
    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser('~/.cache/lvae_tpu_jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    out = {}
    t00 = time.time()
    print(f'device: {__import__("jax").devices()}', flush=True)
    if 'K' in phases:
        out['kernel'] = phase_k(np, jnp)
    model = None
    if 'A' in phases or 'C' in phases:
        model = load_trained_qarv(np, jnp)
    if 'A' in phases:
        out['batch'] = phase_a(np, jnp, model)
    if 'B' in phases:
        out['qres'] = phase_b(np, jnp)
    if 'C' in phases:
        out['profile'] = phase_c(np, jnp, model)
    (ROOT / 'runs' / 'suite13-r3.json').write_text(json.dumps(out, indent=2))
    print(f'=== suite13 done in {(time.time() - t00) / 60:.1f} min ===',
          flush=True)


if __name__ == '__main__':
    main()

"""Round-5 TPU evidence runs — portable-everywhere acceptance at HEAD.

VERDICT r4 items 2/4/8: portable streams for ALL families (QARV,
QRes-VAE, lossless NLL head) validated on real hardware, trained-weight
real-photo file round-trips, and a committed artifact re-proving the
suite13/14-class checks at HEAD after the round-5 refactor.

One process (the per-process first-fetch stall is 10-25 min; CLAUDE.md).
Phases (argv[1], default 'KQARFP'):
  K. Mosaic compile probes for the NEW QRes portable kernels (small
     shapes, vs interpret-mode parity) — catches dialect rejections
     (f16, block-spec rules) before the expensive full-codec compiles.
  Q. qres_tiny portable full-codec round-trip on hardware (random init):
     bit-exact vs encode_check + fresh-codec-object decode.
  A. qarv_base TRAINED portable acceptance on the committed REAL PHOTOS
     (images/photo{1,2,3}_512x768.png, hopper_576x512.png): bit-exact,
     deterministic, bpp/PSNR recorded; host-coder bpp comparison on one.
  R. qres34m + qres34m_lossless portable at 512x768 (random init):
     round-trip bit-exact; lossless = exact uint8 pixels.
  F. write .bits FILES (compress_file, portable by default) for the
     fresh-process decode test (scripts/r5-tpu-decode-files.py) +
     recon digests into runs/r5-files/manifest.json.
  P. xplane attribution of the portable qarv_base codec (enc + dec)
     -> runs/fused-attrib-r5.txt + per-class summary (VERDICT item 6).

Usage: nohup python scripts/r5-tpu-suite.py [phases] > /tmp/r5-suite.log 2>&1 &
"""
import hashlib
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
PHOTOS = ('images/photo1_512x768.png', 'images/photo2_512x768.png',
          'images/photo3_512x768.png', 'images/hopper_576x512.png')


def med_ms(v):
    return float(sorted(v)[len(v) // 2] * 1e3)


def sha(a):
    import numpy as np
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()[:16]


def load_photo(path):
    import numpy as np
    from PIL import Image
    im = np.asarray(Image.open(ROOT / path).convert('RGB'), np.float32)
    return (im / 255.0)[None]


# ---------------------------------------------------------------- phase K
def phase_k(np, jnp):
    print('--- phase K: Mosaic compile probes (new QRes kernels) ---',
          flush=True)
    import flax.linen as nn
    import jax
    from lvae_tpu.ops.pallas import trunk as ptk
    from lvae_tpu.models import common
    rng = np.random.default_rng(0)
    res = {}

    def check(name, fn):
        t0 = time.time()
        got = jax.device_get(fn(False))
        want = jax.device_get(fn(True))
        err = max(float(abs(np.asarray(g, np.float64)
                            - np.asarray(w, np.float64)).max())
                  for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)))
        res[name] = {'max_abs_err_vs_interpret': err,
                     'compile_s': round(time.time() - t0, 1)}
        print(f'  {name}: max|err| {err:.2e} ({time.time() - t0:.0f}s)',
              flush=True)
        assert err < 1e-4, (name, err)

    B, H, W, C, K = 2, 16, 24, 32, 7
    blk = common.MyConvNeXtBlock(C, kernel_size=K)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)['params']
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.1, a.shape), a.dtype), params)
    check('convnext_plain_k7',
          lambda it: ptk.convnext_plain(x, params, K, interpret=it))

    conv = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)])
    xc = jnp.asarray(rng.normal(0, 1, (B, H, W, 8)).astype(np.float32))
    cp = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.2, a.shape), a.dtype),
        conv.init(jax.random.PRNGKey(1), xc)['params'])
    check('conv_3x3_taps',
          lambda it: ptk.conv_kxk_act(xc, cp['kernel'], cp['bias'],
                                      act=True, interpret=it))

    from lvae_tpu.models.qresvae.model import QLatentBlock
    lb = QLatentBlock(C, 4, kernel_size=3)
    ex = jnp.asarray(rng.normal(0, 0.5, (B, H, W, C)).astype(np.float32))
    lp = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.1, a.shape), a.dtype),
        lb.init(jax.random.PRNGKey(2), x, ex)['params'])
    table = jnp.asarray(lb.coding_scale_table(), jnp.float32)
    check('qres_prior_head',
          lambda it: ptk.qres_prior_head(x, lp['prior'], True, table,
                                         interpret=it))
    syms = jnp.asarray(rng.integers(-5, 6, (B, H, W, 4)).astype(np.int32))
    pm = jnp.asarray(rng.normal(0, 1, (B, H, W, 4)).astype(np.float32))
    check('qres_fuse',
          lambda it: ptk.qres_fuse(x, syms, pm, lp, 3, interpret=it))

    from lvae_tpu.ops import cdf as cdf_ops
    htb = jnp.asarray(cdf_ops.lossless_head_scale_table(), jnp.float32)
    m = jnp.asarray(rng.normal(0, 0.5, (1, 16, 24, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(0, 0.5, (1, 16, 24, 3)).astype(np.float32))
    check('nll_head',
          lambda it: ptk.nll_head(m, r, htb, 1 / 127.5, interpret=it))
    sx = jnp.asarray(rng.integers(-200, 200, (1, 16, 24, 3))
                     .astype(np.int32))
    check('nll_recon',
          lambda it: ptk.nll_recon(sx, m * 100, 1 / 127.5, interpret=it))
    return res


# ---------------------------------------------------------------- phase Q
def phase_q(np, jnp):
    print('--- phase Q: qres_tiny portable round-trip on hardware ---',
          flush=True)
    import lvae_tpu
    res = {}
    for name in ('qres_tiny', 'qres_tiny_lossless'):
        m = lvae_tpu.get_model(name)
        m.compress_mode(coder='fused', portable=True)
        from scipy.ndimage import gaussian_filter
        rng = np.random.default_rng(7)
        im = gaussian_filter(rng.uniform(0, 1, (128, 128, 3)),
                             sigma=(3, 3, 0))
        im = (im - im.min()) / (im.max() - im.min() + 1e-9)
        im = (np.round(im * 255) / 255).astype(np.float32)[None]
        t0 = time.time()
        obj = m.compress(jnp.asarray(im))
        _, recon = m._fused.encode_check(m.params, jnp.asarray(im))
        dec = m.decompress(obj)
        if recon.dtype == np.uint8:
            ok = bool(np.array_equal(np.round(dec * 255).astype(np.uint8),
                                     np.asarray(recon)))
            exact = bool(np.array_equal(
                np.round(dec * 255).astype(np.uint8),
                np.round(im * 255).astype(np.uint8)))
        else:
            ok = bool(np.array_equal(dec, np.asarray(recon, np.float32)))
            exact = None
        m._fused_codecs.clear()
        m._fused = m._get_fused(m.num_lanes)
        dec2 = m.decompress(obj)
        fresh_ok = bool(np.array_equal(dec2, dec))
        res[name] = {'bit_exact': ok, 'fresh_codec_bit_exact': fresh_ok,
                     'lossless_exact': exact,
                     'compile_plus_first_s': round(time.time() - t0, 1)}
        print(f'  {name}: {res[name]}', flush=True)
        assert ok and fresh_ok and exact is not False
    return res


# ---------------------------------------------------------------- phase A
def load_trained_qarv(np):
    import jax
    import lvae_tpu
    model = lvae_tpu.get_model('qarv_base')
    w = next((p for p in WEIGHT_CANDIDATES if (ROOT / p).is_file()), None)
    assert w, f'none of {WEIGHT_CANDIDATES} present'
    print(f'  weights: {w}', flush=True)
    model.load_weights(str(ROOT / w))
    jax.block_until_ready(jax.tree.leaves(model.params)[0])
    return model


def phase_a(np, jnp, model):
    print('--- phase A: trained qarv_base portable on REAL PHOTOS ---',
          flush=True)
    model.compress_mode(coder='fused', esc_cap=8192, word_cap=1 << 17,
                        portable=True)
    res = {}
    for pi, path in enumerate(PHOTOS):
        im = load_photo(path)
        im_dev = jnp.asarray(im)
        np.asarray(im_dev[0, :1, :1, 0])
        lmb = 512.0
        lmb_f32 = struct.unpack('f', struct.pack('f', lmb))[0]
        t0 = time.time()
        body = model.compress(im_dev, lmb=lmb)
        det = model.compress(im_dev, lmb=lmb) == body
        _, recon = model._fused.encode_check(
            model.params, im_dev, jnp.full((1,), lmb_f32, jnp.float32))
        dec = np.asarray(model.decompress(body))
        bit_exact = bool(np.array_equal(dec, np.asarray(recon, np.float32)))
        H, W = im.shape[1], im.shape[2]
        mse = float(np.mean((dec - im) ** 2))
        entry = {'bit_exact': bit_exact, 'deterministic': bool(det),
                 'bpp': round(len(body) * 8 / (H * W), 4),
                 'psnr': round(-10 * float(np.log10(mse + 1e-12)), 2),
                 'first_roundtrip_s': round(time.time() - t0, 1),
                 'recon_sha': sha(dec)}
        if pi == 0:   # host-coder rate comparison on one photo
            model.compress_mode(coder='host')
            host = model.compress(im, lmb=lmb)
            entry['host_bpp'] = round(len(host) * 8 / (H * W), 4)
            model.compress_mode(coder='fused', esc_cap=8192,
                                word_cap=1 << 17, portable=True)
        res[path] = entry
        print(f'  {path}: {entry}', flush=True)
        assert bit_exact and det
    return res


# ---------------------------------------------------------------- phase R
def phase_r(np, jnp):
    print('--- phase R: qres34m (+lossless) portable 512x768 ---',
          flush=True)
    import lvae_tpu
    res = {}
    im = load_photo(PHOTOS[0])
    for name in ('qres34m', 'qres34m_lossless'):
        m = lvae_tpu.get_model(name)
        import jax
        m.params = jax.device_put(m.params)
        jax.block_until_ready(jax.tree.leaves(m.params)[0])
        m.compress_mode(coder='fused', esc_cap=1 << 18, portable=True)
        im_dev = jnp.asarray(im)
        np.asarray(im_dev[0, :1, :1, 0])
        t0 = time.time()
        obj = m.compress(im_dev)
        print(f'  {name} first encode {time.time() - t0:.0f}s', flush=True)
        _, recon = m._fused.encode_check(m.params, im_dev)
        t0 = time.time()
        dec = m.decompress(obj)
        print(f'  {name} first decode {time.time() - t0:.0f}s', flush=True)
        if np.asarray(recon).dtype == np.uint8:
            ok = bool(np.array_equal(np.round(dec * 255).astype(np.uint8),
                                     np.asarray(recon)))
            exact = bool(np.array_equal(
                np.round(dec * 255).astype(np.uint8),
                np.round(im * 255).astype(np.uint8)))
        else:
            ok = bool(np.array_equal(dec, np.asarray(recon, np.float32)))
            exact = None
        # enc/dec latency (chained medians, modest iters — random-init
        # streams are pathological; latency context only)
        enc_t, dec_t = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            obj = m.compress(im_dev)
            t1 = time.perf_counter()
            if name == 'qres34m':
                _, fH, fW, _ = obj[-1]
                img_dev = m.decompress_to_device(obj[0], fH, fW)
                np.asarray(img_dev[0, :1, :1, 0])
            else:
                _ = m.decompress(obj)
            enc_t.append(t1 - t0)
            dec_t.append(time.perf_counter() - t1)
        body = obj[0]
        res[name] = {
            'bit_exact': ok, 'lossless_exact': exact,
            'encode_ms': round(med_ms(enc_t), 1),
            'decode_ms': round(med_ms(dec_t), 1),
            'bpp': round(len(body) * 8 / (512 * 768), 4)}
        print(f'  {name}: {res[name]}', flush=True)
        assert ok and exact is not False
    return res


# ---------------------------------------------------------------- phase F
def phase_f(np, jnp, model):
    print('--- phase F: write portable .bits files for the fresh-process '
          'decode test ---', flush=True)
    import lvae_tpu
    fdir = ROOT / 'runs' / 'r5-files'
    fdir.mkdir(parents=True, exist_ok=True)
    manifest = {}
    model.compress_mode(coder='fused', esc_cap=8192, word_cap=1 << 17,
                        portable=True)
    for path in PHOTOS[:2]:
        out = fdir / (Path(path).stem + '.qarv.bits')
        model.compress_file(str(ROOT / path), str(out), lmb=512.0)
        dec = model.decompress_file(str(out))
        manifest[out.name] = {'model': 'qarv_base', 'src': path,
                              'weights': 'trained-synth6k',
                              'recon_sha': sha(dec),
                              'bytes': out.stat().st_size}
        print(f'  {out.name}: {manifest[out.name]}', flush=True)
    for name in ('qres_tiny', 'qres_tiny_lossless'):
        m = lvae_tpu.get_model(name)
        m.compress_mode(coder='fused')
        out = fdir / f'collie64.{name}.bits'
        m.compress_file(str(ROOT / 'images' / 'collie64.png'), str(out))
        dec = m.decompress_file(str(out))
        manifest[out.name] = {'model': name, 'src': 'images/collie64.png',
                              'weights': 'seed0-init',
                              'recon_sha': sha(dec),
                              'bytes': out.stat().st_size}
        print(f'  {out.name}: {manifest[out.name]}', flush=True)
    (fdir / 'manifest.json').write_text(json.dumps(manifest, indent=2))
    return manifest


# ---------------------------------------------------------------- phase P
def phase_p(np, jnp, model):
    print('--- phase P: portable codec xplane attribution ---', flush=True)
    import jax
    from lvae_tpu.utils.profiling import op_class_breakdown
    model.compress_mode(coder='fused', esc_cap=8192, word_cap=1 << 17,
                        portable=True)
    im = load_photo(PHOTOS[0])
    im_dev = jnp.asarray(im)
    np.asarray(im_dev[0, :1, :1, 0])
    lmb_f32 = struct.unpack('f', struct.pack('f', 512.0))[0]
    body = model.compress(im_dev, lmb=512.0)
    _, nH, nW = struct.unpack('3H', body[4:10])
    img = model.decompress_to_device(lmb_f32, 1, nH, nW, body[10:])
    np.asarray(img[0, :1, :1, 0])
    out = {}
    fh = open(ROOT / 'runs' / 'fused-attrib-r5.txt', 'a')
    for what in ('enc', 'dec'):
        logdir = f'/tmp/jaxtrace-r5-portable-{what}'
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir):
            if what == 'enc':
                body = model.compress(im_dev, lmb=512.0)
            else:
                img = model.decompress_to_device(
                    lmb_f32, 1, nH, nW, body[10:])
                np.asarray(img[0, :1, :1, 0])
        d = op_class_breakdown(logdir)
        out[f'portable_{what}'] = d
        fh.write(f'== r5 portable {what} f32 word_cap=128k trained ==\n')
        if d:
            for k, v in d.items():
                if k != 'top_ops':
                    fh.write(f'  {k}: {v}\n')
            fh.write('top 30 ops:\n')
            for ms, n, nm in d['top_ops']:
                fh.write(f'  {ms:8.2f} ms x{n:<4d} {nm}\n')
        fh.write('\n')
        fh.flush()
        print(f'  {what}: ' + json.dumps(
            {k: v for k, v in (d or {}).items() if k != 'top_ops'}),
            flush=True)
    fh.close()
    return out


def main():
    phases = sys.argv[1] if len(sys.argv) > 1 else 'KQARFP'
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lvae_tpu.utils.general import enable_compile_cache
    enable_compile_cache()
    out = {'phases': phases}
    t00 = time.time()
    print(f'device: {jax.devices()}', flush=True)
    # prepay the first-fetch stall up front (everything below measures)
    t0 = time.time()
    np.asarray(jnp.zeros((8,)))
    print(f'first fetch: {time.time() - t0:.0f}s', flush=True)
    model = None

    def _run(tag, fn, *a):
        """One phase; a failure is recorded honestly and later phases
        still run (each phase is independent evidence)."""
        try:
            out[tag] = fn(*a)
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            out[tag] = {'FAILED': f'{type(e).__name__}: {e}'}
        (ROOT / 'runs' / 'suite-r5.json').write_text(
            json.dumps(out, indent=2, default=str))

    if 'K' in phases:
        _run('kernels', phase_k, np, jnp)
    if 'Q' in phases:
        _run('qres_tiny', phase_q, np, jnp)
    if set('AFP') & set(phases):
        model = load_trained_qarv(np)
    if 'A' in phases:
        _run('real_photos', phase_a, np, jnp, model)
    if 'R' in phases:
        _run('qres34m', phase_r, np, jnp)
    if 'F' in phases:
        _run('files', phase_f, np, jnp, model)
    if 'P' in phases:
        _run('attrib', phase_p, np, jnp, model)
    print(f'=== r5 suite done in {(time.time() - t00) / 60:.1f} min ===',
          flush=True)


if __name__ == '__main__':
    main()

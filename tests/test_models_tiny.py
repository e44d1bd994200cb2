"""End-to-end tests on tiny models: forward, coding round-trips, sampling.

These mirror the reference's oracles (SURVEY.md §4): real-bitstream
round-trips, bit-exact lossless reconstruction, and forward/coding
consistency.
"""
import os
import numpy as np
import pytest

import lvae_tpu
from lvae_tpu.utils import coding


@pytest.fixture(scope='module')
def image(rng_np=None):
    rng = np.random.default_rng(7)
    # smooth-ish random image so rates are moderate
    from scipy.ndimage import gaussian_filter
    im = gaussian_filter(rng.uniform(0, 1, (128, 128, 3)), sigma=(3, 3, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    im = np.round(im * 255) / 255  # pixel grid like a real PNG
    return im.astype(np.float32)[None]


@pytest.fixture(scope='module')
def qres_model():
    return lvae_tpu.get_model('qres_tiny', lmb=128)


def test_qres_forward_stats(qres_model, image):
    stats = qres_model.forward(image)
    for k in ['loss', 'kl', 'mse', 'bppix', 'psnr']:
        assert k in stats and np.isfinite(stats[k])


def test_qres_roundtrip_and_determinism(qres_model, image):
    m = qres_model
    m.compress_mode()
    obj = m.compress(image)
    obj2 = m.compress(image)
    for sa, sb in zip(obj[:-1], obj2[:-1]):
        assert sa == sb
    im_hat = m.decompress(obj)
    assert im_hat.shape == image.shape
    # decompressed reconstruction must match the eval-forward reconstruction
    stats = m.forward(image)
    mse = float(np.mean((im_hat - image) ** 2))
    psnr = -10 * np.log10(mse)
    assert abs(psnr - stats['psnr']) < 0.2


def test_qres_file_roundtrip(tmp_path, qres_model, image):
    from PIL import Image
    m = qres_model
    m.compress_mode()
    # non-multiple-of-64 image exercises padding + crop-back
    arr = (image[0, :100, :90] * 255).astype(np.uint8)
    img_path = tmp_path / 'in.png'
    Image.fromarray(arr).save(img_path)
    bits_path = tmp_path / 'out.bits'
    m.compress_file(img_path, bits_path)
    assert bits_path.stat().st_size > 0
    im_hat = m.decompress_file(bits_path)
    assert im_hat.shape == (1, 100, 90, 3)


def test_qres_uncond_and_cond_sampling(qres_model):
    m = qres_model
    ims = m.uncond_sample((2, 1, 1), temprature=0.8)
    assert ims.shape == (2, 64, 64, 3)
    assert (ims >= 0).all() and (ims <= 1).all()
    # cond_sample from extracted latents reproduces the eval forward
    rng = np.random.default_rng(3)
    im = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    stats_all = m.forward_get_latents(im)
    latents = [st['z'] for st in stats_all]
    rec = m.cond_sample(latents)
    assert rec.shape == im.shape


def test_qres_inpaint(qres_model):
    rng = np.random.default_rng(4)
    im = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = qres_model.inpaint(im, paint_box=(0.25, 0.25, 0.75, 0.75), steps=2)
    assert out.shape == im.shape


def test_lossless_bit_exact_roundtrip(image):
    """The reference's strongest oracle: lossless compression must
    reconstruct the input bit-exactly
    (reference: scripts/qresvae/evaluate-lossless.py:28-31)."""
    m = lvae_tpu.get_model('qres_tiny_lossless')
    m.compress_mode()
    obj = m.compress(image)
    im_hat = m.decompress(obj)
    real = np.round(image * 255).astype(np.int32)
    fake = np.round(np.asarray(im_hat) * 255).astype(np.int32)
    assert np.array_equal(real, fake), \
        f'lossless mismatch: {np.abs(real - fake).max()}'


@pytest.fixture(scope='module')
def qarv_model():
    return lvae_tpu.get_model('qarv_tiny')


def test_qarv_forward_multiple_lambdas(qarv_model, image):
    s_low = qarv_model.forward(image, lmb=16)
    s_high = qarv_model.forward(image, lmb=2048)
    assert np.isfinite(s_low['loss']) and np.isfinite(s_high['loss'])


def test_qarv_bitstream_roundtrip(qarv_model, image):
    m = qarv_model
    m.compress_mode()
    for lmb in [16.0, 300.0, 2048.0]:
        s = m.compress(image, lmb=lmb)
        assert isinstance(s, bytes)
        im_hat = m.decompress(s)
        assert im_hat.shape == image.shape
    # determinism at a fixed lambda
    assert m.compress(image, lmb=300.0) == m.compress(image, lmb=300.0)


def test_qarv_bitstream_header_layout(qarv_model, image):
    """Reference-compatible stream container (coder='host'): struct headers
    + pack_byte_strings body (reference: qarv/model.py:516-570)."""
    import struct
    m = qarv_model
    m.compress_mode(coder='host')
    s = m.compress(image, lmb=333.0)
    lmb = struct.unpack('f', s[:4])[0]
    nB, nH, nW = struct.unpack('3H', s[4:10])
    assert abs(lmb - 333.0) < 1e-4
    assert (nB, nH, nW) == (1, 2, 2)  # 128/64
    strings = coding.unpack_byte_string(s[10:])
    assert len(strings) == m.num_latents


def test_qarv_file_roundtrip(tmp_path, qarv_model, image):
    from PIL import Image
    m = qarv_model
    m.compress_mode()
    arr = (image[0, :100, :90] * 255).astype(np.uint8)
    img_path = tmp_path / 'in.png'
    Image.fromarray(arr).save(img_path)
    bits = tmp_path / 'out.bits'
    m.compress_file(img_path, bits, lmb=512)
    im_hat = m.decompress_file(bits)
    assert im_hat.shape == (1, 100, 90, 3)


def test_qarv_self_evaluate(tmp_path, qarv_model, image):
    from PIL import Image
    d = tmp_path / 'imgs'
    d.mkdir()
    Image.fromarray((image[0] * 255).astype(np.uint8)).save(d / 'a.png')
    res = qarv_model.self_evaluate(d, steps=2, log_dir=tmp_path)
    assert len(res['bpp']) == 2 and len(res['psnr']) == 2
    assert (tmp_path / 'all_lmb_channel_stats.txt').is_file()


def test_qarv_sampling(qarv_model):
    ims = qarv_model.unconditional_sample(512, bhw_repeat=(1, 1, 1))
    assert ims.shape == (1, 64, 64, 3)


def test_rd_forward_and_sampling(image):
    m = lvae_tpu.get_model('rd_tiny')
    stats = m.forward(image, lmb=64)
    for k in ['loss', 'bppix', 'psnr']:
        assert np.isfinite(stats[k])
    ims = m.unconditional_sample(64, bhw_repeat=(1, 1, 1))
    assert ims.shape == (1, 64, 64, 3)


def test_registry_lists_reference_models():
    from lvae_tpu.registry import list_models
    names = list_models()
    for required in ['qres34m', 'qres34m_lossless', 'qres17m', 'qarv_base',
                     'rd_model_base', 'rd_ablation_c64_l5',
                     'rd_ablation_base_nosmooth']:
        assert required in names, f'missing registered model {required}'


def test_qarv_device_coder_roundtrip(qarv_model, image):
    """On-device (Pallas) entropy decode must reproduce the host-coder
    reconstruction bit-for-bit (same symbols, same fuse executables)."""
    m = qarv_model
    m.compress_mode(coder='host')
    bits_host = m.compress(image, lmb=300.0)
    rec_host = m.decompress(bits_host)
    m.compress_mode(coder='device')
    bits_dev = m.compress(image, lmb=300.0)
    rec_dev = m.decompress(bits_dev)
    assert np.array_equal(rec_host, rec_dev), \
        f'device-coder mismatch: {np.abs(rec_host - rec_dev).max()}'
    # device stream should be close in size (N*4B state overhead)
    assert abs(len(bits_dev) - len(bits_host)) < 128 * 4 + 256
    m.compress_mode(coder='host')  # restore for other tests


def test_qres_device_coder_roundtrip(qres_model, image):
    """QRes device entropy decode must match the host-coder reconstruction."""
    m = qres_model
    m.compress_mode(coder='host')
    obj_host = m.compress(image)
    rec_host = m.decompress(obj_host)
    m.compress_mode(coder='device')
    obj_dev = m.compress(image)
    assert len(obj_dev) == 2  # [payload, smallest_shape]
    rec_dev = m.decompress(obj_dev)
    assert np.array_equal(rec_host, rec_dev)
    m.compress_mode(coder='host')


def test_qres_batched_compress_roundtrip(qres_model):
    """Batch-of-2 coding path (per-image strings inside the container)."""
    rng = np.random.default_rng(11)
    from scipy.ndimage import gaussian_filter
    ims = []
    for i in range(2):
        im = gaussian_filter(rng.uniform(0, 1, (64, 64, 3)), sigma=(2, 2, 0))
        im = (im - im.min()) / (im.max() - im.min() + 1e-9)
        ims.append(im.astype(np.float32))
    batch = np.stack(ims)
    m = qres_model
    m.compress_mode(coder='host')
    obj = m.compress(batch)
    rec = m.decompress(obj)
    assert rec.shape == batch.shape
    # batch items must round-trip independently: single-image compress of
    # item 0 decodes to the same reconstruction
    obj0 = m.compress(batch[:1])
    rec0 = m.decompress(obj0)
    assert np.array_equal(rec0[0], rec[0])


def test_sampling_determinism(qres_model, qarv_model):
    a = qres_model.uncond_sample((1, 1, 1), seed=5)
    b = qres_model.uncond_sample((1, 1, 1), seed=5)
    c = qres_model.uncond_sample((1, 1, 1), seed=6)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    qa = qarv_model.unconditional_sample(256, bhw_repeat=(1, 1, 1), seed=3)
    qb = qarv_model.unconditional_sample(256, bhw_repeat=(1, 1, 1), seed=3)
    assert np.array_equal(qa, qb)


def test_rd_self_evaluate(tmp_path, image):
    from PIL import Image
    d = tmp_path / 'rdimgs'
    d.mkdir()
    Image.fromarray((image[0] * 255).astype(np.uint8)).save(d / 'a.png')
    m = lvae_tpu.get_model('rd_tiny')
    res = m.self_evaluate(d, steps=2)
    assert len(res['bpp']) == 2
    assert all(np.isfinite(v) for v in res['psnr'])


def test_patch_escapes_boundary_positions():
    """Regression: escapes at block-local positions 0 and n-1 must survive
    the padding (-1) and out-of-block entries that share the scatter
    (ADVICE r1: clipped invalid writes used to collide with valid ones)."""
    import jax.numpy as jnp
    from lvae_tpu.models.qarv.model import _patch_escapes
    n = 6
    z = jnp.arange(100, 100 + n, dtype=jnp.int32).reshape(2, 3)
    start = 10
    # valid escapes at local 0 and n-1; plus padding (-1), an out-of-block
    # position below the window, and one above it
    esc_pos = jnp.asarray([10, 15, -1, 9, 16], jnp.int32)
    esc_val = jnp.asarray([777, 888, 5, 6, 7], jnp.int32)
    out = np.asarray(_patch_escapes(z, esc_pos, esc_val, jnp.int32(start)))
    expect = np.asarray(z).reshape(-1).copy()
    expect[0] = 777
    expect[n - 1] = 888
    assert (out.reshape(-1) == expect).all(), (out, expect)


def _inflate_posteriors(params, factor):
    def rec(p, path=()):
        if isinstance(p, dict):
            return {k: rec(v, path + (k,)) for k, v in p.items()}
        if 'posterior' in '/'.join(path) and path[-1] == 'kernel':
            return p * factor
        return p
    return rec(params)


def test_qarv_fused_coder_bitexact_vs_host(image):
    """The fused single-program codec must reproduce the host coder's
    reconstruction bit-exactly (escapes included)."""
    import lvae_tpu
    m = lvae_tpu.get_model('qarv_tiny')
    m.params = _inflate_posteriors(m.params, 60.0)  # force escape symbols
    m.compress_mode(coder='host')
    obj_h = m.compress(image, lmb=1024)
    rec_h = m.decompress(obj_h)
    m.compress_mode(coder='fused')
    obj_f = m.compress(image, lmb=1024)
    rec_f = m.decompress(obj_f)
    assert obj_f == m.compress(image, lmb=1024)  # deterministic
    assert (rec_h == rec_f).all()
    import struct
    n_words, n_esc, lanes = struct.unpack('<IIH', obj_f[10:20])
    assert lanes == 128 and n_words > 0


def test_qres_fused_coder_bitexact_vs_host(qres_model, image):
    m = qres_model
    m.compress_mode(coder='host')
    rec_h = m.decompress(m.compress(image))
    m.compress_mode(coder='fused')
    obj = m.compress(image)
    rec_f = m.decompress(obj)
    assert (rec_h == rec_f).all()
    # container mirrors the reference layout: [payload, smallest_shape]
    assert isinstance(obj[0], bytes) and len(obj[-1]) == 4


def test_qarv_fused_selfcheck_invariant(image):
    """Decode must reproduce the encode program's own reconstruction bitwise
    (the fused-codec invariant; validated on TPU by tpu-validate-codec.py)."""
    import jax.numpy as jnp
    import lvae_tpu
    m = lvae_tpu.get_model('qarv_tiny')
    m.compress_mode(coder='fused')
    lmb_arr = jnp.full((1,), 512.0, jnp.float32)
    body, img_enc = m._fused.encode_check(m.params, jnp.asarray(image), lmb_arr)
    nH, nW = image.shape[1] // 64, image.shape[2] // 64
    img_dec = np.asarray(m._fused.decode_to_device(
        m.params, body, nH, nW, lmb_arr))
    assert (img_dec == img_enc).all()


def test_qarv_fused_bf16_selfconsistent(image):
    """bf16 inference/coding mode: the decode program must still reproduce
    the encode program's reconstruction bitwise (prior/index math stays f32
    inside entropy_coding; conv stacks run bf16). Rate differs from the f32
    host path by design — bit-exactness is WITHIN the bf16 stream."""
    import jax.numpy as jnp
    import lvae_tpu
    m = lvae_tpu.get_model('qarv_tiny')
    m.compress_mode(coder='fused', compute_dtype='bfloat16')
    obj = m.compress(image, lmb=512)
    assert obj == m.compress(image, lmb=512)      # deterministic stream
    rec = m.decompress(obj)
    lmb_arr = jnp.full((1,), 512.0, jnp.float32)
    _, img_enc = m._fused.encode_check(m.params, jnp.asarray(image), lmb_arr)
    assert (rec == img_enc.astype(np.float32)).all()


def test_input_validation_clear_errors(image):
    """Bad inputs raise clear asserts, not opaque XLA reshape errors
    (reference asserts: qarv/model.py:219-220, qresvae/model.py:490-492)."""
    import lvae_tpu
    m = lvae_tpu.get_model('qarv_tiny')
    with pytest.raises(AssertionError, match='divisible'):
        m.forward(np.zeros((1, 100, 140, 3), np.float32))
    with pytest.raises(AssertionError, match=r'\[0, 1\]'):
        m.forward(np.full((1, 128, 128, 3), 2.0, np.float32))
    m.compress_mode(coder='host')
    with pytest.raises(AssertionError, match='divisible'):
        m.compress(np.zeros((1, 100, 140, 3), np.float32), lmb=512)


def test_fused_lossless_roundtrip_and_rate():
    """The fused (single-program, on-device rANS) coder handles the
    GaussianNLL pixel head: exact u8 round-trip, rate within the known
    lane-flush overhead of the host coder (VERDICT r2 item 5)."""
    import numpy as np
    from scipy.ndimage import gaussian_filter
    import lvae_tpu
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (128, 128, 3)).astype(np.float32)
    img = gaussian_filter(img, (3, 3, 0)).clip(0, 255)
    img = np.round(img).astype(np.uint8)
    im = img.astype(np.float32)[None] / 255.0

    m = lvae_tpu.get_model('qres_tiny_lossless')
    m.compress_mode(coder='host')
    obj_h = m.compress(im)
    u8_h = np.round(m.decompress(obj_h) * 255).astype(np.uint8)[0]
    assert np.array_equal(u8_h, img), 'host lossless round-trip broken'
    host_bytes = (sum(len(s) for blk in obj_h[:-2] for s in blk)
                  + sum(len(s) for s in obj_h[-1]))

    m.compress_mode(coder='fused')
    obj_f = m.compress(im)
    u8_f = np.round(m.decompress(obj_f) * 255).astype(np.uint8)[0]
    assert np.array_equal(u8_f, img), 'fused lossless round-trip broken'
    # fused adds only the interleaved-format flush (lane states + header)
    assert len(obj_f[0]) <= host_bytes + 4 * 128 + 64


def test_qarv_auto_lanes_roundtrip():
    """num_lanes='auto' picks the lane count by lambda, carries it in the
    stream header, and decode routes by the header (VERDICT r2 item 3:
    rate-adaptive flush)."""
    import struct
    import numpy as np
    from scipy.ndimage import gaussian_filter
    import lvae_tpu
    rng = np.random.default_rng(3)
    im = gaussian_filter(rng.uniform(0, 1, (128, 192, 3)), (3, 3, 0))
    im = ((im - im.min()) / (im.max() - im.min())).astype(np.float32)[None]
    m = lvae_tpu.get_model('qarv_tiny')
    m.compress_mode(coder='fused', num_lanes='auto')
    for lmb, expect in [(32.0, 16), (2000.0, 128)]:
        bits = m.compress(im, lmb=lmb)
        lanes = struct.unpack('<H', bits[18:20])[0]
        assert lanes == expect, (lmb, lanes, expect)
        rec = m.decompress(bits)
        assert rec.shape == im.shape and np.isfinite(rec).all()


def test_fused_bf16_precision_policy(image):
    """compute_dtype='bfloat16' must be backbone-only. Guards the r3
    hardware finding (runs/tpu-validate-r3.json): reduced precision
    anywhere decode recomputes desyncs the rANS stream; only the encoder
    backbone (which merely picks which symbols are WRITTEN) may run bf16.
    Behavioral check: decoding the SAME f32-encoded stream through a
    bf16-configured codec must give a bitwise-identical image — on CPU,
    any bf16 op on the decode path would visibly change the floats."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import lvae_tpu

    m = lvae_tpu.get_model('qarv_tiny')
    m.compress_mode(coder='fused')            # f32 codec
    obj = m.compress(image, lmb=512)
    rec_f32 = m.decompress(obj)
    m.compress_mode(coder='fused', compute_dtype='bfloat16')
    rec_bf16 = m.decompress(obj)
    assert (rec_f32 == rec_bf16).all(), \
        'decode path must be compute_dtype-independent (backbone-only bf16)'

    # and the backbone genuinely runs bf16 in the unified program
    codec = m._fused
    H, W = image.shape[1], image.shape[2]
    d = codec._dummies(H, W)
    hlo = codec._codec(H, W).lower(
        m.params, jnp.asarray(image), d['enc'], d['off'], d['states'],
        d['packed'], d['esc_pos'], d['esc_val'],
        jnp.full((1,), 512.0, jnp.float32)).as_text()
    assert 'bf16' in hlo, 'encode backbone should run bf16'


def test_fused_unified_executable_properties(image):
    """The codec is ONE executable per image shape (qarv/fused.py):
    encode_check must emit the byte-identical stream to encode (same
    binary, want_image is a runtime flag), and a fresh codec instance that
    DECODES first (never encoded) must reproduce the same image."""
    import jax.numpy as jnp
    import lvae_tpu

    m1 = lvae_tpu.get_model('qarv_tiny')
    m1.compress_mode(coder='fused')
    obj = m1.compress(image, lmb=512)
    rec1 = m1.decompress(obj)

    lmb_arr = jnp.full((1,), 512.0, jnp.float32)
    body_chk, _ = m1._fused.encode_check(m1.params, jnp.asarray(image),
                                         lmb_arr)
    body = m1._fused.encode(m1.params, jnp.asarray(image), lmb_arr)
    assert body_chk == body, \
        'encode_check must run the same executable as encode'

    m2 = lvae_tpu.get_model('qarv_tiny')
    m2.params = m1.params
    m2.compress_mode(coder='fused')
    rec2 = m2.decompress(obj)   # decode-first: codec built via decode path
    assert (rec1 == rec2).all()


def test_fused_decode_single_canonical_executable(image):
    """Streams of different sizes must all run through ONE decode executable
    per image shape, fed by integer-only prep programs. Guards the r3
    hardware finding (runs/fused-divergence-r3.txt): re-specializing the
    decode trunk per stream-size bucket lets f32 low-bit drift between
    compilations flip a scale index and desync the rANS stream
    (fused_base._canon_sizes)."""
    import jax
    import numpy as np
    import lvae_tpu

    m = lvae_tpu.get_model('qarv_tiny')
    m.compress_mode(coder='fused')
    rec_a = m.decompress(m.compress(image, lmb=16))
    rec_b = m.decompress(m.compress(image, lmb=2048))
    # many escapes -> a different escape-buffer bucket -> a different
    # prep program, but the SAME decode executable
    m.params = _inflate_posteriors(m.params, 300.0)
    rec_c = m.decompress(m.compress(image, lmb=1024))
    for r in (rec_a, rec_b, rec_c):
        assert np.isfinite(r).all()

    codec = m._fused
    assert len(codec._codec_cache) == 1, \
        'the codec must compile exactly once per image shape'
    assert len(codec._dec_wrap) >= 1
    # every prep program is pure integer memory movement: no float ops
    N = codec.N
    for (nH, nW, wb, eb), prep in codec._dec_wrap.items():
        blob = np.zeros(N + wb + 2 * eb, np.int32)
        jx = str(jax.make_jaxpr(prep)(blob))
        for fdt in ('f32', 'f64', 'bf16', 'f16'):
            assert fdt not in jx, \
                f'prep program for bucket {(wb, eb)} contains {fdt} ops'

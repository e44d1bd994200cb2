"""QRes-VAE portable trunk (CPU, interpret-mode Pallas) — VERDICT r4
item 2: extend decode-anywhere stream portability to QRes-VAE and the
lossless NLL head.

Kernel parity vs the flax modules, codec self-consistency, actual
cross-executable decode (batch-2 binary <-> B=1 binary AND a fresh model
instance = fresh jit closures), lossless exactness, and the
compress_file portable-by-default contract.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lvae_tpu
from lvae_tpu.models import common


def _img(hw=128, seed=7):
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    im = gaussian_filter(rng.uniform(0, 1, (hw, hw, 3)), sigma=(3, 3, 0))
    im = (im - im.min()) / (im.max() - im.min() + 1e-9)
    return (np.round(im * 255) / 255).astype(np.float32)[None]


# ---------------------------------------------------------------------------
# kernel-level parity vs the flax modules
# ---------------------------------------------------------------------------

def test_convnext_plain_kernel_matches_flax():
    from lvae_tpu.ops.pallas import trunk as ptk
    rng = np.random.default_rng(0)
    B, H, W, C, K = 2, 8, 12, 16, 3
    blk = common.MyConvNeXtBlock(C, kernel_size=K)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)['params']
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.1, a.shape), a.dtype), params)
    ref = blk.apply({'params': params}, x)
    out = ptk.convnext_plain(x, params, K, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_conv_kxk_kernel_matches_flax_conv():
    from lvae_tpu.ops.pallas import trunk as ptk
    import flax.linen as nn
    rng = np.random.default_rng(1)
    B, H, W, Ci, Co, K = 2, 8, 12, 8, 16, 3
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, Ci)).astype(np.float32))
    conv = nn.Conv(Co, (K, K), padding=[(1, 1), (1, 1)])
    params = conv.init(jax.random.PRNGKey(0), x)['params']
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.2, a.shape), a.dtype), params)
    # act=True prepends the exact-erf GELU (the VDBlock pre-activation)
    ref = conv.apply({'params': params}, common.gelu(x))
    out = ptk.conv_kxk_act(x, params['kernel'], params['bias'], act=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize('ksize', [1, 3])
def test_qres_prior_and_fuse_kernels_match_block(ksize):
    from lvae_tpu.ops.pallas import trunk as ptk
    from lvae_tpu.models.qresvae.model import QLatentBlock
    rng = np.random.default_rng(2 + ksize)
    B, H, W, C, Z = 1, 8, 8, 16, 4
    blk = QLatentBlock(C, Z, kernel_size=ksize)
    x = jnp.asarray(rng.normal(0, 0.5, (B, H, W, C)).astype(np.float32))
    ex = jnp.asarray(rng.normal(0, 0.5, (B, H, W, C)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, ex)['params']
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.1, a.shape), a.dtype), params)
    f_ref, pm_ref, pv_ref, idx_ref = blk.apply(
        {'params': params}, x, method='prior_stage')
    f_mid = ptk.convnext_plain(x, params['resnet_front'], ksize,
                               interpret=True)
    table = jnp.asarray(blk.coding_scale_table(), jnp.float32)
    pm, idx = ptk.qres_prior_head(f_mid, params['prior'], ksize >= 3,
                                  table, interpret=True)
    np.testing.assert_allclose(np.asarray(f_mid), np.asarray(f_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(idx_ref).astype(np.int32))
    syms = jnp.asarray(rng.integers(-5, 6, (B, H, W, Z)).astype(np.int32))
    out_ref = blk.apply({'params': params}, f_ref, pm_ref, syms,
                        method='fuse_stage')
    out = ptk.qres_fuse(jnp.asarray(f_ref), syms, jnp.asarray(pm_ref),
                        params, ksize, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=5e-6)


# ---------------------------------------------------------------------------
# codec-level behavior
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def pqres():
    m = lvae_tpu.get_model('qres_tiny')
    m.compress_mode(coder='fused', portable=True)
    return m


@pytest.fixture(scope='module')
def pqres_lossless():
    m = lvae_tpu.get_model('qres_tiny_lossless')
    m.compress_mode(coder='fused', portable=True)
    return m


def test_qres_portable_roundtrip(pqres):
    import struct
    m = pqres
    im = _img()
    obj = m.compress(im)
    body = obj[0]
    lanes_field = struct.unpack('<H', body[8:10])[0]
    assert lanes_field & 0x8000                     # portable wire marker
    _, recon = m._fused.encode_check(m.params, jnp.asarray(im))
    dec = m.decompress(obj)
    assert np.array_equal(dec, np.asarray(recon, np.float32))
    mse = float(np.mean((dec - im) ** 2))
    assert -10 * np.log10(mse) > 10                 # sane, not garbage


def test_qres_lossless_portable_exact(pqres_lossless):
    m = pqres_lossless
    im = _img(seed=11)
    obj = m.compress(im)
    dec = m.decompress(obj)
    # lossless: the decoded pixel grid must EXACTLY match the input
    assert np.array_equal(np.round(dec * 255).astype(np.uint8),
                          np.round(im * 255).astype(np.uint8))


def test_qres_cross_executable_decode(pqres):
    """Streams written by the batch-2 binary decode bit-exactly in the B=1
    binary, by a FRESH model instance (new jit closures), and vice versa."""
    m = pqres
    ims = np.concatenate([_img(seed=3), _img(seed=4)])
    ims_j = jnp.asarray(ims)
    objs = m.compress_batch(ims_j)
    _, recon_b = m._fused.encode_check_batch(m.params, ims_j)
    fresh = lvae_tpu.get_model('qres_tiny')          # fresh executables
    fresh.compress_mode(coder='fused', portable=True)
    for b, obj in enumerate(objs):
        dec = m.decompress(obj)                      # B=1 executable
        assert np.array_equal(dec, np.asarray(recon_b[b:b + 1], np.float32))
        dec_f = fresh.decompress(obj)                # fresh binary
        assert np.array_equal(dec_f, dec), \
            f'image {b}: stream desynced in a freshly built codec'
    solo = [m.compress(ims[b:b + 1]) for b in range(2)]
    dec_b = m.decompress_batch(solo)
    for b, obj in enumerate(solo):
        assert np.array_equal(dec_b[b], m.decompress(obj)[0])


def test_qres_lossless_cross_executable(pqres_lossless):
    m = pqres_lossless
    im = _img(seed=21)
    obj = m.compress(im)
    fresh = lvae_tpu.get_model('qres_tiny_lossless')
    fresh.compress_mode(coder='fused', portable=True)
    dec = fresh.decompress(obj)
    assert np.array_equal(np.round(dec * 255).astype(np.uint8),
                          np.round(im * 255).astype(np.uint8))


def test_compress_file_defaults_to_portable(tmp_path):
    """The decode-anywhere file contract (VERDICT r4 item 2): files are
    portable by default even when compress_mode didn't ask for it, and a
    fresh model (fresh executables — a stand-in for 'another process')
    decodes them bit-exactly."""
    import struct
    from PIL import Image
    im = (_img(seed=5)[0] * 255).astype(np.uint8)
    src = tmp_path / 'in.png'
    Image.fromarray(im).save(src)
    for name in ('qres_tiny', 'qarv_tiny'):
        m = lvae_tpu.get_model(name)
        m.compress_mode(coder='fused')               # NOT portable mode
        out = tmp_path / f'{name}.bits'
        m.compress_file(str(src), str(out))
        dec1 = m.decompress_file(str(out))
        fresh = lvae_tpu.get_model(name)
        fresh.compress_mode(coder='fused')
        dec2 = fresh.decompress_file(str(out))
        assert np.array_equal(dec1, dec2), f'{name}: file not portable'
        # and the stream really is marked portable on the wire
        if name == 'qarv_tiny':
            raw = out.read_bytes()[4:]               # orig-size header
            assert struct.unpack('<H', raw[10 + 8:10 + 10])[0] & 0x8000

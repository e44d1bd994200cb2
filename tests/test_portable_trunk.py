"""Portable-trunk tests (CPU, interpret-mode Pallas).

The portable codec (compress_mode(portable=True)) runs every arithmetic
op of the decode-critical path inside fixed-block-spec Pallas kernels
(ops/pallas/trunk.py) so different executables produce bitwise-identical
trunk values — the property that makes a stream written by the batch-B
binary decodable by the B=1 binary (VERDICT r3 item 3; hardware proof in
runs/). These CPU tests pin (a) kernel math vs the flax modules,
(b) the portable codec's self-consistency + wire format, (c) actual
CROSS-EXECUTABLE decode, (d) the legacy/portable stream firewall.
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

def test_convnext_adaln_kernel_matches_flax():
    from lvae_tpu.ops.pallas import trunk as ptk
    rng = np.random.default_rng(0)
    B, H, W, C, E, K = 2, 8, 12, 16, 32, 3
    blk = common.ConvNeXtBlockAdaLN(C, E, kernel_size=K)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    emb = jnp.asarray(rng.normal(0, 1, (B, E)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, emb)['params']
    # give gamma/zero-init weights real values so the test is non-trivial
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.1, a.shape), a.dtype), params)
    ref = blk.apply({'params': params}, x, emb)
    gemb = jax.nn.gelu(emb, approximate=False)
    out = ptk.convnext_adaln(x, params, gemb, K, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_prior_head_kernel_matches_entropy_coding():
    from lvae_tpu.ops.pallas import trunk as ptk
    from lvae_tpu.models import entropy_coding as ec
    from lvae_tpu.ops import cdf as cdf_ops
    rng = np.random.default_rng(1)
    B, HW, C, Z = 2, 24, 16, 4
    x = jnp.asarray(rng.normal(0, 1, (B, HW, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (C, 2 * Z)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.2, (2 * Z,)).astype(np.float32))
    table = cdf_ops.default_gaussian_scale_table()
    pm, idx = ptk.prior_head(x, w, b, jnp.asarray(table, jnp.float32),
                             interpret=True)
    p = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    pm_ref, plogv = p[..., :Z], p[..., Z:]
    pv = np.exp(np.asarray(jax.nn.softplus(plogv + 2.3)) - 2.3)
    idx_ref = np.asarray(ec.build_indexes(pv, table))
    np.testing.assert_allclose(np.asarray(pm), pm_ref, rtol=2e-5, atol=2e-6)
    # indexes must agree except where pv sits exactly on a compare boundary
    # (float-rounding ties); there must be none at random operating points
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)


def test_emb_kernel_matches_flax_stage():
    from lvae_tpu.ops.pallas import trunk as ptk
    m = lvae_tpu.get_model('qarv_tiny')
    m.compress_mode(coder='fused')
    codec = m._fused
    lmb = jnp.asarray([512.0, 37.5], jnp.float32)
    ref = np.asarray(codec._emb_stage(m.params, lmb))
    half = m.net.lmb_embed_dim[0] // 2
    freqs = np.power(float(m.net.sin_period),
                     -np.linspace(0.0, 1.0, half)).astype(np.float32)
    e0 = m.params['lmb_embed_0']
    e1 = m.params['lmb_embed_1']
    emb, gemb = ptk.emb_mlp(lmb, jnp.asarray(freqs[None]),
                            e0['kernel'], e0['bias'],
                            e1['kernel'], e1['bias'],
                            m.net.sin_period, interpret=True)
    np.testing.assert_allclose(np.asarray(emb), ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(gemb),
        np.asarray(jax.nn.gelu(jnp.asarray(ref), approximate=False)),
        rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# codec-level behavior
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def pmodel():
    m = lvae_tpu.get_model('qarv_tiny')
    m.compress_mode(coder='fused', portable=True)
    return m


def test_portable_roundtrip_and_wire_flag(pmodel):
    import struct
    m = pmodel
    im = _img()
    body = m.compress(im, lmb=512)
    assert m.compress(im, lmb=512) == body          # deterministic
    # wire format: high bit of the lane-count field marks portable streams
    lanes_field = struct.unpack('<H', body[4 + 6 + 8:4 + 6 + 10])[0]
    assert lanes_field & 0x8000
    lmb_v, = struct.unpack('f', body[:4])
    _, recon = m._fused.encode_check(
        m.params, jnp.asarray(im), jnp.full((1,), lmb_v, jnp.float32))
    dec = m.decompress(body)
    assert np.array_equal(dec, np.asarray(recon, np.float32))
    # sane quality (a desync shows up as garbage, not as a small delta)
    stats = m.forward(im, lmb=512)
    mse = float(np.mean((dec - im) ** 2))
    assert -10 * np.log10(mse) > stats['psnr'] - 1.0


def test_cross_executable_decode(pmodel):
    """THE portability property: streams written by the batch-2 executable
    decode bit-exactly (pixels included) in the single-image executable,
    and vice versa. On CPU the kernels run interpreted (deterministic by
    construction); the same check runs on hardware in r4 suite evidence."""
    m = pmodel
    ims = np.concatenate([_img(seed=3), _img(seed=4)])
    ims_j = jnp.asarray(ims)
    # batch-2 binary encodes; its encode-side selfcheck is the oracle
    bodies = m.compress_batch(ims_j, lmb=[512.0, 640.0])
    lmb_pairs = jnp.asarray([512.0, 640.0], jnp.float32)
    _, recon_b = m._fused.encode_check_batch(m.params, ims_j, lmb_pairs)
    # single-image binary decodes each stream
    for b, body in enumerate(bodies):
        dec = m.decompress(body)                     # B=1 executable
        assert np.array_equal(dec, np.asarray(recon_b[b:b + 1], np.float32)), \
            f'image {b}: batch-2-encoded stream desynced in the B=1 binary'
    # and the reverse: B=1-encoded streams decode in the batch-2 binary
    solo = [m.compress(ims[b:b + 1], lmb=[512.0, 640.0][b])
            for b in range(2)]
    dec_b = m.decompress_batch(solo)
    for b, body in enumerate(solo):
        dec1 = m.decompress(body)
        assert np.array_equal(dec_b[b], dec1[0]), \
            f'image {b}: B=1-encoded stream desynced in the batch-2 binary'


def test_legacy_portable_stream_firewall_and_routing(pmodel):
    """Codec level: a codec object NEVER decodes the other trunk kind's
    stream (parse_payload firewall). Model level: decompress ROUTES by the
    stream's marker bit, so either stream kind decodes through the model
    API regardless of the configured mode (decode-anywhere semantics)."""
    m2 = lvae_tpu.get_model('qarv_tiny')
    m2.compress_mode(coder='fused')                  # legacy trunk
    im = _img(seed=9)
    legacy = m2.compress(im, lmb=512)
    portable = pmodel.compress(im, lmb=512)
    # codec-level firewall (the wire marker): body starts after the 10-byte
    # model header (f32 lambda + 3H shape)
    with pytest.raises(AssertionError, match='trunk kind'):
        pmodel._fused.parse_payload(legacy[10:])
    with pytest.raises(AssertionError, match='trunk kind'):
        m2._fused.parse_payload(portable[10:])
    # model-level routing: both kinds decode through either configured mode
    assert np.array_equal(pmodel.decompress(legacy), m2.decompress(legacy))
    assert np.array_equal(m2.decompress(portable),
                          pmodel.decompress(portable))

"""word_cap: capped word buffers for the fused codec.

The default buffers are sized for the ~2-words/symbol worst case; a trained
operating point emits 20-120k words, so compress_mode(word_cap=...) shrinks
every payload/word buffer (the oversized encode payload-assembly conditional
alone cost 7-12 ms/image on v5e, runs/fused-attrib-r4.txt). Contract:
  * streams under the cap are BYTE-IDENTICAL to the default-cap codec's
    (capacity is dead padding; it must never leak into the wire bytes)
  * a stream that overflows the cap raises OverflowError (the word count is
    exact even when the buffer clamps), mirroring esc_cap's contract
"""
import numpy as np
import pytest

import lvae_tpu


@pytest.fixture(scope='module')
def images():
    rng = np.random.default_rng(7)
    from scipy.ndimage import gaussian_filter
    ims = []
    for i in range(2):
        im = gaussian_filter(rng.uniform(0, 1, (128, 128, 3)),
                             sigma=(2 + i, 2 + i, 0))
        im = (im - im.min()) / (im.max() - im.min() + 1e-9)
        ims.append((np.round(im * 255) / 255).astype(np.float32))
    return np.stack(ims)


def test_word_cap_single_byte_identical_and_roundtrip(images):
    m = lvae_tpu.get_model('qarv_tiny')
    im = images[:1]
    m.compress_mode(coder='fused')
    ref_body = m.compress(im, lmb=512.0)
    ref_dec = np.asarray(m.decompress(ref_body))

    m.compress_mode(coder='fused', word_cap=4096)
    body = m.compress(im, lmb=512.0)
    assert body == ref_body, 'capped stream differs from default-cap stream'
    dec = np.asarray(m.decompress(body))
    assert np.array_equal(dec, ref_dec)


def test_word_cap_batch_byte_identical(images):
    m = lvae_tpu.get_model('qarv_tiny')
    m.compress_mode(coder='fused')
    ref_bodies = m.compress_batch(images, lmb=[64.0, 512.0])
    m.compress_mode(coder='fused', word_cap=4096)
    bodies = m.compress_batch(images, lmb=[64.0, 512.0])
    assert bodies == ref_bodies
    dec = np.asarray(m.decompress_batch(bodies))
    assert dec.shape == (2, 128, 128, 3)


def test_word_cap_overflow_raises(images):
    import jax
    m = lvae_tpu.get_model('qarv_tiny')
    # random-init tiny emits almost no renorm words; amplify the posterior
    # convs so the latents (and the coded stream) go dense
    m.params = jax.tree_util.tree_map_with_path(
        lambda path, p: p * 300.0 if 'posterior' in str(path) else p,
        m.params)
    m.compress_mode(coder='fused', word_cap=64, esc_cap=65536)
    with pytest.raises(OverflowError, match='word'):
        m.compress(images[:1], lmb=2048.0)

"""Real-photo end-to-end round-trips through the committed images/*.png.

Every other end-to-end artifact in this repo codes synthetic
gaussian-filtered noise; the reference's eval harness runs on real
photographs (lvae/evaluation.py:15-67). These tests drive the actual
file APIs (compress_file / decompress_file) on the three committed
photos with BOTH coder paths, so natural-image statistics (sharp edges,
texture, saturated regions) exercise the codec in CI.
"""
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

import lvae_tpu

IMAGES = sorted((Path(__file__).resolve().parent.parent / 'images')
                .glob('*.png'))


@pytest.fixture(scope='module')
def model():
    return lvae_tpu.get_model('qarv_tiny')


@pytest.mark.parametrize('coder', ['host', 'fused'])
def test_real_photo_file_roundtrip(tmp_path, model, coder):
    assert IMAGES, 'committed images/*.png missing'
    m = model
    m.compress_mode(coder=coder)
    for img_path in IMAGES:
        img = Image.open(img_path).convert('RGB')
        bits_path = tmp_path / f'{img_path.stem}-{coder}.bits'
        m.compress_file(img_path, bits_path, lmb=512)
        assert bits_path.stat().st_size > 16
        im_hat = m.decompress_file(bits_path)
        assert im_hat.shape == (1, img.height, img.width, 3)
        assert np.isfinite(im_hat).all()
        assert (im_hat >= 0).all() and (im_hat <= 1).all()
        # reconstruction quality must match the forward (non-coded) path:
        # a desync or an index bug shows up as multi-dB loss (the r3
        # distortion-parity lesson: rate metrics alone cannot see it)
        from lvae_tpu.utils import coding
        padded = coding.pad_divisible_by(img, div=m.net.max_stride)
        im = np.asarray(padded, np.float32)[None] / 255.0
        stats = m.forward(im, lmb=512)
        ref = im[:, :img.height, :img.width, :]
        mse = float(np.mean((im_hat - ref) ** 2))
        psnr = -10 * np.log10(max(mse, 1e-12))
        assert psnr > stats['psnr'] - 1.0, \
            f'{img_path.name} {coder}-coded PSNR {psnr:.2f} vs ' \
            f'forward {stats["psnr"]:.2f}'


def test_real_photo_host_fused_rate_parity(tmp_path, model):
    """Fused and host streams for the same photo must be within the known
    lane-flush overhead of each other (both directions round-trip above;
    this pins the RATE relationship on natural images)."""
    m = model
    img_path = IMAGES[0]
    sizes = {}
    for coder in ['host', 'fused']:
        m.compress_mode(coder=coder)
        bits_path = tmp_path / f'parity-{coder}.bits'
        m.compress_file(img_path, bits_path, lmb=512)
        sizes[coder] = bits_path.stat().st_size
    # The fused format pays a FIXED flush cost the host format does not:
    # 10-byte header + compact lane-state pack (ceil(N/4) prefix bytes +
    # 1..4 B/lane, coding.pack_states) + the LEB128 escape block. On a
    # near-zero-rate stream (random-init qarv_tiny codes ~50 B) that
    # flush dominates, so the bound must be absolute in N, not a
    # percentage: a payload-packing regression (e.g. buffer padding
    # leaking into the word section) would show up as KBs, not bytes.
    N = m.num_lanes if isinstance(m.num_lanes, int) else 128
    flush_cap = 10 + (N + 3) // 4 + 4 * N + 8
    assert sizes['fused'] <= sizes['host'] * 1.02 + flush_cap, sizes

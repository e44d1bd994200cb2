"""Integration tests for the evaluation harness (L7): true-bitstream
round-trip metrics via compress_file/decompress_file."""
import numpy as np
import pytest
from PIL import Image

import lvae_tpu
from lvae_tpu.evaluation import imcoding_evaluate, image_self_evaluate


@pytest.fixture(scope='module')
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('imgs')
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    for i, (h, w) in enumerate([(100, 90), (128, 128)]):
        im = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), sigma=(3, 3, 0))
        im = (im - im.min()) / (im.max() - im.min() + 1e-9)
        Image.fromarray((im * 255).astype(np.uint8)).save(d / f'im{i}.png')
    return d


def test_imcoding_evaluate_qarv(img_dir):
    m = lvae_tpu.get_model('qarv_tiny')
    m.compress_mode()
    m.default_lmb = 300.0
    results = imcoding_evaluate(m, str(img_dir), progress=False)
    assert set(results) == {'bpp', 'mse', 'psnr'}
    assert results['bpp'] > 0 and np.isfinite(results['psnr'])


def test_image_self_evaluate_qres(img_dir):
    m = lvae_tpu.get_model('qres_tiny', lmb=64)
    results = image_self_evaluate(m, str(img_dir), progress=False)
    assert 'bppix' in results and 'psnr' in results
    assert np.isfinite(results['loss'])

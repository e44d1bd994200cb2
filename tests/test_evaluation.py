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


def test_shape_bucketing_bounds_compile_shapes(tmp_path):
    """Mixed-shape eval with shape_buckets=2 must touch <=2 padded shapes
    and still round-trip correctly (bpp over ORIGINAL pixels)."""
    import numpy as np
    from PIL import Image
    import lvae_tpu
    from lvae_tpu.utils import coding

    sizes = [(70, 90), (100, 80), (120, 140), (130, 150)]
    rng = np.random.default_rng(1)
    for i, (h, w) in enumerate(sizes):
        arr = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f'{i}.png')

    buckets = coding.choose_shape_buckets(sizes, div=64, max_buckets=2)
    assert len(buckets) <= 2
    for h, w in sizes:
        bh, bw = coding.bucket_for(h, w, buckets)
        assert bh >= h and bw >= w and bh % 64 == 0 and bw % 64 == 0

    from lvae_tpu.evaluation import imcoding_evaluate
    m = lvae_tpu.get_model('qres_tiny', lmb=128)
    m.compress_mode(coder='host')
    stats = imcoding_evaluate(m, str(tmp_path), progress=False,
                              shape_buckets=2)
    assert stats['bpp'] > 0 and np.isfinite(stats['psnr'])

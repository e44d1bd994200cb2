"""Weight-porting tests: every layout transform is verified numerically
against torch, and full-model conversion is checked for coverage/shapes
with a synthetic reference-style state dict."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from lvae_tpu.models import common, port


def _np(x):
    return x.detach().numpy()


def test_conv_port_matches_torch(rng_np):
    import torch
    tconv = torch.nn.Conv2d(5, 7, 3, stride=1, padding=1)
    x = rng_np.normal(size=(2, 5, 8, 8)).astype(np.float32)
    want = _np(tconv(torch.from_numpy(x))).transpose(0, 2, 3, 1)
    fconv = nn.Conv(7, (3, 3), padding=[(1, 1), (1, 1)])
    params = {'kernel': jnp.asarray(port.t_conv(_np(tconv.weight))),
              'bias': jnp.asarray(_np(tconv.bias))}
    got = np.asarray(fconv.apply({'params': params},
                                 jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert np.allclose(got, want, atol=1e-5)


def test_depthwise_conv_port_matches_torch(rng_np):
    import torch
    C = 6
    tconv = torch.nn.Conv2d(C, C, 7, padding=3, groups=C)
    x = rng_np.normal(size=(1, C, 10, 10)).astype(np.float32)
    want = _np(tconv(torch.from_numpy(x))).transpose(0, 2, 3, 1)
    fconv = nn.Conv(C, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=C)
    params = {'kernel': jnp.asarray(port.t_conv(_np(tconv.weight))),
              'bias': jnp.asarray(_np(tconv.bias))}
    got = np.asarray(fconv.apply({'params': params},
                                 jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert np.allclose(got, want, atol=1e-5)


def test_dense_port_matches_torch(rng_np):
    import torch
    tl = torch.nn.Linear(5, 9)
    x = rng_np.normal(size=(4, 5)).astype(np.float32)
    want = _np(tl(torch.from_numpy(x)))
    fd = nn.Dense(9)
    params = {'kernel': jnp.asarray(port.t_dense(_np(tl.weight))),
              'bias': jnp.asarray(_np(tl.bias))}
    got = np.asarray(fd.apply({'params': params}, jnp.asarray(x)))
    assert np.allclose(got, want, atol=1e-5)


def test_conv_transpose_port_matches_torch(rng_np):
    import torch
    # the reference's deconv: ConvTranspose2d(k=5, s=2, pad=2, output_pad=1)
    tct = torch.nn.ConvTranspose2d(4, 6, 5, stride=2, padding=2,
                                   output_padding=1)
    x = rng_np.normal(size=(1, 4, 8, 8)).astype(np.float32)
    want = _np(tct(torch.from_numpy(x))).transpose(0, 2, 3, 1)
    fct = common.deconv(6, kernel_size=5, stride=2)
    kernel = jnp.asarray(port.t_convT(_np(tct.weight)).copy())
    params = {'conv': {'kernel': kernel, 'bias': jnp.asarray(_np(tct.bias))}}
    got = np.asarray(fct.apply({'params': params},
                               jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-5), \
        f'max diff {np.abs(got - want).max()}'


def test_patch_upsample_port_matches_torch(rng_np):
    import torch
    # reference patch_upsample = Sequential(Conv2d 1x1 -> out*r^2, PixelShuffle(r))
    r, cin, cout = 2, 6, 3
    tconv = torch.nn.Conv2d(cin, cout * r * r, 1)
    tseq = torch.nn.Sequential(tconv, torch.nn.PixelShuffle(r))
    x = rng_np.normal(size=(1, cin, 4, 4)).astype(np.float32)
    want = _np(tseq(torch.from_numpy(x))).transpose(0, 2, 3, 1)
    fup = common.patch_upsample(cout, rate=r)
    params = {'conv': {'kernel': jnp.asarray(port.t_conv(_np(tconv.weight))),
                       'bias': jnp.asarray(_np(tconv.bias))}}
    got = np.asarray(fup.apply({'params': params},
                               jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert np.allclose(got, want, atol=1e-5)


def _synthetic_torch_sd(model, rng):
    """Random torch-side state dict with reference naming/shapes derived by
    inverting the porting rules."""
    inv_shape = {
        port.t_conv: lambda s: (s[3], s[2], s[0], s[1]),
        port.t_convT: lambda s: (s[2], s[3], s[0], s[1]),
        port.t_dense: lambda s: (s[1], s[0]),
        port.t_flat: lambda s: (1, s[0], 1, 1),
        port.t_raw: lambda s: s,
        port.t_bias_nhwc: lambda s: (1, s[3], 1, 1),
    }
    flat = {tuple(str(getattr(k, 'key', k)) for k in p): l.shape
            for p, l in jax.tree_util.tree_leaves_with_path(model.params)}
    sd = {}
    for path, tk, fn in port.build_key_map(model):
        shape = inv_shape[fn](tuple(flat[tuple(path)]))
        sd[tk] = rng.normal(0, 0.02, shape).astype(np.float32)
    return sd


@pytest.mark.parametrize('name', ['qres_tiny', 'qarv_tiny', 'rd_tiny'])
def test_full_model_conversion_coverage(name, rng_np):
    import lvae_tpu
    model = lvae_tpu.get_model(name)
    sd = _synthetic_torch_sd(model, rng_np)
    new_params = port.convert_state_dict(model, sd)
    # structure identical, all leaves replaced with converted tensors
    jax.tree.map(lambda a, b: None, model.params, new_params)
    # spot check one tensor actually moved through a transform
    old = jax.tree.leaves(model.params)[0]
    new = jax.tree.leaves(new_params)[0]
    assert old.shape == new.shape


def test_hf_checkpoint_container_roundtrip(tmp_path, rng_np):
    """load_torch_checkpoint against a .pt packaged the way the reference's
    HF checkpoints are loaded (lvae/models/qarv/zoo.py:92-95): nested
    'model' key next to optimizer/scaler state, registered CompressAI CDF
    buffers (int32 _quantized_cdf/_offset/_cdf_length), and a half-precision
    tensor — extra buffers must be ignored, dtypes normalized to f32."""
    import torch
    import lvae_tpu
    from lvae_tpu.models.port import load_torch_checkpoint

    model = lvae_tpu.get_model('qarv_tiny')
    sd_np = _synthetic_torch_sd(model, rng_np)
    sd = {k: torch.from_numpy(v) for k, v in sd_np.items()}
    # dtype quirk: HF fp16-saved tensor
    first = next(iter(sd))
    sd[first] = sd[first].half()
    # registered entropy-model buffers the torch reference checkpoints carry
    sd['entropy_model._quantized_cdf'] = torch.zeros(64, 249,
                                                     dtype=torch.int32)
    sd['entropy_model._offset'] = torch.zeros(64, dtype=torch.int32)
    sd['entropy_model._cdf_length'] = torch.zeros(64, dtype=torch.int32)
    path = tmp_path / 'ckpt.pt'
    torch.save({'model': sd,
                'optimizer': {'state': {}, 'param_groups': []},
                'scaler': {'scale': 1.0},
                'iteration': 123}, path)

    new_params = load_torch_checkpoint(model, path)
    ref_params = port.convert_state_dict(model, sd_np)
    flat_a = jax.tree.leaves(new_params)
    flat_b = jax.tree.leaves(ref_params)
    for a, b in zip(flat_a, flat_b):
        assert a.dtype == np.float32
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-3)  # fp16 leaf


def test_f16_weights_file_casts_to_compute_dtype(tmp_path, rng_np):
    """Weight files may be stored float16 (the committed qarv_base EMA
    checkpoint halves the repo footprint that way — scripts/
    quantize-weights.py); load_weights must restore the model's f32
    compute dtype with only f16 rounding error."""
    import flax.serialization
    import lvae_tpu

    model = lvae_tpu.get_model('qarv_tiny')
    ref = jax.tree.map(np.asarray, model.params)
    path = tmp_path / 'w_f16.msgpack'
    tree16 = jax.tree.map(
        lambda a: a.astype(np.float16) if a.dtype == np.float32 else a, ref)
    path.write_bytes(flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(tree16)))

    model.load_weights(str(path))
    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(ref)):
        assert a.dtype == b.dtype
        np.testing.assert_allclose(np.asarray(a), b, rtol=0, atol=2e-3)


def test_committed_checkpoint_loads():
    """The committed trained operating point (round-4 reproducibility fix:
    every trained-weight claim must be regenerable from a clean checkout)
    parses and matches the qarv_base parameter structure."""
    import os
    import lvae_tpu

    path = 'checkpoints/qarv_base_synth6k_ema_f16.msgpack'
    assert os.path.isfile(path), 'committed checkpoint missing'
    model = lvae_tpu.get_model('qarv_base')
    model.load_weights(path)
    leaves = jax.tree.leaves(model.params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert sum(int(l.size) for l in leaves) > 90e6

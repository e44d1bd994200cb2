"""QRes-VAE model zoo (reference: lvae/models/qresvae/zoo.py).

Architecture "config" is code: factory functions build literal block lists,
exactly like the reference. Registered names: qres34m, qres34m_lossless,
qres17m.
"""
import math

from lvae_tpu.registry import register_model
from lvae_tpu.models import common
from lvae_tpu.models.qresvae import model as qres
from lvae_tpu.models.qresvae.model import (
    HierarchicalVAENet, QresModel, MSEOutputNet, GaussianNLLOutputNet,
)

# ImageNet pixel stats (reference: qresvae/zoo.py:46-47)
IMAGENET_SHIFT = -0.4546259594901961
IMAGENET_SCALE = 3.67572653978347


def _load_pretrained(model, pretrained, name):
    if pretrained is True:
        raise RuntimeError(
            f'Auto-download of {name} weights is unavailable in this build '
            '(no network egress). Pass pretrained=<local path> to a converted '
            '.msgpack weight file, or use lvae_tpu.models.port to convert a '
            'torch checkpoint.')
    if isinstance(pretrained, str):
        if pretrained.endswith('.pt') or pretrained.endswith('.pth'):
            from lvae_tpu.models import port
            model.params = port.load_torch_checkpoint(model, pretrained)
        else:
            model.load_weights(pretrained)
    return model


def _qres34m_blocks(lossless: bool):
    enc_nums = [6, 6, 6, 4, 2]
    dec_nums = [1, 2, 3, 3, 3]
    z_dims = [16, 14, 12, 10, 8]
    ch = 96

    enc_blocks = [
        common.patch_downsample(ch * 2, rate=4),
        *[common.MyConvNeXtBlock(ch * 2, kernel_size=7) for _ in range(enc_nums[0])],
        common.MyConvNeXtPatchDown(ch * 2, ch * 4),
        *[common.MyConvNeXtBlock(ch * 4, kernel_size=7) for _ in range(enc_nums[1])],
        common.MyConvNeXtPatchDown(ch * 4, ch * 4),
        *[common.MyConvNeXtBlock(ch * 4, kernel_size=5) for _ in range(enc_nums[2])],
        common.MyConvNeXtPatchDown(ch * 4, ch * 4),
        *[common.MyConvNeXtBlock(ch * 4, kernel_size=3) for _ in range(enc_nums[3])],
        common.MyConvNeXtPatchDown(ch * 4, ch * 4),
        *[common.MyConvNeXtBlock(ch * 4, kernel_size=1) for _ in range(enc_nums[4])],
    ]
    # z_proj last-conv init rescaling mirrors the reference's
    # residual_scaling(N) with N = number of latent blocks
    # (reference: qresvae/model.py:242-243, 373-377 — the factor there
    # evaluates to sqrt(N/3))
    N = sum(dec_nums)
    rs = math.sqrt(N / 3)
    dec_blocks = [
        *[qres.QLatentBlock(ch * 4, z_dims[0], kernel_size=1, rescale_z=rs)
          for _ in range(dec_nums[0])],
        common.patch_upsample(ch * 4, rate=2),
        *[qres.QLatentBlock(ch * 4, z_dims[1], kernel_size=3, rescale_z=rs)
          for _ in range(dec_nums[1])],
        common.patch_upsample(ch * 4, rate=2),
        *[qres.QLatentBlock(ch * 4, z_dims[2], kernel_size=5, rescale_z=rs)
          for _ in range(dec_nums[2])],
        common.patch_upsample(ch * 4, rate=2),
        *[qres.QLatentBlock(ch * 4, z_dims[3], kernel_size=7, rescale_z=rs)
          for _ in range(dec_nums[3])],
        common.patch_upsample(ch * 2, rate=2),
        *[qres.QLatentBlock(ch * 2, z_dims[4], kernel_size=7, rescale_z=rs)
          for _ in range(dec_nums[4])],
    ]
    if not lossless:
        dec_blocks.append(common.patch_upsample(3, rate=4))
    return enc_blocks, dec_blocks, ch


@register_model
def qres34m(lmb=32, pretrained=False):
    """Fixed-rate QRes-VAE, ~34M params (reference: qresvae/zoo.py:10-60)."""
    enc_blocks, dec_blocks, ch = _qres34m_blocks(lossless=False)
    net = HierarchicalVAENet(
        enc_blocks=tuple(enc_blocks), dec_blocks=tuple(dec_blocks),
        out_net=MSEOutputNet(mse_lmb=float(lmb)),
        im_shift=IMAGENET_SHIFT, im_scale=IMAGENET_SCALE, max_stride=64)
    model = QresModel(net)
    return _load_pretrained(model, pretrained, f'qres34m-lmb{lmb}')


@register_model
def qres34m_lossless(pretrained=False):
    """Lossless QRes-VAE with Gaussian-NLL output head
    (reference: qresvae/zoo.py:63-115)."""
    enc_blocks, dec_blocks, ch = _qres34m_blocks(lossless=True)
    out_net = GaussianNLLOutputNet(
        conv_mean=common.patch_upsample(3, rate=4),
        conv_scale=common.patch_upsample(3, rate=4))
    net = HierarchicalVAENet(
        enc_blocks=tuple(enc_blocks), dec_blocks=tuple(dec_blocks),
        out_net=out_net,
        im_shift=IMAGENET_SHIFT, im_scale=IMAGENET_SCALE, max_stride=64)
    model = QresModel(net)
    return _load_pretrained(model, pretrained, 'qres34m_lossless')


@register_model
def qres17m(lmb=8, pretrained=False):
    """Smaller QRes-VAE trained on CelebA (reference: qresvae/zoo.py:118-166)."""
    enc_nums = [6, 6, 4, 2]
    dec_nums = [1, 2, 4, 5]
    z_dims = [16, 8, 6, 4]
    ch = 72

    enc_blocks = [
        common.patch_downsample(ch * 2, rate=4),
        *[common.MyConvNeXtBlock(ch * 2, kernel_size=7) for _ in range(enc_nums[0])],
        common.MyConvNeXtPatchDown(ch * 2, ch * 4),
        *[common.MyConvNeXtBlock(ch * 4, kernel_size=5) for _ in range(enc_nums[1])],
        common.MyConvNeXtPatchDown(ch * 4, ch * 4),
        *[common.MyConvNeXtBlock(ch * 4, kernel_size=3) for _ in range(enc_nums[2])],
        common.MyConvNeXtPatchDown(ch * 4, ch * 4, down_rate=4),
        *[common.MyConvNeXtBlock(ch * 4, kernel_size=1) for _ in range(enc_nums[3])],
    ]
    N = sum(dec_nums)
    rs = math.sqrt(N / 3)
    dec_blocks = [
        *[qres.QLatentBlock(ch * 4, z_dims[0], kernel_size=1, rescale_z=rs)
          for _ in range(dec_nums[0])],
        common.upsample_nearest(rate=4),
        *[qres.QLatentBlock(ch * 4, z_dims[1], kernel_size=3, rescale_z=rs)
          for _ in range(dec_nums[1])],
        common.deconv(ch * 4, kernel_size=3),
        *[qres.QLatentBlock(ch * 4, z_dims[2], kernel_size=5, rescale_z=rs)
          for _ in range(dec_nums[2])],
        common.deconv(ch * 2),
        *[qres.QLatentBlock(ch * 2, z_dims[3], kernel_size=7, rescale_z=rs)
          for _ in range(dec_nums[3])],
        common.patch_upsample(3, rate=4),
    ]
    # CelebA pixel stats (reference: qresvae/zoo.py:152-153)
    net = HierarchicalVAENet(
        enc_blocks=tuple(enc_blocks), dec_blocks=tuple(dec_blocks),
        out_net=MSEOutputNet(mse_lmb=float(lmb)),
        im_shift=-0.4356, im_scale=3.397893306150187, max_stride=64)
    model = QresModel(net)
    return _load_pretrained(model, pretrained, f'qres17m-lmb{lmb}')

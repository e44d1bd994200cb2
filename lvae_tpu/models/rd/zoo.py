"""RD-model zoo (reference: lvae/models/rd/zoo.py)."""
from lvae_tpu.registry import register_model
from lvae_tpu.models import common
from lvae_tpu.models.rd import model as lib
from lvae_tpu.models.rd.model import RDVAENet, RDModel


def build_rd_model(enc_dims, dec_dims, z_dims, enc_nums=(6, 6, 6, 4, 4),
                   dec_nums=(1, 2, 3, 4, 5), lmb_range=(4, 2048),
                   use_linear_sqrt=True, ed=256, pretrained=False,
                   log_images=('collie64.png', 'gun128.png', 'motor256.png')):
    """Shared RD-model builder (used by rd_model_base and the ablation zoo)."""
    def rb(dim):
        return common.ConvNeXtBlockAdaLN(dim, ed)

    im_channels = 3
    enc_blocks = [
        common.patch_downsample(enc_dims[0], rate=4),
        *[rb(enc_dims[0]) for _ in range(enc_nums[0])],
        lib.ConvNeXtAdaLNPatchDown(enc_dims[0], enc_dims[1], embed_dim=ed),
        *[rb(enc_dims[1]) for _ in range(enc_nums[1])],
        lib.ConvNeXtAdaLNPatchDown(enc_dims[1], enc_dims[2], embed_dim=ed),
        *[rb(enc_dims[2]) for _ in range(enc_nums[2])],
        lib.ConvNeXtAdaLNPatchDown(enc_dims[2], enc_dims[3], embed_dim=ed),
        *[rb(enc_dims[3]) for _ in range(enc_nums[3])],
        lib.ConvNeXtAdaLNPatchDown(enc_dims[3], enc_dims[3], embed_dim=ed),
        *[rb(enc_dims[3]) for _ in range(enc_nums[4])],
    ]

    def lvb(width, zdim, enc_width):
        return lib.LatentVariableBlock(width, zdim, ed, enc_width=enc_width,
                                       use_linear_sqrt=use_linear_sqrt)

    dec_blocks = [
        *[lvb(dec_dims[0], z_dims[0], enc_dims[-1]) for _ in range(dec_nums[0])],
        common.patch_upsample(dec_dims[1], rate=2),
        *[lvb(dec_dims[1], z_dims[1], enc_dims[-2]) for _ in range(dec_nums[1])],
        common.patch_upsample(dec_dims[2], rate=2),
        *[lvb(dec_dims[2], z_dims[2], enc_dims[-3]) for _ in range(dec_nums[2])],
        common.patch_upsample(dec_dims[3], rate=2),
        *[lvb(dec_dims[3], z_dims[3], enc_dims[-4]) for _ in range(dec_nums[3])],
        common.patch_upsample(dec_dims[4], rate=2),
        *[lvb(dec_dims[4], z_dims[4], enc_dims[-5]) for _ in range(dec_nums[4])],
        common.patch_upsample(im_channels, rate=4),
    ]

    net = RDVAENet(
        enc_blocks=tuple(enc_blocks), dec_blocks=tuple(dec_blocks),
        im_shift=-0.4546259594901961, im_scale=3.67572653978347, max_stride=64,
        lmb_range=(float(lmb_range[0]), float(lmb_range[1])),
        lmb_embed_dim=(256, 256), sin_period=64)
    model = RDModel(net, log_images=list(log_images))

    if pretrained is True:
        raise RuntimeError('Auto-download unavailable (no network egress); '
                           'pass pretrained=<local path>.')
    if isinstance(pretrained, str):
        if pretrained.endswith(('.pt', '.pth')):
            from lvae_tpu.models import port
            model.params = port.load_torch_checkpoint(model, pretrained)
        else:
            model.load_weights(pretrained)
    return model


@register_model
def rd_model_base(lmb_range=(4, 2048), pretrained=False):
    """15 latent blocks, ~187M params (reference: rd/zoo.py:10-78)."""
    return build_rd_model(
        enc_dims=[256, 512, 640, 768, 768],
        dec_dims=[768, 768, 640, 512, 256],
        z_dims=[32, 32, 32, 32, 32],
        enc_nums=(6, 6, 6, 4, 4), dec_nums=(1, 2, 3, 4, 5),
        lmb_range=lmb_range, pretrained=pretrained)

"""RD-model ablation zoo: 7 registered ablations
(reference: lvae/models/rd/zoo_ablation.py:10-492).

All share the rd_model skeleton; they differ in base channel dim, latent
depth per resolution, and whether linear_sqrt ("smooth") companding is used.
"""
from lvae_tpu.registry import register_model
from lvae_tpu.models.rd.zoo import build_rd_model


def _dims(dim):
    enc_dims = [dim * 2, dim * 4, dim * 5, dim * 6, dim * 6]
    dec_dims = [dim * 6, dim * 6, dim * 5, dim * 4, dim * 2]
    return enc_dims, dec_dims


_Z = [32, 32, 32, 32, 32]
_ENC_NUMS = (6, 6, 6, 4, 4)


@register_model
def rd_ablation_c64_l5_nosmooth(lmb_range=(4, 2048), pretrained=False):
    enc, dec = _dims(64)
    return build_rd_model(enc, dec, _Z, _ENC_NUMS, (1, 1, 1, 1, 1),
                          lmb_range, use_linear_sqrt=False, pretrained=pretrained)


@register_model
def rd_ablation_c64_l5(lmb_range=(4, 2048), pretrained=False):
    enc, dec = _dims(64)
    return build_rd_model(enc, dec, _Z, _ENC_NUMS, (1, 1, 1, 1, 1),
                          lmb_range, use_linear_sqrt=True, pretrained=pretrained)


@register_model
def rd_ablation_c64_l10(lmb_range=(4, 2048), pretrained=False):
    enc, dec = _dims(64)
    return build_rd_model(enc, dec, _Z, _ENC_NUMS, (1, 2, 2, 2, 3),
                          lmb_range, use_linear_sqrt=True, pretrained=pretrained)


@register_model
def rd_ablation_c64_l15(lmb_range=(4, 2048), pretrained=False):
    enc, dec = _dims(64)
    return build_rd_model(enc, dec, _Z, _ENC_NUMS, (1, 2, 3, 4, 5),
                          lmb_range, use_linear_sqrt=True, pretrained=pretrained)


@register_model
def rd_ablation_c96_l15(lmb_range=(4, 2048), pretrained=False):
    enc, dec = _dims(96)
    return build_rd_model(enc, dec, _Z, _ENC_NUMS, (1, 2, 3, 4, 5),
                          lmb_range, use_linear_sqrt=True, pretrained=pretrained)


@register_model
def rd_ablation_c128_l10(lmb_range=(4, 2048), pretrained=False):
    enc, dec = _dims(128)
    return build_rd_model(enc, dec, _Z, _ENC_NUMS, (1, 1, 2, 3, 3),
                          lmb_range, use_linear_sqrt=True, pretrained=pretrained)


@register_model
def rd_ablation_base_nosmooth(lmb_range=(4, 2048), pretrained=False):
    return build_rd_model([256, 512, 640, 768, 768], [768, 768, 640, 512, 256],
                          _Z, _ENC_NUMS, (1, 2, 3, 4, 5),
                          lmb_range, use_linear_sqrt=False, pretrained=pretrained)

"""Minimal torch stubs for `timm`, `compressai`, and `torchvision`.

The parity tests import the ACTUAL reference model code from
/root/reference/lvae and run it with torch. The reference depends on three
packages not installed here; these stubs recreate exactly the pieces it
imports, faithful to the published upstream sources:

  * timm.layers.mlp.Mlp              (timm >= 0.8, timm/layers/mlp.py)
  * timm.models.convnext.ConvNeXtBlock (timm 0.9.x, timm/models/convnext.py;
    only the non-conv-mlp, stride-1 path the reference exercises — and the
    reference's MyConvNeXtBlock overrides forward() anyway, so only the
    submodule layout/state_dict schema matters)
  * timm.utils.AverageMeter
  * compressai.ops.LowerBound        (compressai/ops/bound_ops.py)
  * compressai.entropy_models.GaussianConditional — forward math only
    (quantize / _likelihood / build_indexes); the rANS compress/decompress
    entry points raise, since the C++ coder is exactly what the parity test
    does NOT need (this repo has its own native coder).
  * torchvision(.transforms.functional) — to_tensor/to_pil_image only
    (imported at reference module top level; unused by the forward paths).

Everything here defines the TORCH-SIDE state_dict schema that
lvae_tpu/models/port.py claims to understand; keeping it faithful to real
timm/compressai is what makes the parity test meaningful.
"""
import math
import sys
import types

import torch
import torch.nn as nn


# --------------------------------------------------------------------- timm

class Mlp(nn.Module):
    """timm/layers/mlp.py (timm >= 0.8): fc1 -> act -> drop1 -> norm -> fc2
    -> drop2; norm defaults to Identity."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, norm_layer=None, bias=True, drop=0.0,
                 use_conv=False):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        assert not use_conv, 'stub supports the Linear path only'
        self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop)
        self.norm = norm_layer(hidden_features) if norm_layer else nn.Identity()
        self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
        self.drop2 = nn.Dropout(drop)

    def forward(self, x):
        x = self.fc1(x)
        x = self.act(x)
        x = self.drop1(x)
        x = self.norm(x)
        x = self.fc2(x)
        x = self.drop2(x)
        return x


class _TimmLayerNorm(nn.LayerNorm):
    """timm.layers.LayerNorm: nn.LayerNorm with eps=1e-6 default."""

    def __init__(self, num_channels, eps=1e-6, affine=True):
        super().__init__(num_channels, eps=eps, elementwise_affine=affine)


class ConvNeXtBlock(nn.Module):
    """timm/models/convnext.py ConvNeXtBlock (timm 0.9.x), restricted to the
    configuration the reference uses: conv_mlp=False, stride=1, no GRN.

    Submodules (the state_dict contract): conv_dw (depthwise Conv2d),
    norm (LayerNorm eps=1e-6), mlp (Mlp), gamma (flat (C,) parameter),
    shortcut/drop_path (Identity)."""

    def __init__(self, in_chs, out_chs=None, kernel_size=7, stride=1,
                 dilation=(1, 1), mlp_ratio=4, conv_mlp=False, conv_bias=True,
                 use_grn=False, ls_init_value=1e-6, act_layer=nn.GELU,
                 norm_layer=None, drop_path=0.0):
        super().__init__()
        out_chs = out_chs or in_chs
        assert not conv_mlp and not use_grn and stride == 1 \
            and in_chs == out_chs, 'stub supports the reference config only'
        self.use_conv_mlp = False
        pad = (stride - 1 + dilation[0] * (kernel_size - 1)) // 2
        self.conv_dw = nn.Conv2d(in_chs, out_chs, kernel_size, stride=stride,
                                 padding=pad, dilation=dilation[0],
                                 groups=out_chs, bias=conv_bias)
        self.norm = (norm_layer or _TimmLayerNorm)(out_chs)
        self.mlp = Mlp(out_chs, int(mlp_ratio * out_chs), act_layer=act_layer)
        self.gamma = nn.Parameter(ls_init_value * torch.ones(out_chs)) \
            if ls_init_value is not None else None
        self.shortcut = nn.Identity()
        self.drop_path = nn.Identity()

    def forward(self, x):  # reference MyConvNeXtBlock overrides this
        shortcut = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.mlp(x)
        x = x.permute(0, 3, 1, 2)
        if self.gamma is not None:
            x = x * self.gamma.reshape(1, -1, 1, 1)
        return self.drop_path(x) + self.shortcut(shortcut)


class AverageMeter:
    """timm.utils.AverageMeter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


# --------------------------------------------------------------- compressai

class LowerBound(nn.Module):
    """compressai/ops/bound_ops.py: max(x, bound) with pass-through-ish grad."""

    def __init__(self, bound):
        super().__init__()
        self.register_buffer('bound', torch.Tensor([float(bound)]))

    def forward(self, x):
        return torch.max(x, self.bound)


class _EntropyModel(nn.Module):
    """compressai/entropy_models/entropy_models.py EntropyModel, minus the
    C++ rANS coder. Buffers mirror the real class so exported state_dicts
    carry the same keys a real checkpoint would."""

    def __init__(self, likelihood_bound=1e-9, entropy_coder=None,
                 entropy_coder_precision=16):
        super().__init__()
        self.entropy_coder = None
        self.entropy_coder_precision = int(entropy_coder_precision)
        self.use_likelihood_bound = likelihood_bound > 0
        if self.use_likelihood_bound:
            self.likelihood_lower_bound = LowerBound(likelihood_bound)
        self.register_buffer('_offset', torch.IntTensor())
        self.register_buffer('_quantized_cdf', torch.IntTensor())
        self.register_buffer('_cdf_length', torch.IntTensor())

    def quantize(self, inputs, mode, means=None):
        if mode == 'noise':
            noise = torch.empty_like(inputs).uniform_(-0.5, 0.5)
            return inputs + noise
        outputs = inputs.clone()
        if means is not None:
            outputs -= means
        outputs = torch.round(outputs)
        if mode == 'dequantize':
            if means is not None:
                outputs += means
            return outputs
        assert mode == 'symbols', mode
        return outputs.int()

    def compress(self, *a, **k):
        raise NotImplementedError('stub has no rANS coder')

    def decompress(self, *a, **k):
        raise NotImplementedError('stub has no rANS coder')


class GaussianConditional(_EntropyModel):
    """compressai GaussianConditional — forward math only."""

    def __init__(self, scale_table, *args, scale_bound=0.11, tail_mass=1e-9,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.tail_mass = float(tail_mass)
        if scale_bound is None and scale_table:
            scale_bound = scale_table[0]
        self.lower_bound_scale = LowerBound(scale_bound)
        self.register_buffer(
            'scale_table',
            torch.Tensor(tuple(float(s) for s in sorted(scale_table)))
            if scale_table else torch.Tensor())
        self.register_buffer(
            'scale_bound',
            torch.Tensor([float(scale_bound)]) if scale_bound is not None
            else None)

    def _standardized_cumulative(self, inputs):
        half = float(0.5)
        const = float(-(2 ** -0.5))
        return half * torch.erfc(const * inputs)

    def _likelihood(self, inputs, scales, means=None):
        half = float(0.5)
        values = inputs - means if means is not None else inputs
        scales = self.lower_bound_scale(scales)
        values = torch.abs(values)
        upper = self._standardized_cumulative((half - values) / scales)
        lower = self._standardized_cumulative((-half - values) / scales)
        return upper - lower

    def forward(self, inputs, scales, means=None, training=None):
        if training is None:
            training = self.training
        outputs = self.quantize(inputs, 'noise' if training else 'dequantize',
                                means)
        likelihood = self._likelihood(outputs, scales, means)
        if self.use_likelihood_bound:
            likelihood = self.likelihood_lower_bound(likelihood)
        return outputs, likelihood

    def build_indexes(self, scales):
        scales = self.lower_bound_scale(scales)
        indexes = scales.new_full(scales.size(),
                                  len(self.scale_table) - 1).int()
        for s in self.scale_table[:-1]:
            indexes -= (scales <= s).int()
        return indexes

    def update_scale_table(self, scale_table, force=False):
        self.register_buffer('scale_table',
                             torch.Tensor(tuple(float(s) for s in scale_table)))
        return True

    def update(self):
        pass  # CDF-table build is only needed for the (absent) rANS coder


# -------------------------------------------------------------- torchvision

def _to_tensor(pic):
    import numpy as np
    arr = np.asarray(pic, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return torch.from_numpy(arr.transpose(2, 0, 1).copy())


def _to_pil_image(tensor):
    import numpy as np
    from PIL import Image
    arr = tensor.detach().cpu().numpy()
    if arr.ndim == 4:
        arr = arr[0]
    arr = (arr.transpose(1, 2, 0).clip(0, 1) * 255).round().astype(np.uint8)
    return Image.fromarray(arr)


# ------------------------------------------------------------------ install

def install():
    """Register the stub packages in sys.modules and put /root/reference on
    sys.path so `import lvae` loads the ACTUAL reference code."""
    if 'timm' in sys.modules and not hasattr(sys.modules['timm'], '_lvae_stub'):
        raise RuntimeError('real timm present; stubs not needed')

    timm = types.ModuleType('timm')
    timm._lvae_stub = True
    timm_utils = types.ModuleType('timm.utils')
    timm_utils.AverageMeter = AverageMeter
    timm_layers = types.ModuleType('timm.layers')
    timm_layers_mlp = types.ModuleType('timm.layers.mlp')
    timm_layers_mlp.Mlp = Mlp
    timm_layers.mlp = timm_layers_mlp
    timm_layers.Mlp = Mlp
    timm_models = types.ModuleType('timm.models')
    timm_models_convnext = types.ModuleType('timm.models.convnext')
    timm_models_convnext.ConvNeXtBlock = ConvNeXtBlock
    timm_models.convnext = timm_models_convnext
    timm.utils = timm_utils
    timm.layers = timm_layers
    timm.models = timm_models
    for name, mod in [('timm', timm), ('timm.utils', timm_utils),
                      ('timm.layers', timm_layers),
                      ('timm.layers.mlp', timm_layers_mlp),
                      ('timm.models', timm_models),
                      ('timm.models.convnext', timm_models_convnext)]:
        sys.modules[name] = mod

    compressai = types.ModuleType('compressai')
    compressai._lvae_stub = True
    ca_ops = types.ModuleType('compressai.ops')
    ca_ops.LowerBound = LowerBound
    ca_em = types.ModuleType('compressai.entropy_models')
    ca_em.GaussianConditional = GaussianConditional
    compressai.ops = ca_ops
    compressai.entropy_models = ca_em
    for name, mod in [('compressai', compressai), ('compressai.ops', ca_ops),
                      ('compressai.entropy_models', ca_em)]:
        sys.modules[name] = mod

    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tv._lvae_stub = True
        tv_tr = types.ModuleType('torchvision.transforms')
        tv_trf = types.ModuleType('torchvision.transforms.functional')
        tv_trf.to_tensor = _to_tensor
        tv_trf.to_pil_image = _to_pil_image
        tv_tr.functional = tv_trf
        tv.transforms = tv_tr
        for name, mod in [('torchvision', tv),
                          ('torchvision.transforms', tv_tr),
                          ('torchvision.transforms.functional', tv_trf)]:
            sys.modules[name] = mod

    ref_root = '/root/reference'
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)

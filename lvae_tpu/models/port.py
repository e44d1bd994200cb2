"""Torch-checkpoint -> flax-pytree weight converter.

Ports pretrained weights from the reference codebase's torch state dicts
(HuggingFace checkpoints of qres34m / qres17m / qarv_base / rd_model_base)
into this framework's parameter trees. Handles the layout conversions:

  * conv weight (O, I, kh, kw)            -> HWIO (kh, kw, I, O)
  * depthwise conv (C, 1, k, k)           -> (k, k, 1, C)  (same transpose)
  * ConvTranspose2d weight (I, O, kh, kw) -> (kh, kw, I, O) with spatial flip
  * Linear (out, in)                      -> (in, out)
  * LayerNorm weight/bias                 -> scale/bias
  * gamma (1, C, 1, 1) / decoder bias     -> flattened / NHWC

The torch-side naming follows the reference module code
(lvae/models/{qresvae,qarv,rd}/model.py and lvae/models/common.py),
including its 'downsapmle' spelling.
"""
import numpy as np

from lvae_tpu.models import common
from lvae_tpu.models.qresvae import model as qres
from lvae_tpu.models.qarv import model as qarv
from lvae_tpu.models.rd import model as rd


# -------------------------------------------------------------- transforms

def t_conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def t_convT(w):
    # torch ConvTranspose2d (I, O, kh, kw); flax ConvTranspose expects the
    # kernel in conv orientation -> transpose + spatial flip
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def t_dense(w):
    return np.transpose(w, (1, 0))


def t_flat(w):
    return np.reshape(w, (-1,))


def t_raw(w):
    return np.asarray(w)


def t_bias_nhwc(w):  # (1,C,1,1) -> (1,1,1,C)
    return np.transpose(w, (0, 2, 3, 1))


# ----------------------------------------------------- per-module key rules

def _conv_rules(our, tk):
    """A single nn.Conv2d at torch prefix tk."""
    return [(our + ('kernel',), tk + '.weight', t_conv),
            (our + ('bias',), tk + '.bias', t_raw)]


def _dense_rules(our, tk):
    return [(our + ('kernel',), tk + '.weight', t_dense),
            (our + ('bias',), tk + '.bias', t_raw)]


def _myconvnext_rules(our, tk):
    """MyConvNeXtBlock <-> timm ConvNeXtBlock (reference qresvae/model.py:162-182)."""
    return (_conv_rules(our + ('conv_dw',), tk + '.conv_dw')
            + [(our + ('norm', 'scale'), tk + '.norm.weight', t_raw),
               (our + ('norm', 'bias'), tk + '.norm.bias', t_raw)]
            + _dense_rules(our + ('mlp', 'fc1'), tk + '.mlp.fc1')
            + _dense_rules(our + ('mlp', 'fc2'), tk + '.mlp.fc2')
            + [(our + ('gamma',), tk + '.gamma', t_flat)])


def _adaln_rules(our, tk):
    """ConvNeXtBlockAdaLN (reference common.py:110-161): norm has no affine;
    the embedding layer is Sequential(GELU, Linear, Unflatten) -> index 1."""
    return (_conv_rules(our + ('conv_dw',), tk + '.conv_dw')
            + _dense_rules(our + ('embedding_layer',), tk + '.embedding_layer.1')
            + _dense_rules(our + ('mlp', 'fc1'), tk + '.mlp.fc1')
            + _dense_rules(our + ('mlp', 'fc2'), tk + '.mlp.fc2')
            + [(our + ('gamma',), tk + '.gamma', t_flat)])


def _vdblock_rules(our, tk):
    out = []
    for c in ('c1', 'c2', 'c3', 'c4'):
        out += _conv_rules(our + (c,), tk + '.' + c)
    return out


def block_rules(block, our, tk):
    """Dispatch on our block class; `our` is the flax path tuple prefix,
    `tk` is the torch key prefix."""
    if isinstance(block, common.patch_downsample):
        return _conv_rules(our + ('conv',), tk)
    if isinstance(block, common.patch_upsample):
        return _conv_rules(our + ('conv',), tk + '.0')
    if isinstance(block, common.deconv):
        return [(our + ('conv', 'kernel'), tk + '.weight', t_convT),
                (our + ('conv', 'bias'), tk + '.bias', t_raw)]
    if isinstance(block, (common.upsample_nearest, common.SetKey,
                          common.CompressionStopFlag)):
        return []
    if isinstance(block, common.MyConvNeXtPatchDown):
        return (_myconvnext_rules(our + ('block',), tk)
                + _conv_rules(our + ('downsample', 'conv'), tk + '.downsapmle'))
    if isinstance(block, common.MyConvNeXtBlock):
        return _myconvnext_rules(our, tk)
    if isinstance(block, rd.ConvNeXtAdaLNPatchDown):
        return (_adaln_rules(our + ('block',), tk)
                + _conv_rules(our + ('downsample', 'conv'), tk + '.downsapmle'))
    if isinstance(block, common.ConvNeXtBlockAdaLN):
        return _adaln_rules(our, tk)
    if isinstance(block, qres.QLatentBlock):
        return (_myconvnext_rules(our + ('resnet_front',), tk + '.resnet_front')
                + _myconvnext_rules(our + ('resnet_end',), tk + '.resnet_end')
                + _vdblock_rules(our + ('posterior',), tk + '.posterior')
                + _vdblock_rules(our + ('prior',), tk + '.prior')
                + _conv_rules(our + ('z_proj_0',), tk + '.z_proj.0')
                + _conv_rules(our + ('z_proj_1',), tk + '.z_proj.2'))
    if isinstance(block, qarv.VRLVBlockSmall):
        return (_adaln_rules(our + ('resnet_front',), tk + '.resnet_front')
                + _adaln_rules(our + ('resnet_end',), tk + '.resnet_end')
                + _adaln_rules(our + ('posterior2',), tk + '.posterior2')
                + _conv_rules(our + ('post_merge',), tk + '.post_merge')
                + _conv_rules(our + ('posterior',), tk + '.posterior')
                + _conv_rules(our + ('z_proj',), tk + '.z_proj')
                + _conv_rules(our + ('prior',), tk + '.prior'))
    if isinstance(block, (qarv.VRLVBlockBase, rd.LatentVariableBlock)):
        return (_adaln_rules(our + ('resnet_front',), tk + '.resnet_front')
                + _adaln_rules(our + ('resnet_end',), tk + '.resnet_end')
                + _adaln_rules(our + ('posterior0',), tk + '.posterior0')
                + _adaln_rules(our + ('posterior1',), tk + '.posterior1')
                + _adaln_rules(our + ('posterior2',), tk + '.posterior2')
                + _conv_rules(our + ('post_merge',), tk + '.post_merge')
                + _conv_rules(our + ('posterior',), tk + '.posterior')
                + _conv_rules(our + ('z_proj',), tk + '.z_proj')
                + _conv_rules(our + ('prior',), tk + '.prior'))
    raise NotImplementedError(f'no porting rules for {type(block).__name__}')


def build_key_map(model):
    """List of (flax path tuple, torch key, transform) covering all params."""
    net = model.net
    rules = []
    if isinstance(net, qres.HierarchicalVAENet):
        enc_t, dec_t = 'encoder.enc_blocks.{}', 'decoder.dec_blocks.{}'
        rules.append((('bias',), 'decoder.bias', t_bias_nhwc))
        if isinstance(net.out_net, qres.GaussianNLLOutputNet):
            rules += _conv_rules(('out_net', 'conv_mean', 'conv'),
                                 'out_net.conv_mean.0')
            rules += _conv_rules(('out_net', 'conv_scale', 'conv'),
                                 'out_net.conv_scale.0')
    elif isinstance(net, (qarv.VariableRateLossyVAENet, rd.RDVAENet)):
        enc_t, dec_t = 'encoder.enc_blocks.{}', 'dec_blocks.{}'
        rules.append((('bias',), 'bias', t_bias_nhwc))
        rules += _dense_rules(('lmb_embed_0',), 'lmb_embedding.0')
        rules += _dense_rules(('lmb_embed_1',), 'lmb_embedding.2')
    else:
        raise NotImplementedError(type(net).__name__)

    for i, b in enumerate(net.enc_blocks):
        rules += block_rules(b, (f'enc_blocks_{i}',), enc_t.format(i))
    for i, b in enumerate(net.dec_blocks):
        rules += block_rules(b, (f'dec_blocks_{i}',), dec_t.format(i))
    return rules


def convert_state_dict(model, torch_sd: dict):
    """Convert a {torch key: numpy array} dict into this model's param tree.
    Raises if any of our parameters has no source or a shape mismatch."""
    import jax

    rules = build_key_map(model)
    by_path = {tuple(path): (tk, fn) for path, tk, fn in rules}

    flat = {}
    missing = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(model.params):
        key = tuple(str(getattr(k, 'key', getattr(k, 'idx', k))) for k in path)
        if key not in by_path:
            missing.append('/'.join(key))
            continue
        tk, fn = by_path[key]
        if tk not in torch_sd:
            raise KeyError(f'torch checkpoint missing key {tk} '
                           f'(for parameter {"/".join(key)})')
        arr = fn(np.asarray(torch_sd[tk])).astype(np.float32)
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(f'shape mismatch for {"/".join(key)} <- {tk}: '
                             f'{arr.shape} vs {leaf.shape}')
        flat[key] = arr
    if missing:
        raise KeyError(f'no porting rule covers parameters: {missing[:10]}'
                       f'{"..." if len(missing) > 10 else ""}')

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (str(k),)) for k, v in tree.items()}
        return flat[prefix]

    return rebuild(jax.device_get(model.params))


def load_torch_checkpoint(model, path):
    """Load a reference .pt checkpoint file and convert it."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('model', ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()
          if hasattr(v, 'detach')}
    return convert_state_dict(model, sd)

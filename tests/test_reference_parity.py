"""Numerical parity vs the ACTUAL reference implementation.

Imports the real torch model code from /root/reference/lvae (with ~300-line
stubs for the uninstalled timm/compressai/torchvision deps, see
ref_torch_stubs.py), builds the production zoo models with RANDOMIZED
weights, exports state_dict(), ports it through lvae_tpu/models/port.py, and
asserts per-block activations and end-to-end outputs match.

This validates, against the reference's real module layout:
  * every porting rule in port.py (key names, transposes, submodule indexing)
  * every block's forward math (AdaLN, VDBlock, ConvNeXt, priors/posteriors,
    eval-time residual quantization + discretized-Gaussian likelihood,
    linear_sqrt/std_smooth, lambda embedding, output heads)
  * the model graphs (feature taps, seeds, blockchains) of all 3 families.

Weights are randomized (N(0, 0.1), all parameters incl. zero-inits) so that
transpose/indexing errors cannot hide behind zero tensors.

Reference paths exercised: qresvae/model.py:210-360 & 457-569,
qarv/model.py:19-363, rd/model.py:27-445, common.py:8-161.
"""
import math
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))
import ref_torch_stubs

ref_torch_stubs.install()

import lvae as ref_lvae  # noqa: E402  (the actual reference package)
import lvae.models.qresvae.model as ref_qres  # noqa: E402
import lvae.models.common as ref_common  # noqa: E402

import lvae_tpu  # noqa: E402
from lvae_tpu.models import port  # noqa: E402


# ------------------------------------------------------------------ helpers

def nhwc(t):
    return np.ascontiguousarray(
        t.detach().cpu().numpy().transpose(0, 2, 3, 1)).astype(np.float32)


def randomize_(module, seed):
    """All parameters randomized — including zero-inits, so that a wrong
    transpose/key cannot hide behind a zero tensor. Matrix/conv weights get
    fan-in-scaled std (keeps the unnormalized VDBlock stacks from blowing up
    through 50 blocks); 1-D params (biases, LN affine, gamma) get N(0, 0.2)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            if p.ndim >= 2:
                fan_in = p.numel() // p.shape[0]
                std = 1.0 / math.sqrt(max(fan_in, 1))
            else:
                std = 0.2
            p.copy_(torch.empty_like(p).normal_(0.0, std, generator=g))


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, f'{a.shape} vs {b.shape}'
    denom = max(float(np.abs(a).max()), 1e-3)
    return float(np.abs(a - b).max()) / denom


class ErrLog:
    def __init__(self):
        self.worst = {}

    def check(self, name, ref, got, tol):
        e = rel_err(ref, got)
        key = name.split('[')[0]
        self.worst[key] = max(self.worst.get(key, 0.0), e)
        assert e < tol, f'{name}: rel err {e:.3e} exceeds tol {tol:.0e}'

    def summary(self):
        return ' '.join(f'{k}={v:.2e}' for k, v in sorted(self.worst.items()))


def to_j(a):
    import jax.numpy as jnp
    return jnp.asarray(a)


def export_sd(tm):
    return {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}


def fixed_image(hw=64, seed=3):
    rng = np.random.default_rng(seed)
    im = rng.integers(0, 256, (1, 3, hw, hw)).astype(np.float32) / 255.0
    return torch.from_numpy(im)


# ------------------------------------------------------- torch-side walkers

@torch.no_grad()
def torch_walk_qres(tm, im):
    """Mirrors HierarchicalVAE.forward in eval mode
    (reference: qresvae/model.py:379-391, 517-569) while recording every
    block's inputs/outputs."""
    rec = {}
    x = tm.preprocess_input(im)
    enc_features = tm.encoder(x)
    rec['enc_features'] = {int(k): nhwc(v) for k, v in enc_features.items()}
    min_res = min(enc_features.keys())
    feature = tm.decoder.bias.expand(enc_features[min_res].shape)
    blocks = []
    for block in tm.decoder.dec_blocks:
        fin = feature
        if hasattr(block, 'forward_train'):
            f_enc = enc_features[int(feature.shape[2])]
            f_mid, pm, plogv = block.transform_prior(feature)
            pv = torch.exp(plogv)
            qm = block.posterior(torch.cat([f_mid, f_enc], dim=1))
            feature, stats = block.forward_train(fin, f_enc, get_latents=True)
            blocks.append(dict(
                kind='latent', fin=nhwc(fin), enc=nhwc(f_enc),
                f_mid=nhwc(f_mid), pm=nhwc(pm), pv=nhwc(pv), qm=nhwc(qm),
                z=nhwc(stats['z']), kl=nhwc(stats['kl']), fout=nhwc(feature)))
        else:
            feature = block(feature)
            blocks.append(dict(kind='plain', fin=nhwc(fin), fout=nhwc(feature)))
    rec['blocks'] = blocks
    rec['feature'] = nhwc(feature)
    if isinstance(tm.out_net, ref_qres.GaussianNLLOutputNet):
        x_tgt = tm.preprocess_target(im)
        nll, p_mean = tm.out_net.forward_loss(feature, x_tgt)
        rec['out'] = dict(nll=nll.numpy(), p_mean=nhwc(p_mean),
                          x_tgt=nhwc(x_tgt))
    else:
        rec['x_hat'] = nhwc(feature)
    return rec


@torch.no_grad()
def torch_walk_qarv(tm, im, lmb):
    """Mirrors VariableRateLossyVAE.forward_end2end in eval mode
    (reference: qarv/model.py:294-315) with per-block records."""
    rec = {}
    x = tm.preprocess_input(im)
    lmb_t = tm.expand_to_tensor(lmb, n=im.shape[0])
    emb = tm._get_lmb_embedding(lmb_t, n=im.shape[0])
    rec['emb'] = emb.numpy()
    _, enc_features = tm.encoder(x, emb)
    rec['enc_features'] = {k: nhwc(v) for k, v in enc_features.items()}
    nB, _, xH, xW = x.shape
    feature = tm.get_bias((nB, xH // tm.max_stride, xW // tm.max_stride))
    blocks = []
    for block in tm.dec_blocks:
        fin = feature
        if getattr(block, 'is_latent_block', False):
            f_enc = enc_features[block.enc_key]
            f_mid, pm, pv = block.transform_prior(feature, emb)
            qm = block.transform_posterior(f_mid, f_enc, emb)
            feature, stats = block(fin, emb, enc_feature=f_enc,
                                   mode='trainval', get_latent=True)
            z = stats['z']
            blocks.append(dict(
                kind='latent', enc_key=block.enc_key, fin=nhwc(fin),
                enc=nhwc(f_enc), f_mid=nhwc(f_mid), pm=nhwc(pm), pv=nhwc(pv),
                qm=nhwc(qm), z=nhwc(z), kl=nhwc(stats['kl']),
                fout=nhwc(feature)))
        elif isinstance(block, ref_common.CompresionStopFlag):
            blocks.append(dict(kind='stop'))
        else:
            feature = block(feature, emb) \
                if getattr(block, 'requires_embedding', False) \
                else block(feature)
            blocks.append(dict(kind='plain', fin=nhwc(fin), fout=nhwc(feature)))
    rec['blocks'] = blocks
    rec['x_hat'] = nhwc(feature)
    return rec


@torch.no_grad()
def torch_walk_rd(tm, im, lmb):
    """RD model, deterministic variant: z := qm injected at every latent
    block (the reference eval path samples z ~ q, rd/model.py:124-137; pinning
    z = posterior mean makes the walk reproducible on both sides)."""
    rec = {}
    x = tm.preprocess_input(im)
    lmb_t = tm.expand_to_tensor(lmb, n=im.shape[0])
    emb = tm._get_lmb_embedding(lmb_t, n=im.shape[0])
    rec['emb'] = emb.numpy()
    enc_features = tm.encoder(x, emb)
    rec['enc_features'] = {int(k): nhwc(v) for k, v in enc_features.items()}
    min_res = min(enc_features.keys())
    nB = x.shape[0]
    feature = tm.get_bias((nB, min_res, min_res))
    blocks = []
    for block in tm.dec_blocks:
        fin = feature
        if getattr(block, 'is_latent_block', False):
            f_enc = enc_features[int(feature.shape[2])]
            f_mid, pm, pv = block.transform_prior(feature, emb)
            qm, qv = block.transform_posterior(f_mid, f_enc, emb)
            from lvae.models.rd.model import gaussian_kl as ref_gaussian_kl
            kl = ref_gaussian_kl(qm, qv, pm, pv)
            z = qm
            feature = block.resnet_end(f_mid + block.z_proj(z), emb)
            blocks.append(dict(
                kind='latent', fin=nhwc(fin), enc=nhwc(f_enc),
                f_mid=nhwc(f_mid), pm=nhwc(pm), pv=nhwc(pv), qm=nhwc(qm),
                qv=nhwc(qv), z=nhwc(z), kl=nhwc(kl), fout=nhwc(feature)))
        else:
            feature = block(feature, emb) \
                if getattr(block, 'requires_embedding', False) \
                else block(feature)
            blocks.append(dict(kind='plain', fin=nhwc(fin), fout=nhwc(feature)))
    rec['blocks'] = blocks
    rec['x_hat'] = nhwc(feature)
    return rec


# --------------------------------------------------------- jax-side replays

TOL_BLOCK = 3e-4      # isolated per-block replay (identical inputs)
TOL_KL = 2e-3         # log-of-probability amplifies near the 1e-9 clamp
TOL_CHAIN = 5e-3      # full-chain outputs (f32 noise accumulates)


def check_discrete_kl(log, name, kl_ref, probs_got):
    """Eval-time KL = -log(discretized-Gaussian likelihood). In the deep
    tails (prob at the 1e-9 clamp) f32 erf cancellation differs between
    torch and XLA by whole factors, which -log turns into ~1e-2 rel noise —
    so compare the likelihoods absolutely, and the KL only on the region
    that actually carries rate (prob > 1e-5)."""
    kl_ref = np.asarray(kl_ref, np.float64)
    p_ref = np.exp(-kl_ref)
    p_got = np.asarray(probs_got, np.float64)
    log.check(name + ':prob', p_ref, p_got, 3e-6)
    # per-element KL where the mass (and therefore the rate) actually is:
    # below p~1e-3, a few-ulp erf difference is already >0.1% of p
    mask = p_ref > 1e-3
    kl_got = -np.log(np.maximum(p_got, 1e-300))
    err = float((np.abs(kl_ref - kl_got) * mask).max())
    key = name.split('[')[0]
    log.worst[key] = max(log.worst.get(key, 0.0), err)
    assert err < TOL_KL, f'{name}: masked KL abs err {err:.3e}'
    # the total rate of the block must agree to 0.1% on the mass region
    # (p <= 1e-5 elements — which only exist with random weights — sit where
    # f32 erf cancellation gives factor-level noise in BOTH impls; measured:
    # all error lives in p in (1e-9, 1e-5], see round-2 STATUS notes)
    m2 = p_ref > 1e-5
    tot_ref, tot_got = float((kl_ref * m2).sum()), float((kl_got * m2).sum())
    rerr = abs(tot_ref - tot_got) / max(abs(tot_ref), 1.0)
    log.worst[key + '_sum'] = max(log.worst.get(key + '_sum', 0.0), rerr)
    assert rerr < 1e-3, f'{name}: mass-region total KL rel err {rerr:.3e}'


def replay_qres(mm, rec, im_j, log):
    import lvae_tpu.models.entropy_coding as ec
    import jax.numpy as jnp
    net, params = mm.net, mm.params

    enc_j = net.apply({'params': params}, im_j,
                      method=lambda n, im: n.encode(n.preprocess_input(im)))
    for key, ref_f in rec['enc_features'].items():
        log.check(f'enc[{key}]', ref_f, np.asarray(enc_j[key]), TOL_BLOCK)

    n_sym_mismatch = 0
    for k, block in enumerate(net.dec_blocks):
        bp = params.get(f'dec_blocks_{k}', {})
        r = rec['blocks'][k]
        if r['kind'] == 'latent':
            f_mid, pm, pv, _ = block.apply({'params': bp}, to_j(r['fin']),
                                           method='prior_stage')
            log.check(f'f_mid[{k}]', r['f_mid'], np.asarray(f_mid), TOL_BLOCK)
            log.check(f'pm[{k}]', r['pm'], np.asarray(pm), TOL_BLOCK)
            log.check(f'pv[{k}]', r['pv'], np.asarray(pv), TOL_BLOCK)
            qm = block.apply({'params': bp}, to_j(r['f_mid']), to_j(r['enc']),
                             method='posterior_qm')
            log.check(f'qm[{k}]', r['qm'], np.asarray(qm), TOL_BLOCK)
            # symbols: ties at exact .5 residuals may flip between impls
            s_ref = np.round(r['qm'] - r['pm'])
            s_got = np.asarray(jnp.round(qm - to_j(r['pm'])))
            n_sym_mismatch += int((s_ref != s_got).sum())
            # eval-time kl from the torch z (isolated)
            probs = ec.discrete_likelihood(to_j(r['z']), to_j(r['pv']),
                                           to_j(r['pm']),
                                           block.eval_scale_bound)
            check_discrete_kl(log, f'kl[{k}]', r['kl'], np.asarray(probs))
            fout = block.apply({'params': bp}, to_j(r['f_mid']), to_j(r['z']),
                               method='_fuse')
            log.check(f'fout[{k}]', r['fout'], np.asarray(fout), TOL_BLOCK)
        else:
            fout = block.apply({'params': bp}, to_j(r['fin'])) \
                if bp else block(to_j(r['fin']))
            log.check(f'plain[{k}]', r['fout'], np.asarray(fout), TOL_BLOCK)
    return n_sym_mismatch


def replay_qarv(mm, rec, im_j, lmb, log):
    import lvae_tpu.models.entropy_coding as ec
    import jax.numpy as jnp
    net, params = mm.net, mm.params
    lmb_j = jnp.full((1,), float(lmb), jnp.float32)

    emb_j = net.apply({'params': params}, lmb_j, method='get_lmb_embedding')
    log.check('emb', rec['emb'], np.asarray(emb_j), TOL_BLOCK)
    emb_j = to_j(rec['emb'])

    enc_j = net.apply(
        {'params': params}, im_j, emb_j,
        method=lambda n, im, e: n.encode(n.preprocess_input(im), e)[1])
    for key, ref_f in rec['enc_features'].items():
        log.check(f'enc[{key}]', ref_f, np.asarray(enc_j[key]), TOL_BLOCK)

    n_sym_mismatch = 0
    for k, block in enumerate(net.dec_blocks):
        bp = params.get(f'dec_blocks_{k}', {})
        r = rec['blocks'][k]
        if r['kind'] == 'latent':
            f_mid, pm, pv, _ = block.apply({'params': bp}, to_j(r['fin']),
                                           emb_j, method='prior_stage')
            log.check(f'f_mid[{k}]', r['f_mid'], np.asarray(f_mid), TOL_BLOCK)
            log.check(f'pm[{k}]', r['pm'], np.asarray(pm), TOL_BLOCK)
            log.check(f'pv[{k}]', r['pv'], np.asarray(pv), TOL_BLOCK)
            qm = block.apply({'params': bp}, to_j(r['f_mid']), to_j(r['enc']),
                             emb_j, method='posterior_qm')
            log.check(f'qm[{k}]', r['qm'], np.asarray(qm), TOL_BLOCK)
            s_ref = np.round(r['qm'] - r['pm'])
            s_got = np.asarray(jnp.round(qm - to_j(r['pm'])))
            n_sym_mismatch += int((s_ref != s_got).sum())
            probs = ec.discrete_likelihood(to_j(r['z']), to_j(r['pv']),
                                           to_j(r['pm']),
                                           block.eval_scale_bound)
            check_discrete_kl(log, f'kl[{k}]', r['kl'], np.asarray(probs))
            fout = block.apply({'params': bp}, to_j(r['f_mid']), to_j(r['z']),
                               emb_j, method='_fuse')
            log.check(f'fout[{k}]', r['fout'], np.asarray(fout), TOL_BLOCK)
        elif r['kind'] == 'stop':
            continue
        else:
            if getattr(block, 'requires_embedding', False):
                fout = block.apply({'params': bp}, to_j(r['fin']), emb_j)
            elif bp:
                fout = block.apply({'params': bp}, to_j(r['fin']))
            else:
                fout = block(to_j(r['fin']))
            log.check(f'plain[{k}]', r['fout'], np.asarray(fout), TOL_BLOCK)
    return n_sym_mismatch


def replay_rd(mm, rec, im_j, lmb, log):
    import jax.numpy as jnp
    from lvae_tpu.models.rd.model import gaussian_kl
    net, params = mm.net, mm.params
    lmb_j = jnp.full((1,), float(lmb), jnp.float32)

    emb_j = net.apply({'params': params}, lmb_j, method='get_lmb_embedding')
    log.check('emb', rec['emb'], np.asarray(emb_j), TOL_BLOCK)
    emb_j = to_j(rec['emb'])

    enc_j = net.apply(
        {'params': params}, im_j, emb_j,
        method=lambda n, im, e: n.encode((im + n.im_shift) * n.im_scale, e))
    for key, ref_f in rec['enc_features'].items():
        log.check(f'enc[{key}]', ref_f, np.asarray(enc_j[key]), TOL_BLOCK)

    for k, block in enumerate(net.dec_blocks):
        bp = params.get(f'dec_blocks_{k}', {})
        r = rec['blocks'][k]
        if r['kind'] == 'latent':
            f_mid, pm, pv = block.apply({'params': bp}, to_j(r['fin']), emb_j,
                                        method='transform_prior')
            log.check(f'f_mid[{k}]', r['f_mid'], np.asarray(f_mid), TOL_BLOCK)
            log.check(f'pm[{k}]', r['pm'], np.asarray(pm), TOL_BLOCK)
            log.check(f'pv[{k}]', r['pv'], np.asarray(pv), TOL_BLOCK)
            qm, qv = block.apply({'params': bp}, to_j(r['f_mid']),
                                 to_j(r['enc']), emb_j,
                                 method='transform_posterior')
            log.check(f'qm[{k}]', r['qm'], np.asarray(qm), TOL_BLOCK)
            log.check(f'qv[{k}]', r['qv'], np.asarray(qv), TOL_BLOCK)
            kl = gaussian_kl(to_j(r['qm']), to_j(r['qv']),
                             to_j(r['pm']), to_j(r['pv']))
            log.check(f'kl[{k}]', r['kl'], np.asarray(kl), TOL_KL)
            fout = block.apply(
                {'params': bp}, to_j(r['f_mid']), to_j(r['z']), emb_j,
                method=lambda blk, f, z, e: blk.resnet_end(
                    f + blk.z_proj(z), e))
            log.check(f'fout[{k}]', r['fout'], np.asarray(fout), TOL_BLOCK)
        else:
            if getattr(block, 'requires_embedding', False):
                fout = block.apply({'params': bp}, to_j(r['fin']), emb_j)
            elif bp:
                fout = block.apply({'params': bp}, to_j(r['fin']))
            else:
                fout = block(to_j(r['fin']))
            log.check(f'plain[{k}]', r['fout'], np.asarray(fout), TOL_BLOCK)
    return 0


# -------------------------------------------------------------------- tests

def _port(name, ref_kwargs, my_kwargs, seed):
    tm = ref_lvae.get_model(name, **ref_kwargs)
    randomize_(tm, seed)
    tm.eval()
    mm = lvae_tpu.get_model(name, **my_kwargs)
    n_torch = sum(p.numel() for p in tm.parameters())
    import jax
    n_mine = sum(int(np.prod(l.shape))
                 for l in jax.tree_util.tree_leaves(mm.params))
    assert n_torch == n_mine, f'param count {n_torch} (torch) != {n_mine}'
    mm.params = port.convert_state_dict(mm, export_sd(tm))
    return tm, mm


@pytest.mark.parametrize('name,kwargs', [
    ('qres34m', {'lmb': 32}),
    ('qres17m', {'lmb': 8}),
])
def test_parity_qres(name, kwargs):
    tm, mm = _port(name, kwargs, kwargs, seed=12)
    im = fixed_image(64)
    rec = torch_walk_qres(tm, im)
    log = ErrLog()
    n_mis = replay_qres(mm, rec, to_j(nhwc(im)), log)
    assert n_mis == 0, f'{n_mis} rounding-tie symbol mismatches'

    # full chain through MY graph end-to-end (loose: f32 noise accumulates)
    out = mm.net.apply({'params': mm.params}, to_j(nhwc(im)), False, False,
                       method='forward',
                       rngs={'noise': __import__('jax').random.PRNGKey(0)})
    _, x_hat, _ = out
    log.check('x_hat_chain', rec['x_hat'], np.asarray(x_hat), TOL_CHAIN)
    print(f'{name} parity: {log.summary()}')


def test_parity_qres_lossless_head():
    tm, mm = _port('qres34m_lossless', {}, {}, seed=13)
    im = fixed_image(64)
    rec = torch_walk_qres(tm, im)
    log = ErrLog()
    n_mis = replay_qres(mm, rec, to_j(nhwc(im)), log)
    assert n_mis == 0
    # NLL output head (reference: qresvae/model.py:16-94), isolated inputs
    nll_j, p_mean_j = mm.net.apply(
        {'params': mm.params}, to_j(rec['feature']), to_j(rec['out']['x_tgt']),
        method=lambda n, f, t: n.out_net.forward_loss(f, t))
    log.check('nll', rec['out']['nll'], np.asarray(nll_j), TOL_KL)
    log.check('p_mean', rec['out']['p_mean'], np.asarray(p_mean_j), TOL_BLOCK)
    print(f'qres34m_lossless parity: {log.summary()}')


def test_parity_qarv_base():
    tm, mm = _port('qarv_base', {}, {}, seed=14)
    im = fixed_image(64)
    lmb = 600.0
    rec = torch_walk_qarv(tm, im, lmb)
    log = ErrLog()
    n_mis = replay_qarv(mm, rec, to_j(nhwc(im)), lmb, log)
    assert n_mis == 0, f'{n_mis} rounding-tie symbol mismatches'

    import jax
    import jax.numpy as jnp
    x_hat, _ = mm.net.apply(
        {'params': mm.params}, to_j(nhwc(im)),
        jnp.full((1,), lmb, jnp.float32), False, False,
        method='forward_end2end', rngs={'noise': jax.random.PRNGKey(0)})
    log.check('x_hat_chain', rec['x_hat'], np.asarray(x_hat), TOL_CHAIN)
    print(f'qarv_base parity: {log.summary()}')


def test_parity_rd_model_base():
    tm, mm = _port('rd_model_base', {}, {}, seed=15)
    im = fixed_image(64)
    lmb = 64.0
    rec = torch_walk_rd(tm, im, lmb)
    log = ErrLog()
    replay_rd(mm, rec, to_j(nhwc(im)), lmb, log)
    print(f'rd_model_base parity: {log.summary()}')

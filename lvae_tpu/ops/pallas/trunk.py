"""Portable trunk kernels: cross-executable bitwise-deterministic stages.

Why this exists (stream portability, round-4): the fused codec's rANS
stream desyncs if the decoder's recomputed prior floats differ from the
encoder's by even one scale-index flip, and round-3 hardware evidence
showed plain XLA f32 convs drift ~1e-5 across program specializations
(runs/fused-divergence-r3.txt) — the latent feedback amplifies that to
O(1) over 9 blocks, so a stream written by the batch-6 executable could
not be decoded by the batch-1 executable. Guard-band snapping cannot fix
this (any unsnapped drift still compounds per block); only EXACT value
agreement works.

The mechanism: a Pallas kernel is compiled by Mosaic in isolation from
the enclosing XLA program. Same kernel source + same block shapes =>
same machine code => bitwise-identical f32 results in ANY enclosing
executable — including when the batch size only enters as a grid
dimension, so the B=1 and B=6 codec binaries run the *same* per-image
instruction stream (verified on hardware: runs/probe-determinism-r4.json).
Every arithmetic op between the trunk's integer junctions (symbols in,
indexes/means out) therefore lives INSIDE these kernels; the XLA level is
restricted to data movement (pad/reshape/transpose/concat), which is
value-exact by construction.

Tiling choices are a deterministic function of (H, W, C) ONLY — never of
batch size or the calling program — so every executable at a given image
shape instantiates byte-identical kernels.

Reference behavior covered: the decode-side prior/fuse chain of
lvae/models/qarv/model.py:19-125 (prior_stage / fuse_stage) and the
ConvNeXt-AdaLN trunk blocks of lvae/models/common.py:110-161.
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _full_spec(*shape):
    """A whole-array block replicated to every grid step."""
    def idx(*_):
        return (0,) * len(shape)
    return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)


def _row_tile(hw):
    """Row-tile size for (HW, C) matmul kernels — function of HW only."""
    if hw <= 512:
        return hw
    for t in (512, 256, 128, 64):
        if hw % t == 0:
            return t
    return hw


def _h_tile(H, W, C):
    """H-tile size for the depthwise/LN kernel — keeps the in-kernel
    window + output under ~4.5 MB of VMEM; function of (H, W, C) only.
    Headroom matters: Mosaic double-buffers the streamed in/out blocks on
    top of this (the r4 probe's monolithic kernel hit the 16 MB scoped
    limit exactly this way)."""
    budget = int(4.5 * 1024 * 1024)
    th = H
    while th > 8 and 2 * th * (W + 8) * C * 4 > budget:
        th //= 2
    assert H % th == 0, (H, th)
    return th


def _erf(x):
    """erf via Abramowitz–Stegun 7.1.26 (max abs err 1.5e-7 ~ f32 eps).

    Mosaic has no erf/erfc lowering (KernelType.TC), so the exact-GELU
    trunk uses this polynomial INSIDE kernels. Determinism is what the
    portable codec needs — every executable runs this same instruction
    sequence; the 1e-7-scale departure from libm erf is invisible next to
    the model's own precision (and the portable stream kind is firewalled
    from legacy streams, fused_base.parse_payload)."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # exact-erf GELU (matches common.gelu to ~1e-7), Mosaic-safe
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _softplus(x):
    # jax.nn.softplus lowers through log1p (no Mosaic lowering); the
    # explicit max/exp/log form is exact to f32 for all inputs of interest
    return jnp.maximum(x, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(x)))


# ---------------------------------------------------------------------------
# lambda embedding (sinusoid + 2-layer MLP), all inside one kernel
# ---------------------------------------------------------------------------

def _emb_kernel(lmb_ref, fr_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                emb_ref, gemb_ref, *, scale):
    lmb = lmb_ref[:]                                     # (B, 1)
    scaled = jnp.log(lmb) * scale
    args = scaled * fr_ref[:]                            # (B, E/2)
    x = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    x = jnp.dot(x, w0_ref[:], preferred_element_type=jnp.float32) + b0_ref[:]
    x = _gelu(x)
    emb = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    emb_ref[:] = emb
    gemb_ref[:] = _gelu(emb)


def emb_mlp(lmb, freqs, w0, b0, w1, b1, sin_period, interpret=False):
    """lmb (B,) -> (emb (B,E), gelu(emb) (B,E)); bitwise-portable."""
    B = lmb.shape[0]
    E = w1.shape[1]
    scale = float(sin_period) / math.log(8192.0)
    kern = functools.partial(_emb_kernel, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[_full_spec(B, 1), _full_spec(1, freqs.shape[1]),
                  _full_spec(w0.shape[0], w0.shape[1]), _full_spec(E),
                  _full_spec(E, E), _full_spec(E)],
        out_specs=(_full_spec(B, E), _full_spec(B, E)),
        out_shape=(jax.ShapeDtypeStruct((B, E), jnp.float32),
                   jax.ShapeDtypeStruct((B, E), jnp.float32)),
        interpret=interpret,
    )(lmb.reshape(B, 1).astype(jnp.float32), freqs, w0, b0, w1, b1)


# ---------------------------------------------------------------------------
# depthwise conv + LayerNorm + AdaLN modulation
# ---------------------------------------------------------------------------

def _dw_ln_mod_kernel(xw_ref, dwk_ref, dwb_ref, ew_ref, eb_ref, gemb_ref,
                      o_ref, *, K, TH, W, C):
    xw = xw_ref[0, 0]                                    # (TH+K-1, W+K-1, C)
    y = jnp.zeros((TH, W, C), jnp.float32) + dwb_ref[:]
    for di in range(K):
        for dj in range(K):
            y = y + xw[di:di + TH, dj:dj + W, :] * dwk_ref[di, dj]
    # LayerNorm over C, eps 1e-6, no affine (common.ConvNeXtBlockAdaLN)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + 1e-6)
    # AdaLN shift/scale from the conditioning embedding (this batch row's
    # gemb block is selected by the grid index map; the ref is (1, 1, E) —
    # Mosaic requires the block's last-two dims to divide (8, 128) or
    # equal the array's, so the batch dim rides as a leading 1)
    e = jnp.dot(gemb_ref[0], ew_ref[:],
                preferred_element_type=jnp.float32)[0] + eb_ref[:]
    shift, scale = e[:C], e[C:]
    o_ref[0] = y * (1.0 + scale) + shift


def dw_ln_mod(x, dwk, dwb, ew, eb, gemb, kernel_size, interpret=False):
    """Depthwise conv(k) + bias + LN + AdaLN modulate.

    x (B,H,W,C); dwk (K,K,C); ew (E,2C); gemb (B,E). Data movement (pad +
    overlapping-window stack) happens in XLA — value-exact; all arithmetic
    is in-kernel."""
    B, H, W, C = x.shape
    K = kernel_size
    p = (K - 1) // 2
    TH = _h_tile(H, W, C)
    nT = H // TH
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    # overlapping H-windows, stacked: (B, nT, TH+2p, W+2p, C)
    if nT == 1:
        xwin = xp[:, None]
    else:
        xwin = jnp.stack(
            [xp[:, i * TH:i * TH + TH + 2 * p] for i in range(nT)], axis=1)
    E = ew.shape[0]
    kern = functools.partial(_dw_ln_mod_kernel, K=K, TH=TH, W=W, C=C)
    return pl.pallas_call(
        kern,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, 1, TH + 2 * p, W + 2 * p, C),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(K, K, C), _full_spec(C),
            _full_spec(E, 2 * C), _full_spec(2 * C),
            # (B, 1, E) so the block's last-two dims (1, E) EQUAL the
            # array's — a (1, E) block over (B, E) is rejected by Mosaic
            # (sublane dim 1 neither divides 8 nor equals B; suite14 r4).
            # The in-kernel block stays shape-(1, E) for every B, which is
            # exactly what cross-executable bit-portability needs.
            pl.BlockSpec((1, 1, E), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        interpret=interpret,
    )(xwin, dwk, dwb, ew, eb, gemb.reshape(B, 1, E))


# ---------------------------------------------------------------------------
# MLP (fc1 -> GELU -> fc2) + layer-scale gamma + residual
# ---------------------------------------------------------------------------

def _mlp_res_kernel(t_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, s_ref,
                    o_ref):
    h = jnp.dot(t_ref[0], w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[:]
    h = _gelu(h)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[0] = s_ref[0] + o * g_ref[:]


def mlp_res(t, w1, b1, w2, b2, gamma, shortcut, interpret=False):
    """shortcut + gamma * fc2(gelu(fc1(t))); t/shortcut (B, HW, C)."""
    B, HW, C = t.shape
    HID = w1.shape[1]
    CO = w2.shape[1]
    TR = _row_tile(HW)
    nT = HW // TR
    return pl.pallas_call(
        _mlp_res_kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TR, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(C, HID), _full_spec(HID),
            _full_spec(HID, CO), _full_spec(CO), _full_spec(CO),
            pl.BlockSpec((1, TR, CO), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TR, CO), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, CO), jnp.float32),
        interpret=interpret,
    )(t, w1, b1, w2, b2, gamma, shortcut)


# ---------------------------------------------------------------------------
# plain dense (1x1 conv): y = x @ w + b
# ---------------------------------------------------------------------------

def _dense_kernel(x_ref, w_ref, b_ref, o_ref):
    o_ref[0] = jnp.dot(x_ref[0], w_ref[:],
                       preferred_element_type=jnp.float32) + b_ref[:]


def dense(x, w, b, interpret=False):
    """x (B, HW, C) @ w (C, CO) + b — the 1x1-conv kernel."""
    B, HW, C = x.shape
    CO = w.shape[1]
    TR = _row_tile(HW)
    nT = HW // TR
    return pl.pallas_call(
        _dense_kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TR, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(C, CO), _full_spec(CO),
        ],
        out_specs=pl.BlockSpec((1, TR, CO), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, CO), jnp.float32),
        interpret=interpret,
    )(x, w, b)


# ---------------------------------------------------------------------------
# prior head: 1x1 conv -> (pm, scale indexes)
# ---------------------------------------------------------------------------

def _prior_kernel(x_ref, w_ref, b_ref, tb_ref, pm_ref, idx_ref, *, Z, act):
    x = _gelu(x_ref[0]) if act else x_ref[0]
    p = jnp.dot(x, w_ref[:],
                preferred_element_type=jnp.float32) + b_ref[:]
    pm, plogv = p[:, :Z], p[:, Z:]
    plogv = _softplus(plogv + 2.3) - 2.3
    pv = jnp.exp(plogv)
    # entropy_coding.build_indexes semantics: count of table entries
    # strictly below the (clamped) scale, capped at the last index.
    # Statically-unrolled compare-accumulate keeps the intermediate at
    # (TR, Z) instead of a (TR, Z, 64) broadcast.
    tb = tb_ref[:]                                       # (S,)
    pv = jnp.maximum(pv, tb[0])
    idx = jnp.zeros(pv.shape, jnp.int32)
    for i in range(tb.shape[0]):
        idx = idx + (tb[i] < pv).astype(jnp.int32)
    pm_ref[0] = pm
    idx_ref[0] = jnp.minimum(idx, tb.shape[0] - 1)


def prior_head(x, w, b, table, act=False, interpret=False):
    """x (B, HW, C) -> pm (B, HW, Z) f32, indexes (B, HW, Z) i32.

    The softplus/exp/compare chain lives in-kernel: the scale index is
    the single most desync-critical integer in the codec. ``act`` applies
    a pre-activation GELU to x (the QRes VDBlock prior's last conv is
    pre-activated: qresvae/model.py QLatentBlock.prior_stage)."""
    B, HW, C = x.shape
    Z = w.shape[1] // 2
    TR = _row_tile(HW)
    nT = HW // TR
    kern = functools.partial(_prior_kernel, Z=Z, act=act)
    return pl.pallas_call(
        kern,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TR, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(C, 2 * Z), _full_spec(2 * Z),
            _full_spec(table.shape[0]),
        ],
        out_specs=(pl.BlockSpec((1, TR, Z), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TR, Z), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, HW, Z), jnp.float32),
                   jax.ShapeDtypeStruct((B, HW, Z), jnp.int32)),
        interpret=interpret,
    )(x, w, b, table)


# ---------------------------------------------------------------------------
# fuse junction: feature += z_proj(symbols + pm)
# ---------------------------------------------------------------------------

def _fuse_kernel(f_ref, s_ref, pm_ref, w_ref, b_ref, o_ref):
    z = s_ref[0].astype(jnp.float32) + pm_ref[0]
    zp = jnp.dot(z, w_ref[:], preferred_element_type=jnp.float32) + b_ref[:]
    o_ref[0] = f_ref[0] + zp


def fuse_zproj(feature, syms, pm, w, b, interpret=False):
    """feature (B,HW,C) + z_proj(syms + pm); syms int32 — the integer
    junction where the decoded stream re-enters the trunk."""
    B, HW, C = feature.shape
    Z = w.shape[0]
    TR = _row_tile(HW)
    nT = HW // TR
    return pl.pallas_call(
        _fuse_kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TR, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, Z), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, Z), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(Z, C), _full_spec(C),
        ],
        out_specs=pl.BlockSpec((1, TR, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), jnp.float32),
        interpret=interpret,
    )(feature, syms, pm, w, b)


# ---------------------------------------------------------------------------
# image finish: clip to [-1,1], rescale to [0,1] — in-kernel so the decoded
# PIXELS are also bitwise-portable across executables. The f16 cast happens
# OUTSIDE the kernel: Mosaic on the deployed libtpu rejects f16 outright
# ("Unsupported type in mosaic dialect: 'f16'", suite14 r4), and a lone
# elementwise f32->f16 convert of identical input bits is itself
# bit-deterministic (IEEE rounding, no accumulation order to vary).
# ---------------------------------------------------------------------------

def _finish_kernel(x_ref, o_ref):
    o_ref[:] = jnp.clip(x_ref[:], -1.0, 1.0) * 0.5 + 0.5


def finish_image(x, interpret=False):
    """x (B,H,W,3) f32 -> (B,H,W,3) f16 in [0,1]."""
    B, H, W, C = x.shape
    n = H * W * C
    assert n % 128 == 0, (H, W, C)
    R = n // 128
    TR = _row_tile(R)
    xf = x.reshape(B, R, 128)
    y = pl.pallas_call(
        _finish_kernel,
        grid=(B, R // TR),
        in_specs=[pl.BlockSpec((1, TR, 128), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TR, 128), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, 128), jnp.float32),
        interpret=interpret,
    )(xf)
    return y.astype(jnp.float16).reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# module-level adapters: flax param pytrees -> kernel calls
# ---------------------------------------------------------------------------

def convnext_adaln(x, bp, gemb, kernel_size, interpret=False):
    """Full ConvNeXtBlockAdaLN via portable kernels.

    x (B,H,W,C); bp = the flax param subtree {conv_dw, embedding_layer,
    mlp{fc1,fc2}, gamma}. Reshapes of the stored weights are pure data
    movement (value-exact at the XLA level)."""
    B, H, W, C = x.shape
    K = kernel_size
    dwk = bp['conv_dw']['kernel'].reshape(K, K, C)
    t = dw_ln_mod(x, dwk, bp['conv_dw']['bias'],
                  bp['embedding_layer']['kernel'],
                  bp['embedding_layer']['bias'], gemb, K,
                  interpret=interpret)
    y = mlp_res(t.reshape(B, H * W, C),
                bp['mlp']['fc1']['kernel'], bp['mlp']['fc1']['bias'],
                bp['mlp']['fc2']['kernel'], bp['mlp']['fc2']['bias'],
                bp['gamma'], x.reshape(B, H * W, C), interpret=interpret)
    return y.reshape(B, H, W, C)


def conv1x1(x, cp, interpret=False):
    """1x1 conv via the dense kernel; cp = {kernel (1,1,C,CO), bias}."""
    B, H, W, C = x.shape
    w = cp['kernel'].reshape(C, -1)
    y = dense(x.reshape(B, H * W, C), w, cp['bias'], interpret=interpret)
    return y.reshape(B, H, W, w.shape[1])


# ===========================================================================
# QRes-VAE portable trunk (round 5): the QRes latent block is built from
# plain ConvNeXt blocks (affine LN, no conditioning), VDVAE-style 4-conv
# bottlenecks with PRE-activation GELUs, and a two-conv z-projection
# (reference: lvae/models/qresvae/model.py:120-360). Same discipline as the
# QARV kernels above: every arithmetic op between the stream's integer
# junctions runs in fixed-block-spec kernels; XLA only moves data.
# ===========================================================================

# ---------------------------------------------------------------------------
# depthwise conv + affine LayerNorm (plain ConvNeXt, common.MyConvNeXtBlock)
# ---------------------------------------------------------------------------

def _dw_lnaff_kernel(xw_ref, dwk_ref, dwb_ref, sc_ref, b_ref, o_ref,
                     *, K, TH, W, C):
    xw = xw_ref[0, 0]                                    # (TH+K-1, W+K-1, C)
    y = jnp.zeros((TH, W, C), jnp.float32) + dwb_ref[:]
    for di in range(K):
        for dj in range(K):
            y = y + xw[di:di + TH, dj:dj + W, :] * dwk_ref[di, dj]
    # LayerNorm over C, eps 1e-6, WITH affine (common.MyConvNeXtBlock)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + 1e-6)
    o_ref[0] = y * sc_ref[:] + b_ref[:]


def dw_ln_affine(x, dwk, dwb, scale, bias, kernel_size, interpret=False):
    """Depthwise conv(k) + bias + affine LN; x (B,H,W,C), dwk (K,K,C)."""
    B, H, W, C = x.shape
    K = kernel_size
    p = (K - 1) // 2
    TH = _h_tile(H, W, C)
    nT = H // TH
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    if nT == 1:
        xwin = xp[:, None]
    else:
        xwin = jnp.stack(
            [xp[:, i * TH:i * TH + TH + 2 * p] for i in range(nT)], axis=1)
    kern = functools.partial(_dw_lnaff_kernel, K=K, TH=TH, W=W, C=C)
    return pl.pallas_call(
        kern,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, 1, TH + 2 * p, W + 2 * p, C),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(K, K, C), _full_spec(C),
            _full_spec(C), _full_spec(C),
        ],
        out_specs=pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        interpret=interpret,
    )(xwin, dwk, dwb, scale, bias)


def convnext_plain(x, bp, kernel_size, interpret=False):
    """Full common.MyConvNeXtBlock via portable kernels.

    x (B,H,W,C); bp = {conv_dw, norm{scale,bias}, mlp{fc1,fc2}, gamma}."""
    B, H, W, C = x.shape
    K = kernel_size
    dwk = bp['conv_dw']['kernel'].reshape(K, K, C)
    t = dw_ln_affine(x, dwk, bp['conv_dw']['bias'],
                     bp['norm']['scale'], bp['norm']['bias'], K,
                     interpret=interpret)
    y = mlp_res(t.reshape(B, H * W, C),
                bp['mlp']['fc1']['kernel'], bp['mlp']['fc1']['bias'],
                bp['mlp']['fc2']['kernel'], bp['mlp']['fc2']['bias'],
                bp['gamma'], x.reshape(B, H * W, C), interpret=interpret)
    return y.reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# pre-activated dense: y = (gelu(x)|x) @ w + b  (VDBlock 1x1 convs)
# ---------------------------------------------------------------------------

def _dense_act_kernel(x_ref, w_ref, b_ref, o_ref, *, act):
    x = _gelu(x_ref[0]) if act else x_ref[0]
    o_ref[0] = jnp.dot(x, w_ref[:],
                       preferred_element_type=jnp.float32) + b_ref[:]


def dense_act(x, w, b, act=True, interpret=False):
    """x (B, HW, C) -> (gelu(x)|x) @ w (C, CO) + b."""
    B, HW, C = x.shape
    CO = w.shape[1]
    TR = _row_tile(HW)
    nT = HW // TR
    kern = functools.partial(_dense_act_kernel, act=act)
    return pl.pallas_call(
        kern,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TR, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(C, CO), _full_spec(CO),
        ],
        out_specs=pl.BlockSpec((1, TR, CO), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, CO), jnp.float32),
        interpret=interpret,
    )(x, w, b)


# ---------------------------------------------------------------------------
# K x K conv: taps stacked at the XLA level (pure data movement), each tap
# one 2-D matmul accumulated into the revisited output block. TPU grids
# iterate sequentially with taps innermost, so the accumulation order is
# fixed by the kernel instantiation — bitwise-identical in any executable.
# ---------------------------------------------------------------------------

def _conv_taps_kernel(x_ref, w_ref, b_ref, o_ref, *, act):
    k = pl.program_id(2)
    x = _gelu(x_ref[0, 0]) if act else x_ref[0, 0]
    y = jnp.dot(x, w_ref[0], preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _init():
        o_ref[0] = y + b_ref[:]

    @pl.when(k > 0)
    def _acc():
        o_ref[0] = o_ref[0] + y


def conv_kxk_act(x, wk, b, act=True, interpret=False):
    """'same' K x K conv with optional pre-activation GELU.

    x (B,H,W,Ci), wk (K,K,Ci,Co) [flax nn.Conv layout] -> (B,H,W,Co).
    The GELU is recomputed per tap on the shifted windows — redundant
    FLOPs, but identical instructions in every executable (what the
    portable codec needs)."""
    B, H, W, Ci = x.shape
    K = wk.shape[0]
    Co = wk.shape[-1]
    p = (K - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    taps = jnp.stack(
        [xp[:, di:di + H, dj:dj + W, :].reshape(B, H * W, Ci)
         for di in range(K) for dj in range(K)], axis=1)   # (B, K², HW, Ci)
    TR = _row_tile(H * W)
    nT = (H * W) // TR
    kern = functools.partial(_conv_taps_kernel, act=act)
    y = pl.pallas_call(
        kern,
        grid=(B, nT, K * K),
        in_specs=[
            pl.BlockSpec((1, 1, TR, Ci), lambda b, i, k: (b, k, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ci, Co), lambda b, i, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(Co),
        ],
        out_specs=pl.BlockSpec((1, TR, Co), lambda b, i, k: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * W, Co), jnp.float32),
        interpret=interpret,
    )(taps, wk.reshape(K * K, Ci, Co), b)
    return y.reshape(B, H, W, Co)


# ---------------------------------------------------------------------------
# QRes fuse junction: z = syms + pm -> z_proj_0 -> gelu -> z_proj_1 -> + f
# ---------------------------------------------------------------------------

def _zadd_dense_kernel(s_ref, pm_ref, w_ref, b_ref, o_ref):
    z = s_ref[0].astype(jnp.float32) + pm_ref[0]
    o_ref[0] = jnp.dot(z, w_ref[:],
                       preferred_element_type=jnp.float32) + b_ref[:]


def zadd_dense(syms, pm, w, b, interpret=False):
    """(syms + pm) @ w + b; syms (B, HW, Z) int32 — the integer junction."""
    B, HW, Z = syms.shape
    CO = w.shape[1]
    TR = _row_tile(HW)
    nT = HW // TR
    return pl.pallas_call(
        _zadd_dense_kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TR, Z), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, Z), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(Z, CO), _full_spec(CO),
        ],
        out_specs=pl.BlockSpec((1, TR, CO), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, CO), jnp.float32),
        interpret=interpret,
    )(syms, pm, w, b)


def _zadd_kernel(s_ref, pm_ref, o_ref):
    o_ref[0] = s_ref[0].astype(jnp.float32) + pm_ref[0]


def zadd(syms, pm, interpret=False):
    """syms + pm as an array (feeds the 3x3 z_proj_0 tap conv)."""
    B, HW, Z = syms.shape
    TR = _row_tile(HW)
    nT = HW // TR
    return pl.pallas_call(
        _zadd_kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TR, Z), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, Z), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TR, Z), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, Z), jnp.float32),
        interpret=interpret,
    )(syms, pm)


def _res_dense_act_kernel(f_ref, t_ref, w_ref, b_ref, o_ref):
    o_ref[0] = f_ref[0] + jnp.dot(
        _gelu(t_ref[0]), w_ref[:],
        preferred_element_type=jnp.float32) + b_ref[:]


def res_dense_act(f, t, w, b, interpret=False):
    """f + gelu(t) @ w + b — the z_proj_1 + residual join."""
    B, HW, C = f.shape
    Ci = t.shape[2]
    TR = _row_tile(HW)
    nT = HW // TR
    return pl.pallas_call(
        _res_dense_act_kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TR, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, Ci), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(Ci, C), _full_spec(C),
        ],
        out_specs=pl.BlockSpec((1, TR, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), jnp.float32),
        interpret=interpret,
    )(f, t, w, b)


# ---------------------------------------------------------------------------
# module-level adapters for the QRes latent block stages
# ---------------------------------------------------------------------------

def qres_prior_head(f_mid, vp, use_3x3, table, interpret=False):
    """The QLatentBlock prior: VDBlock(hid, 2Z, pre-act GELUs, residual
    False) -> split -> softplus floor -> scale indexes.

    f_mid (B,H,W,C); vp = the 'prior' param subtree {c1,c2,c3,c4}.
    Returns (pm (B,H,W,Z) f32, indexes (B,H,W,Z) i32).
    Reference: qresvae/model.py QLatentBlock.prior_stage."""
    B, H, W, C = f_mid.shape
    hid = vp['c1']['bias'].shape[0]
    t = dense_act(f_mid.reshape(B, H * W, C),
                  vp['c1']['kernel'].reshape(C, hid), vp['c1']['bias'],
                  act=True, interpret=interpret)
    if use_3x3:
        t = conv_kxk_act(t.reshape(B, H, W, hid), vp['c2']['kernel'],
                         vp['c2']['bias'], act=True, interpret=interpret)
        t = conv_kxk_act(t, vp['c3']['kernel'], vp['c3']['bias'],
                         act=True, interpret=interpret)
        t = t.reshape(B, H * W, hid)
    else:
        t = dense_act(t, vp['c2']['kernel'].reshape(hid, hid),
                      vp['c2']['bias'], act=True, interpret=interpret)
        t = dense_act(t, vp['c3']['kernel'].reshape(hid, hid),
                      vp['c3']['bias'], act=True, interpret=interpret)
    Z = vp['c4']['bias'].shape[0] // 2
    pm, idx = prior_head(t, vp['c4']['kernel'].reshape(hid, 2 * Z),
                         vp['c4']['bias'], table, act=True,
                         interpret=interpret)
    return pm.reshape(B, H, W, Z), idx.reshape(B, H, W, Z)


def qres_fuse(feature, syms, pm, bp, kernel_size, interpret=False):
    """QLatentBlock.fuse_stage: z = syms + pm -> z_proj_0 (k3|k1) -> gelu
    -> z_proj_1 (1x1) -> feature + -> resnet_end (plain ConvNeXt)."""
    B, H, W, C = feature.shape
    Z = syms.shape[-1]
    s2 = syms.reshape(B, H * W, Z)
    pm2 = pm.reshape(B, H * W, Z)
    z0 = bp['z_proj_0']
    hid2 = z0['bias'].shape[0]
    if kernel_size >= 3:       # z_proj_0 is conv_k3s1 when use_3x3
        z = zadd(s2, pm2, interpret=interpret).reshape(B, H, W, Z)
        t = conv_kxk_act(z, z0['kernel'], z0['bias'], act=False,
                         interpret=interpret).reshape(B, H * W, hid2)
    else:
        t = zadd_dense(s2, pm2, z0['kernel'].reshape(Z, hid2), z0['bias'],
                       interpret=interpret)
    z1 = bp['z_proj_1']
    o = res_dense_act(feature.reshape(B, H * W, C), t,
                      z1['kernel'].reshape(hid2, C), z1['bias'],
                      interpret=interpret)
    return convnext_plain(o.reshape(B, H, W, C), bp['resnet_end'],
                          kernel_size, interpret=interpret)


# ---------------------------------------------------------------------------
# lossless (GaussianNLL) pixel head: codec tensors + exact reconstruction.
# The round-to-grid / FMA-sensitive chains MUST be in-kernel: XLA is free
# to contract a*b+c into fma per program, which can flip the grid rounding
# (same failure class as the trunk drift).
# ---------------------------------------------------------------------------

def _nll_head_kernel(m_ref, r_ref, tb_ref, pm_ref, idx_ref,
                     *, bin_size, log_bin):
    ls = _softplus(r_ref[0] + 16.0) - 16.0   # logscale lower bound
    # round the predicted mean to the pixel grid (exact-round-trip trick,
    # reference qresvae/model.py:69-79), then express in bin units
    pm = (jnp.round(m_ref[0] * 127.5 + 127.5) / 127.5 - 1.0) / bin_size
    pv = jnp.exp(ls - log_bin)
    tb = tb_ref[:]
    pv = jnp.maximum(pv, tb[0])
    idx = jnp.zeros(pv.shape, jnp.int32)
    for i in range(tb.shape[0]):
        idx = idx + (tb[i] < pv).astype(jnp.int32)
    pm_ref[0] = pm
    idx_ref[0] = jnp.minimum(idx, tb.shape[0] - 1)


def nll_head(p_mean, p_scale_raw, table, bin_size, interpret=False):
    """(B,H,W,3) raw head conv outputs -> (pm in bin units, scale indexes).

    Layout: flattened to (B, R, 128) rows — elementwise math doesn't care
    which channel sits in which lane, and 128 lanes beat 3."""
    import math as _math
    B, H, W, C = p_mean.shape
    n = H * W * C
    assert n % 128 == 0, (H, W, C)
    R = n // 128
    TR = _row_tile(R)
    kern = functools.partial(_nll_head_kernel, bin_size=float(bin_size),
                             log_bin=float(_math.log(bin_size)))
    pm, idx = pl.pallas_call(
        kern,
        grid=(B, R // TR),
        in_specs=[
            pl.BlockSpec((1, TR, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(table.shape[0]),
        ],
        out_specs=(pl.BlockSpec((1, TR, 128), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TR, 128), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((B, R, 128), jnp.int32)),
        interpret=interpret,
    )(p_mean.reshape(B, R, 128), p_scale_raw.reshape(B, R, 128), table)
    return pm.reshape(B, H, W, C), idx.reshape(B, H, W, C)


def _nll_recon_kernel(s_ref, pm_ref, o_ref, *, bin_size):
    x_hat = (s_ref[0].astype(jnp.float32) + pm_ref[0]) * bin_size
    im = jnp.clip(x_hat, -1.0, 1.0) * 0.5 + 0.5
    o_ref[0] = jnp.round(im * 255.0)


def nll_recon(syms, pm, bin_size, interpret=False):
    """Exact lossless reconstruction: integer-valued f32 pixels (the u8
    cast happens outside — a lone convert of identical bits is itself
    bit-deterministic, and Mosaic rejects sub-32-bit outputs)."""
    B, H, W, C = syms.shape
    n = H * W * C
    assert n % 128 == 0, (H, W, C)
    R = n // 128
    TR = _row_tile(R)
    kern = functools.partial(_nll_recon_kernel, bin_size=float(bin_size))
    y = pl.pallas_call(
        kern,
        grid=(B, R // TR),
        in_specs=[
            pl.BlockSpec((1, TR, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TR, 128), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, 128), jnp.float32),
        interpret=interpret,
    )(syms.reshape(B, R, 128), pm.reshape(B, R, 128))
    return y.reshape(B, H, W, C)

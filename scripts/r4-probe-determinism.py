"""Round-4 hardware probe: is Pallas the cross-program determinism anchor?

Stream portability (VERDICT r3 item 3) requires the decode-critical trunk
to produce BITWISE identical floats in *different* XLA executables (B=1
vs B=6 codec binaries, today's binary vs a future recompile). Round 3
proved plain XLA f32 convs drift ~1e-5 across program specializations and
that the latent feedback amplifies this into rANS desync — so snapping /
guard-banding is unsound; only exact value agreement works.

Hypothesis under test: a Pallas kernel is compiled by Mosaic in isolation
from the enclosing XLA program — same kernel source + same block shapes
=> same machine code => bitwise-identical results in ANY enclosing
executable, including when the batch is a grid dimension.

Probes (all on real hardware, trained-weight-scale random values):
  1. XLA baseline: a ConvNeXt-ish stage (depthwise conv + LN + matmul +
     GELU) traced into two different enclosing programs (bare vs
     surrounded by unrelated ops) and at B=1 vs B=6 — measure max ULP
     distance per case. Expected: nonzero somewhere (r3 evidence).
  2. Pallas kernel with the same math, full-block specs, grid=(B,):
     same comparisons. Required: ZERO everywhere, incl. B=1 vs B=6 and
     bare vs wrapped programs.
  3. Pallas kernel re-built under a different jit (fresh pallas_call
     object, different surrounding program): zero diff required.

Writes runs/probe-determinism-r4.json.

Usage: nohup python scripts/r4-probe-determinism.py > /tmp/r4probe.log 2>&1 &
"""
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    # Mosaic has no erf lowering; kernels use the trunk's polynomial GELU
    # (the XLA stages keep libm-exact gelu — each flavor is only ever
    # compared against itself)
    from lvae_tpu.ops.pallas.trunk import _gelu as kernel_gelu

    print(f'device: {jax.devices()}', flush=True)
    t00 = time.time()

    # trunk-like stage shape, sized so the deliberately-monolithic probe
    # kernel fits scoped VMEM (16 MB; the production trunk kernels tile —
    # ops/pallas/trunk.py _h_tile/_row_tile — but the probe keeps ONE
    # kernel so the whole stage's arithmetic is a single Mosaic unit)
    H, W, C = 16, 48, 256
    HID = 512
    K = 5
    rng = np.random.default_rng(0)
    x_np = rng.normal(0, 1.0, (6, H, W, C)).astype(np.float32)
    dw_np = rng.normal(0, 0.1, (K, K, C)).astype(np.float32)
    w1_np = rng.normal(0, 0.05, (C, HID)).astype(np.float32)
    w2_np = rng.normal(0, 0.05, (HID, C)).astype(np.float32)
    sh_np = rng.normal(0, 0.1, (C,)).astype(np.float32)
    sc_np = rng.normal(0, 0.1, (C,)).astype(np.float32)

    # ---- the stage, XLA flavor (same ops the trunk uses today) ----------
    def stage_xla(x, dw, w1, w2, shift, scale):
        pad = (K - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        y = jnp.zeros_like(x)
        for di in range(K):
            for dj in range(K):
                y = y + xp[:, di:di + x.shape[1], dj:dj + x.shape[2], :] \
                    * dw[di, dj]
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        y = (y - mu) * jax.lax.rsqrt(var + 1e-6)
        y = y * (1.0 + scale) + shift
        h = jax.nn.gelu(jnp.einsum('bhwc,cd->bhwd', y, w1),
                        approximate=False)
        return jnp.einsum('bhwd,dc->bhwc', h, w2) + x

    # conv-flavored XLA variant (what nn.Conv actually lowers to)
    def stage_xla_conv(x, dw, w1, w2, shift, scale):
        y = jax.lax.conv_general_dilated(
            x, dw.reshape(K, K, 1, C), (1, 1), ((2, 2), (2, 2)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=C)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        y = (y - mu) * jax.lax.rsqrt(var + 1e-6)
        y = y * (1.0 + scale) + shift
        h = jax.nn.gelu(jnp.einsum('bhwc,cd->bhwd', y, w1),
                        approximate=False)
        return jnp.einsum('bhwd,dc->bhwc', h, w2) + x

    # ---- the stage, Pallas flavor ----------------------------------------
    def stage_kernel(x_ref, dw_ref, w1_ref, w2_ref, sh_ref, sc_ref, o_ref):
        x = x_ref[0]                                   # (H, W, C)
        dw = dw_ref[:]
        pad = (K - 1) // 2
        xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)))
        y = jnp.zeros((H, W, C), jnp.float32)
        for di in range(K):
            for dj in range(K):
                y = y + xp[di:di + H, dj:dj + W, :] * dw[di, dj]
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        y = (y - mu) * jax.lax.rsqrt(var + 1e-6)
        y = y * (1.0 + sc_ref[:]) + sh_ref[:]
        y2 = y.reshape(H * W, C)
        h = kernel_gelu(
            jnp.dot(y2, w1_ref[:], preferred_element_type=jnp.float32))
        o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
        o_ref[0] = o.reshape(H, W, C) + x

    def stage_pallas(x, dw, w1, w2, shift, scale):
        B = x.shape[0]
        full = lambda *s: pl.BlockSpec(s, lambda b: (0,) * len(s),
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            stage_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                full(K, K, C), full(C, HID), full(HID, C),
                full(C), full(C),
            ],
            out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        )(x, dw, w1, w2, shift, scale)

    consts = tuple(jnp.asarray(a)
                   for a in (dw_np, w1_np, w2_np, sh_np, sc_np))
    x1 = jnp.asarray(x_np[:1])
    x6 = jnp.asarray(x_np)

    def wrapped(stage):
        """Same stage inside a DIFFERENT program: unrelated ops before and
        after, extra outputs — forces different fusion/scheduling
        context."""
        def prog(x, dw, w1, w2, sh, sc):
            noise = jnp.cumsum(jnp.ones((128, 128), jnp.float32)) \
                .reshape(128, 128)
            y = stage(x, dw, w1, w2, sh, sc)
            aux = jnp.tanh(y[:, :4, :4, :8]).sum() + noise[0, 0]
            return y * 1.0, aux
        return prog

    def maxdiff(a, b):
        a = np.asarray(a)
        b = np.asarray(b)
        return float(np.max(np.abs(a.astype(np.float64) -
                                   b.astype(np.float64))))

    res = {}
    for name, stage in [('xla_shift', stage_xla),
                        ('xla_conv', stage_xla_conv),
                        ('pallas', stage_pallas)]:
        t0 = time.time()
        bare = jax.jit(stage)
        wrap = jax.jit(wrapped(stage))
        y1_bare = np.asarray(bare(x1, *consts))
        y6_bare = np.asarray(bare(x6, *consts))
        y1_wrap = np.asarray(wrap(x1, *consts)[0])
        y6_wrap = np.asarray(wrap(x6, *consts)[0])
        # a third, freshly-built jit of the same source (new python
        # closures, fresh pallas_call) — models "future recompile"
        if name == 'pallas':
            rebuilt = jax.jit(lambda x, *c: stage_pallas(x, *c))
            y1_re = np.asarray(rebuilt(x1, *consts))
        else:
            y1_re = y1_bare
        res[name] = {
            'bare_vs_wrapped_B1': maxdiff(y1_bare, y1_wrap),
            'bare_vs_wrapped_B6': maxdiff(y6_bare, y6_wrap),
            'B1_vs_B6_img0_bare': maxdiff(y1_bare[0], y6_bare[0]),
            'B1_vs_B6_img0_wrapped': maxdiff(y1_wrap[0], y6_wrap[0]),
            'rebuilt_vs_bare_B1': maxdiff(y1_bare, y1_re),
            'secs': round(time.time() - t0, 1),
        }
        print(f'{name}: {res[name]}', flush=True)

    ok = all(v == 0.0 for k, v in res['pallas'].items() if k != 'secs')
    res['pallas_deterministic'] = ok
    out = ROOT / 'runs' / 'probe-determinism-r4.json'
    out.write_text(json.dumps(res, indent=2))
    print(f'=== probe done in {time.time() - t00:.0f}s; '
          f'pallas_deterministic={ok} ===', flush=True)


if __name__ == '__main__':
    main()

"""Mosaic lowering constraints, enforced on CPU.

Two portable-trunk bugs reached hardware in round 4 because the Pallas
interpreter does not enforce Mosaic's rules: a kernel emitted float16
("Unsupported type in mosaic dialect: 'f16'") and a (1, E) block over a
(B, E) array violated the last-two-dims rule (divisible by (8, 128) or
equal to the array's). This test spies on EVERY pallas_call the portable
codec makes — production call sites, production shapes, B in {1, 3} — and
re-checks those rules host-side, so the next violation fails in CI
instead of 90 s into a remote TPU compile.
"""
import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental import pallas as pl

import lvae_tpu


def _iter_specs(specs):
    if specs is None:
        return
    if isinstance(specs, (list, tuple)):
        for s in specs:
            yield from _iter_specs(s)
    else:
        yield specs


def _check_block(block_shape, array_shape, where):
    if block_shape is None:
        return  # whole-array block
    assert len(block_shape) == len(array_shape), (where, block_shape,
                                                  array_shape)
    if len(array_shape) < 2:
        return  # 1-D operands follow different (laxer) rules
    (b2, b1), (a2, a1) = block_shape[-2:], array_shape[-2:]
    assert b1 % 128 == 0 or b1 == a1, \
        f'{where}: minor block dim {b1} neither divides 128 nor equals {a1}'
    assert b2 % 8 == 0 or b2 == a2, \
        f'{where}: sublane block dim {b2} neither divides 8 nor equals {a2}'


@pytest.mark.parametrize('B', [1, 3])
def test_portable_codec_pallas_calls_satisfy_mosaic_rules(monkeypatch, B):
    from lvae_tpu.ops.pallas import trunk as ptk

    captured = []  # (kernel_name, in_specs, out_specs, in_shapes, dtypes)
    orig = pl.pallas_call

    def spy(kernel, **kw):
        inner = orig(kernel, **kw)

        def wrapped(*operands):
            name = getattr(kernel, 'func', kernel)
            name = getattr(name, '__name__', str(kernel))
            captured.append((name, kw.get('in_specs'), kw.get('out_specs'),
                             [tuple(np.shape(o)) for o in operands],
                             [jnp.asarray(o).dtype for o in operands],
                             kw.get('out_shape')))
            return inner(*operands)
        return wrapped

    monkeypatch.setattr(ptk.pl, 'pallas_call', spy)

    # module-level @jax.jit wrappers (rans kernels) may already be traced
    # by earlier tests in the same process — without this, their
    # pallas_calls would silently escape the spy and coverage would be
    # test-ordering dependent
    import jax
    jax.clear_caches()

    m = lvae_tpu.get_model('qarv_tiny')
    m.compress_mode(coder='fused', portable=True)
    rng = np.random.default_rng(3)
    ims = rng.random((B, 64, 64, 3)).astype(np.float32)
    if B == 1:
        body = m.compress(ims, lmb=512.0)
        m.decompress(body)
    else:
        bodies = m.compress_batch(ims, lmb=[512.0] * B)
        m.decompress_batch(bodies)

    assert captured, 'portable codec made no pallas calls?'
    f16_free = True
    for name, in_specs, out_specs, shapes, dtypes, out_shape in captured:
        where = f'pallas_call {name}'
        for spec, shape in zip(_iter_specs(in_specs), shapes):
            _check_block(getattr(spec, 'block_shape', None), shape, where)
        outs = out_shape if isinstance(out_shape, (list, tuple)) \
            else [out_shape]
        for spec, osd in zip(_iter_specs(out_specs), outs):
            _check_block(getattr(spec, 'block_shape', None),
                         tuple(osd.shape), where)
        # Mosaic has no f16: neither operands nor outputs may be float16
        for dt in dtypes:
            assert dt != jnp.float16, f'{where}: float16 operand'
            f16_free &= dt != jnp.float16
        for osd in outs:
            assert osd.dtype != jnp.float16, f'{where}: float16 output'
    assert f16_free

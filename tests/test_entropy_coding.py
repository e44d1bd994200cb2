"""Unit tests for L0: probability-mass math, CDF tables, rANS coder.

Oracles follow SURVEY.md §4: closed-form scipy comparisons, round-trip
property tests, and cross-implementation byte equality.
"""
import math

import numpy as np
import pytest

from lvae_tpu.ops import cdf as cdf_ops
from lvae_tpu.ops import rans_numpy, crans
from lvae_tpu.ops.cdf import (
    build_cdf_table, default_gaussian_scale_table, default_laplace_scale_table,
    build_indexes_np, pmf_to_quantized_cdf, std_normal_cdf, std_normal_ppf,
    std_laplace_cdf, std_laplace_ppf,
)


def test_std_normal_funcs():
    import scipy.stats as st
    x = np.linspace(-8, 8, 101)
    assert np.allclose(std_normal_cdf(x), st.norm.cdf(x), atol=1e-12)
    for q in [1e-9, 1e-6, 0.01, 0.3, 0.5, 0.9, 1 - 1e-6]:
        assert abs(std_normal_ppf(q) - st.norm.ppf(q)) < 1e-8


def test_std_laplace_funcs():
    import scipy.stats as st
    x = np.linspace(-10, 10, 101)
    assert np.allclose(std_laplace_cdf(x), st.laplace.cdf(x), atol=1e-12)
    for q in [1e-9, 0.01, 0.5, 0.99]:
        assert abs(std_laplace_ppf(q) - st.laplace.ppf(q)) < 1e-10


def test_pmf_to_quantized_cdf_properties(rng_np):
    for _ in range(20):
        n = int(rng_np.integers(2, 300))
        pmf = rng_np.random(n) ** 4  # spiky
        cdf = pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        freqs = np.diff(cdf.astype(np.int64))
        assert (freqs >= 1).all()  # every symbol codable


def test_pmf_to_quantized_cdf_deterministic(rng_np):
    pmf = rng_np.random(50)
    a = pmf_to_quantized_cdf(pmf)
    b = pmf_to_quantized_cdf(pmf.copy())
    assert np.array_equal(a, b)


def test_build_indexes_semantics():
    table = np.array([0.5, 1.0, 2.0, 4.0])
    scales = np.array([0.1, 0.5, 0.7, 1.0, 3.9, 4.0, 100.0])
    idx = build_indexes_np(scales, table)
    assert idx.tolist() == [0, 0, 1, 1, 3, 3, 3]


def test_build_indexes_device_matches_numpy(rng_np):
    import jax.numpy as jnp
    from lvae_tpu.models.entropy_coding import build_indexes
    table = default_gaussian_scale_table()
    scales = np.exp(rng_np.uniform(np.log(0.01), np.log(40), 2000)).astype(np.float32)
    np_idx = build_indexes_np(scales, table)
    dev_idx = np.asarray(build_indexes(jnp.asarray(scales), table))
    assert np.array_equal(np_idx, dev_idx)


@pytest.mark.parametrize('dist,table_fn', [
    ('gaussian', default_gaussian_scale_table),
    ('laplace', default_laplace_scale_table),
])
def test_rans_roundtrip_and_cross_impl(dist, table_fn, rng_np):
    table = build_cdf_table(table_fn(), dist)
    N = 3000
    scales = np.exp(rng_np.uniform(np.log(0.02), np.log(30), N))
    idx = build_indexes_np(scales, table.scale_table)
    vals = np.round(rng_np.normal(0, scales)).astype(np.int32)
    vals[:10] = rng_np.integers(-50000, 50000, 10)  # escape path
    s_np = rans_numpy.encode_with_indexes(vals, idx, table)
    s_c = crans.encode_with_indexes(vals, idx, table)
    assert s_np == s_c, 'C++ and numpy coders must be byte-identical'
    assert np.array_equal(rans_numpy.decode_with_indexes(s_np, idx, table), vals)
    assert np.array_equal(crans.decode_with_indexes(s_c, idx, table), vals)


def test_rans_empty():
    table = build_cdf_table(default_gaussian_scale_table(), 'gaussian')
    s = rans_numpy.encode_with_indexes(np.zeros(0, np.int32),
                                       np.zeros(0, np.int32), table)
    out = rans_numpy.decode_with_indexes(s, np.zeros(0, np.int32), table)
    assert out.size == 0


def test_rans_rate_close_to_entropy(rng_np):
    """Coded size should be within a few percent of the model entropy."""
    table = build_cdf_table(default_gaussian_scale_table(), 'gaussian')
    N = 50_000
    scale = 2.0
    idx = build_indexes_np(np.full(N, scale), table.scale_table)
    vals = np.round(rng_np.normal(0, scale, N)).astype(np.int32)
    codec = crans.RansCodec(table)
    nbits = len(codec.encode_with_indexes(vals, idx)) * 8
    # discrete gaussian entropy at scale 2.0 ~ 2.3 bits/sym
    xs = np.arange(-40, 41)
    p = std_normal_cdf((xs + 0.5) / scale) - std_normal_cdf((xs - 0.5) / scale)
    entropy = -(p * np.log2(np.maximum(p, 1e-30))).sum()
    assert nbits / N < entropy * 1.02 + 0.01


def test_gaussian_log_prob_mass_matches_scipy(rng_np):
    import scipy.stats as st
    from lvae_tpu.models.entropy_coding import gaussian_log_prob_mass
    mean = rng_np.normal(0, 3, 200).astype(np.float32)
    scale = np.exp(rng_np.uniform(-2, 2, 200)).astype(np.float32)
    x = rng_np.normal(0, 4, 200).astype(np.float32)
    got = np.asarray(gaussian_log_prob_mass(mean, scale, x, 1.0, 1e-6))
    pm = st.norm.cdf(x + 0.5, mean, scale) - st.norm.cdf(x - 0.5, mean, scale)
    want = np.where(pm > 1e-6, np.log(np.maximum(pm, 1e-8)),
                    st.norm.logpdf(x, mean, scale))
    # Tight comparison away from the f32 catastrophic-cancellation regime
    # (tiny CDF differences near 1.0 lose precision in f32 — the reference's
    # torch implementation has the same behavior); loose bound elsewhere.
    tight = pm > 1e-5
    assert np.allclose(got[tight], want[tight], rtol=1e-3, atol=5e-3)
    safe = np.abs(pm - 1e-6) > 0.2e-6
    assert np.all(np.abs(got[safe] - want[safe]) < 0.5)


def test_laplace_log_prob_mass_matches_scipy(rng_np):
    import scipy.stats as st
    from lvae_tpu.models.entropy_coding import laplace_log_prob_mass
    mean = rng_np.normal(0, 2, 100).astype(np.float32)
    scale = np.exp(rng_np.uniform(-1, 1, 100)).astype(np.float32)
    x = rng_np.normal(0, 3, 100).astype(np.float32)
    got = np.asarray(laplace_log_prob_mass(mean, scale, x, 1.0, 1e-6))
    pm = st.laplace.cdf(x + 0.5, mean, scale) - st.laplace.cdf(x - 0.5, mean, scale)
    want = np.where(pm > 1e-6, np.log(np.maximum(pm, 1e-8)),
                    st.laplace.logpdf(x, mean, scale))
    tight = pm > 1e-5
    assert np.allclose(got[tight], want[tight], rtol=1e-3, atol=5e-3)
    safe = np.abs(pm - 1e-6) > 0.2e-6
    assert np.all(np.abs(got[safe] - want[safe]) < 0.5)


def test_discrete_likelihood_consistent_with_cdf_table(rng_np):
    """The eval-time likelihood and the coding CDF table must agree closely,
    otherwise estimated bpp and real file size diverge."""
    from lvae_tpu.models.entropy_coding import discrete_likelihood
    table = build_cdf_table(default_gaussian_scale_table(), 'gaussian')
    scale = 1.7
    i = int(build_indexes_np(np.array([scale]), table.scale_table)[0])
    tscale = table.scale_table[i]
    row = table.cdfs[i].astype(np.float64) / (1 << 16)
    off = int(table.offsets[i])
    for v in range(-5, 6):
        coded_p = row[v - off + 1] - row[v - off]
        eval_p = float(discrete_likelihood(
            np.float32(v), np.float32(tscale), np.float32(0.0), 0.11))
        assert abs(math.log2(coded_p) - math.log2(eval_p)) < 0.01

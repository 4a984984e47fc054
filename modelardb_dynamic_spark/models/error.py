"""ModelarDB percentage-error semantics.

Behavioral contract (reference: core/utility/Static.java:105-118, pinned by
src/test/scala/.../PercentageErrorTest.scala):

    percentage_error(approx, real) = 0                     if approx == real
                                   = |(real-approx)/real| * 100  otherwise

The exact-equality short circuit makes (0, 0) -> 0; real == 0 with
approx != 0 -> +inf; (0, x) -> 100. All arithmetic is IEEE double.
"""

from __future__ import annotations

import numpy as np


def percentage_error(approximation: float, real: float) -> float:
    """Scalar double-precision percentage error.

    No np.errstate wrapper: the operands are Python floats here and the
    division is branch-guarded by real != 0.0, so it can never trip an FP
    error state — and the per-call seterr/geterr context measured ~40% of
    the whole grouped split-engine wall on flapping corpora."""
    approximation = float(approximation)
    real = float(real)
    if approximation == real:
        return 0.0
    if real == 0.0:
        return float("inf")
    return abs((real - approximation) / real) * 100.0


def percentage_error_vec(approx: np.ndarray, real: np.ndarray) -> np.ndarray:
    """Vectorized percentage error in float64.

    Division is masked (real==0 -> divide by 1) instead of wrapped in
    np.errstate: the per-call seterr/geterr context measured ~20% of total
    kernel time on short segments."""
    approx = np.asarray(approx, dtype=np.float64)
    real = np.asarray(real, dtype=np.float64)
    zero_real = real == 0.0
    denom = np.where(zero_real, 1.0, real)
    err = np.abs((real - approx) / denom) * 100.0
    # real == 0, approx != 0 -> +inf (Static.java contract); the equality
    # short-circuit handles 0/0 and exact matches.
    err = np.where(zero_real, np.inf, err)
    return np.where(approx == real, 0.0, err)


def outside_error_bound_vec(
    error_bound: float, approx: np.ndarray, real: np.ndarray
) -> np.ndarray:
    """Vectorized `percentage_error(approx, real) > error_bound`.

    error_bound is compared as the reference does: the configured float
    error bound widened to double (Static.java:105-107).
    """
    bound = float(np.float32(error_bound))
    return percentage_error_vec(approx, real) > bound

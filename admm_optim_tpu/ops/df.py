"""Double-float (two-float32) arithmetic for high-accuracy residuals on TPU.

TPU has no fast float64; the reference hits 1e-12 absolute linear-solve
tolerances in CPU double precision (obstacle_optim_util.lua:35-37).  To reach
the 1e-8-and-below regime on TPU we carry critical vectors as an unevaluated
pair ``(hi, lo)`` with ``hi = fl(hi + lo)`` and ``|lo| <= ulp(hi)/2`` -
roughly 48 bits of significand - and compute residuals with error-free
transformations (Knuth two-sum, Dekker/Veltkamp two-prod).  Smoothing and
Krylov iterations stay in plain f32 (bandwidth-bound, MXU-friendly); only the
once-per-refinement residual pass pays the ~6x flop overhead, which is noise
next to the HBM traffic of reading the operator.

All ops are elementwise jnp and fuse under XLA.  Rounding-mode assumptions:
IEEE round-to-nearest f32 adds/muls, which the TPU VPU provides.  Works
unchanged in f64 on CPU (giving ~double-double) - tests exploit that.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DF(NamedTuple):
    """Unevaluated sum hi + lo (hi carries the leading bits)."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def _ob(x):
    """Optimization barrier guarding error-free transformations.

    Under jit, XLA's algebraic simplifier (excess-precision rules) folds
    the EFT identities as if arithmetic were exact - e.g. the Knuth
    two_sum error collapses to 0 and the Veltkamp split to a no-op -
    silently degrading every double-float result to plain f32.  Measured:
    jitted residual_df was 6e-8 off while the op-by-op eager run was 1e-13
    (XLA:CPU; the same rewrite is licensed on TPU).  A barrier on each
    rounded intermediate blocks the pattern match at negligible cost (the
    EFT chains are elementwise)."""
    return jax.lax.optimization_barrier(x)


def barrier_pair(h, l):
    """Barrier a DF pair at a stage boundary.

    Even with per-primitive barriers, fusing two DF stages under one jit
    lets the simplifier fold identities that SPAN the stages (measured:
    jit(apply_w_df) exact, jit(exchange_sum_df) exact, jit of their
    composition 6e-8 off).  Each DF-producing kernel barriers its output
    pair."""
    return jax.lax.optimization_barrier((h, l))


def two_sum(a, b):
    """Error-free sum: a + b = s + e exactly (Knuth, 6 flops).

    Operands are barriered first: if a or b is an unfrozen product
    expression, XLA may contract it into `a + b` as an FMA (one rounding)
    while the compensation terms see the separately-rounded product - the
    returned pair is then internally inconsistent (measured: hi off by
    2 ulp with matching lo, corrupting iterative refinement).  The
    intermediates need no barriers: XLA does not fold the EFT identities
    themselves (verified by tests/test_df.py's f64 cross-checks under
    jit), and per-intermediate barriers fragmented the fused residual into
    per-kernel-overhead-dominated pieces (9x slower)."""
    a, b = _ob((a, b))
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (Dekker, 3 flops)."""
    a, b = _ob((a, b))
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Veltkamp split into high/low parts with non-overlapping significands.

    The split constant is 2^ceil(p/2)+1 for a p-bit significand: 2^12+1 for
    f32, 2^27+1 for f64 (so the same code yields double-double on CPU
    tests)."""
    c = a * _split_const(a.dtype)
    hi = c - (c - a)
    return hi, a - hi


def _split_const(dtype):
    return jnp.array(4097.0 if jnp.dtype(dtype).itemsize == 4 else 134217729.0, dtype)


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (Dekker, 17 flops).
    FMA contraction inside the error expression is harmless (fma(ah,bh,-p)
    IS the exact error), so no internal barriers."""
    p = _ob(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_zeros_like(x) -> DF:
    return DF(jnp.zeros_like(x), jnp.zeros_like(x))


def from_f(x) -> DF:
    return DF(x, jnp.zeros_like(x))


def to_f(x: DF):
    """Round to the working precision (hi already is, by the invariant)."""
    return x.hi + x.lo


def renorm(hi, lo) -> DF:
    """Safe renormalization: unconditional two_sum.  fast_two_sum requires
    |hi| >= |lo|, which FAILS under catastrophic cancellation (e.g. the
    residual b - Ax: hi cancels to ~0 while lo carries the accumulated
    eps-level terms) - using it there silently degrades the pair to plain
    f32 accuracy, with compilation-dependent symptoms."""
    return DF(*two_sum(hi, lo))


def add(x: DF, y: DF) -> DF:
    """DF + DF, cancellation-safe (QD-style accurate add, ~17 flops).

    The classic Dekker add2 (two_sum on hi, lump the lo parts, fast_two_sum)
    loses the compensation when the hi sum cancels below the lo magnitude -
    exactly the situation of an iterative-refinement residual."""
    s1, s2 = two_sum(x.hi, y.hi)
    t1, t2 = two_sum(x.lo, y.lo)
    s2 = s2 + t1
    s1, s2 = two_sum(s1, s2)
    s2 = s2 + t2
    return DF(*two_sum(s1, s2))


def add_f(x: DF, y) -> DF:
    s, e = two_sum(x.hi, y)
    return renorm(s, e + x.lo)


def sub(x: DF, y: DF) -> DF:
    return add(x, DF(-y.hi, -y.lo))


def mul_f(x: DF, a) -> DF:
    """DF * float (two_prod on the hi part, lo folded in)."""
    p, e = two_prod(x.hi, a)
    return renorm(p, e + x.lo * a)


def mul_ff(a, b) -> DF:
    """float * float -> DF (exact)."""
    return DF(*two_prod(a, b))


def scale(x: DF, a) -> DF:
    return mul_f(x, a)


def dot(x, y) -> DF:
    """Compensated dot product of two plain-float arrays.

    Per-element products are exact (two_prod); the product stream is
    reduced with XLA's pairwise jnp.sum (error O(log n * eps) relative to
    sum|p_i|) and the exact per-term errors are summed separately and folded
    in.  Not a full double-length dot, but the residual-norm checks that use
    it only need a few correct digits - the accuracy-critical object is the
    residual VECTOR, which is elementwise-DF."""
    xf = x.reshape(-1)
    yf = y.reshape(-1)
    ph, pl = two_prod(xf, yf)
    return DF(*two_sum(jnp.sum(ph), jnp.sum(pl)))

"""Small dense linear algebra for implicit solvers, in pure jnp.

The implicit solvers factor W = I - dt*gamma*J once per step and solve
against it several times (3 Rosenbrock stages / Newton iterations). The
reference leans on Julia's generic dense LU; on TPU the stock
``LuDecomposition`` custom-call supports neither f64 nor tiny batched
matrices efficiently, so we roll explicit Gauss-Jordan inversion with
partial pivoting, unrolled over the (static, <= ~16) species dimension.

Each subsequent solve is then a plain (ns, ns) @ (ns,) matvec — ideal under
``vmap``: a (B, ns, ns) x (B, ns) batched contraction that XLA maps onto
the vector units with zero custom-call overhead, and it differentiates
cleanly in both modes.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv_small(a: jnp.ndarray) -> jnp.ndarray:
    """Invert a small (n, n) matrix by Gauss-Jordan with partial pivoting.

    n is static and small; the elimination loop is unrolled at trace time.
    Singular inputs produce inf/nan entries (callers detect via isfinite
    and reject the step), never a crash.
    """
    n = a.shape[-1]
    dtype = a.dtype
    aug = jnp.concatenate([a, jnp.eye(n, dtype=dtype)], axis=-1)  # (n, 2n)

    rows = jnp.arange(n)
    for col in range(n):
        # partial pivot: largest |entry| on/below the diagonal in this column
        col_vals = jnp.where(rows >= col, jnp.abs(aug[:, col]), -jnp.inf)
        piv = jnp.argmax(col_vals)
        # swap rows col <-> piv (gather-based, works with traced piv)
        perm = jnp.where(
            rows == col, piv, jnp.where(rows == piv, col, rows)
        )
        aug = aug[perm]
        # normalise pivot row, eliminate the column everywhere else
        pivval = aug[col, col]
        pivrow = aug[col] / pivval
        factors = jnp.where(rows == col, 0.0, aug[:, col])
        aug = aug - factors[:, None] * pivrow[None, :]
        aug = aug.at[col].set(pivrow)
    return aug[:, n:]


def inv_small_nopivot_minpiv(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invert a small (n, n) matrix by Gauss-Jordan WITHOUT pivoting.

    For near-identity matrices — the implicit solvers' W = I - h*gamma*J
    and the Woodbury inner matrix M = I_nr - h*d*V@U inside the
    controller's stability envelope — diagonal pivoting is safe, and
    dropping the row swap removes the traced-permutation gather whose
    reverse-mode transpose (a scatter-add) was the SINGLE HOTTEST op in
    the case2 training epoch (26% of device time, runs/profile round-3
    trace).

    Unlike the pivoted ``inv_small``, a NONSINGULAR matrix whose diagonal
    pivot crosses ~0 mid-elimination (possible mid-training when a learned
    Jacobian has positive J_ii, so W_ii = 1 - h*d*J_ii ~ 0 at some trial
    dt) yields a finite-but-WRONG inverse that isfinite checks cannot see.
    Returns ``(inv, min_abs_pivot)`` so callers can detect it: reject the
    step when ``pivot_ok(a, min_abs_pivot)`` is False (rejection shrinks
    dt, which moves W back toward I and restores good pivots).
    """
    n = a.shape[-1]
    dtype = a.dtype
    aug = jnp.concatenate([a, jnp.eye(n, dtype=dtype)], axis=-1)  # (n, 2n)
    rows = jnp.arange(n)
    min_piv = jnp.asarray(jnp.inf, dtype)
    for col in range(n):
        pivval = aug[col, col]
        min_piv = jnp.minimum(min_piv, jnp.abs(pivval))
        pivrow = aug[col] / pivval
        factors = jnp.where(rows == col, 0.0, aug[:, col])
        aug = aug - factors[:, None] * pivrow[None, :]
        aug = aug.at[col].set(pivrow)
    return aug[:, n:], min_piv


def pivot_ok(a: jnp.ndarray, min_piv: jnp.ndarray) -> jnp.ndarray:
    """True iff the no-pivot elimination kept >= half the mantissa digits.

    Threshold: sqrt(eps) * max(1, ||a||_max) — a pivot below it means the
    inverse lost at least half its significant digits, so the caller must
    force step rejection rather than trust the embedded error estimate
    (which is computed THROUGH the same inverse). Batched: pass a of shape
    (..., n, n) and min_piv of shape (...,).
    """
    eps = jnp.finfo(a.dtype).eps
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(a), axis=(-2, -1)))
    return min_piv > jnp.sqrt(eps) * scale


def inv_small_nopivot(a: jnp.ndarray) -> jnp.ndarray:
    """`inv_small_nopivot_minpiv` without the pivot diagnostic (see there)."""
    return inv_small_nopivot_minpiv(a)[0]


def solve_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a @ x = b for small n (single right-hand side)."""
    return inv_small(a) @ b

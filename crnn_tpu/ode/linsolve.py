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


def solve_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a @ x = b for small n (single right-hand side)."""
    return inv_small(a) @ b

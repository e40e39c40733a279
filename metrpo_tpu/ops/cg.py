"""Conjugate gradient on implicit matrix-vector products.

The solver behind TRPO's natural gradient (the in-tree replacement for
rllab's ``ConjugateGradientOptimizer`` Fisher-vector-product CG, imported
by the reference at ``algos/trpo.py:4``).  Pure ``lax.fori_loop`` so it
jits into the single TRPO update program; when data is sharded the Avp
closure must already reduce with ``psum`` (SURVEY.md hard part 1).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def conjugate_gradient(Avp: Callable[[jnp.ndarray], jnp.ndarray],
                       b: jnp.ndarray,
                       iters: int = 10,
                       residual_tol: float = 1e-10) -> jnp.ndarray:
    """Solve A x = b for symmetric PSD implicit A."""

    def body(_, state):
        x, r, p, rdotr = state

        def update(args):
            x, r, p, rdotr = args
            z = Avp(p)
            alpha = rdotr / (jnp.dot(p, z) + 1e-12)
            x = x + alpha * p
            r = r - alpha * z
            new_rdotr = jnp.dot(r, r)
            beta = new_rdotr / (rdotr + 1e-12)
            p = r + beta * p
            return x, r, p, new_rdotr

        # freeze once the residual is small (static trip count keeps XLA happy)
        return jax.lax.cond(rdotr > residual_tol, update, lambda a: a,
                            (x, r, p, rdotr))

    x0 = jnp.zeros_like(b)
    state = (x0, b, b, jnp.dot(b, b))
    x, _, _, _ = jax.lax.fori_loop(0, iters, body, state)
    return x

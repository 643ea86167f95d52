"""Varying-manual-axes (vma) promotion for shard_map type checking.

Under ``shard_map(..., check_vma=True)`` every value carries a set of mesh
axes it *varies* over; ``lax.cond`` branches and ``lax.while_loop``/``scan``
carries must agree exactly. The solver initializes many carries from
constants (``jnp.zeros`` λ/dλ/counters/flags, the pre-linearization derivs),
which type as *invariant* while the loop body re-derives them from the
batch-sharded trajectory (*varying over 'batch'*) — tripping the checker
even though the program is replication-safe (solves are independent).

:func:`vary` promotes exactly the invariant leaves to varying
(``lax.pcast(..., to='varying')`` is not idempotent, so leaves already
varying are left alone) and is a no-op outside sharded contexts
(``axes=()``) — the unsharded solver path pays nothing.

This is what lets ``parallel/mesh.py`` run the shard_map'ed solvers with
``check_vma=True`` instead of the round-1/2 ``check_vma=False`` workaround.
"""

from __future__ import annotations

import jax
from jax import lax


def sds(shape, dtype, axes):
    """``jax.ShapeDtypeStruct`` for a Pallas kernel output, declared varying
    over the shard_map manual ``axes``.

    Under ``shard_map(..., check_vma=True)`` every ``pallas_call`` must
    declare how its outputs vary ("`vma` on `jax.ShapeDtypeStruct` must not
    be None"); the kernels are per-problem independent, so every output
    varies over the batch axes. With ``axes=()`` (the unsharded path) the
    plain struct is returned — ``vma`` stays unset.
    """
    if axes:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(axes))
    return jax.ShapeDtypeStruct(shape, dtype)


def vary(tree, axes):
    """Promote every array leaf of ``tree`` to vary over ``axes``.

    No-op when ``axes`` is empty (the unsharded path) or for leaves already
    varying over all of ``axes``.
    """
    if not axes:
        return tree

    def _leaf(x):
        have = getattr(jax.typeof(x), "vma", frozenset())
        need = tuple(a for a in axes if a not in have)
        return lax.pcast(x, need, to="varying") if need else x

    return jax.tree_util.tree_map(_leaf, tree)

# NOTE: do NOT "fix" an invariant array constant created inside a
# while_loop body by pcast/pvary-ing it in place (a removed vary_like
# helper tried): the constant is hoisted as a loop constvar, jax 0.9's
# shard_map invariant→varying insertion promotes the constvar itself,
# and the staged pcast then re-applies to an already-varying value and
# fails. Build such "constants" from scalar literals × an
# already-varying scalar instead (models/thruster_ring.py shows the
# pattern), or thread them through params.

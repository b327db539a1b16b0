"""Maximum-clique inlier selection on the TPU.

TEASER++ prunes outlier correspondences by finding a maximum clique in the
pairwise-consistency graph (its bundled PMC library, OpenMP branch-and-bound —
SURVEY.md section 2.2). The graphs arising in registration have a particular
structure: the true inliers are all mutually consistent (one large clique)
while outliers form only sparse random edges. On that family, parallel greedy
growth from *every* vertex — each growth step a dense (seeds x K) x (K x K)
matmul on the MXU — recovers the maximum clique with overwhelming probability,
in O(clique_size) matmul steps.

For exact-certification parity (`PMC_EXACT`), `native.maxclique` provides a
C++ bitset branch-and-bound used in tests to verify this kernel's output;
the device kernel is the product path.

Exactness ledger (round 4, `tools/clique_sweep.py`): 996 registration-family
graphs (K 128-1024, outlier ratio 0.1-0.95, the exact ``teaser_solve``
adjacency rule) — the greedy kernel matched the certified-exact solver on
**100%** of them (BASELINE.md "Greedy-clique exactness ledger"). Policy: no
automatic host fallback in the realtime path; the offline path keeps the
exact host solver at K <= 512.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("max_steps",))
def max_clique_greedy(adj: jnp.ndarray, valid: jnp.ndarray, max_steps: int | None = None):
    """Find a (near-)maximum clique by parallel greedy growth from every seed.

    adj: (K, K) bool symmetric adjacency, no self-loops required (diagonal is
    ignored). valid: (K,) bool vertex mask.
    Returns ``(clique_mask (K,) bool, size int32)``.

    Every vertex seeds a clique; at each step every seed-clique adds its
    candidate vertex with the highest candidate-degree (ties -> lowest index).
    All seeds advance in lockstep via one (K, K) x (K, K) matmul per step.
    """
    K = adj.shape[0]
    A = jnp.where(valid[:, None] & valid[None, :], adj, False)
    A = A & ~jnp.eye(K, dtype=bool)
    Af = A.astype(jnp.float32)

    in_clique = jnp.eye(K, dtype=bool) & valid[None, :] & valid[:, None]
    cand = A & valid[None, :]

    def cond(carry):
        in_clique, cand, step = carry
        return jnp.any(cand) & (step < (max_steps or K))

    def body(carry):
        in_clique, cand, step = carry
        candf = cand.astype(jnp.float32)
        # degree of each candidate within its seed's candidate set
        deg = jnp.dot(candf, Af, precision=_HP)  # (S, K)
        score = jnp.where(cand, deg, -1.0)
        pick = jnp.argmax(score, axis=1)  # (S,)
        has = jnp.any(cand, axis=1)
        pick_oh = jax.nn.one_hot(pick, K, dtype=bool) & has[:, None]
        in_clique = in_clique | pick_oh
        # candidates must be adjacent to the picked vertex too
        cand = cand & jnp.where(has[:, None], A[pick], cand) & ~pick_oh
        return in_clique, cand, step + 1

    in_clique, _, _ = jax.lax.while_loop(cond, body, (in_clique, cand, jnp.int32(0)))
    sizes = jnp.sum(in_clique.astype(jnp.int32), axis=1)
    sizes = jnp.where(valid, sizes, 0)
    best = jnp.argmax(sizes)
    return in_clique[best], sizes[best]


@jax.jit
def max_kcore(adj: jnp.ndarray, valid: jnp.ndarray):
    """Maximum k-core of the consistency graph — ``KCORE_HEU`` semantics.

    TEASER++'s k-core heuristic inlier selection takes the non-empty k-core
    with the largest k (every vertex has >= k neighbors inside the set) as
    the inlier set instead of running the exponential clique search; a clique
    of size c is a (c-1)-core, so the max core always contains the max clique
    when the graph is clique-dominated. Returns ``(core_mask (K,) bool,
    k int32)``.

    Two fixed-shape passes: (1) degeneracy by sequential min-degree peeling
    (``fori_loop`` of K masked matvecs — MXU-friendly, no data-dependent
    shapes); (2) a ``while_loop`` fixpoint deleting vertices of degree < k*.
    """
    K = adj.shape[0]
    A = jnp.where(valid[:, None] & valid[None, :], adj, False)
    A = A & ~jnp.eye(K, dtype=bool)
    Af = A.astype(jnp.float32)
    big = jnp.float32(K + 1)

    def peel(i, carry):
        m, kstar = carry
        deg = jnp.dot(Af, m.astype(jnp.float32), precision=_HP)
        deg = jnp.where(m, deg, big)  # removed vertices never picked
        v = jnp.argmin(deg)
        dmin = deg[v]
        any_left = jnp.any(m)
        kstar = jnp.where(any_left, jnp.maximum(kstar, dmin.astype(jnp.int32)), kstar)
        m = m & ~jax.nn.one_hot(v, K, dtype=bool)
        return m, kstar

    _, kstar = jax.lax.fori_loop(0, K, peel, (valid, jnp.int32(0)))

    def cond(c):
        m, changed = c
        return changed

    def body(c):
        m, _ = c
        deg = jnp.dot(Af, m.astype(jnp.float32), precision=_HP)
        keep = m & (deg >= kstar.astype(jnp.float32))
        return keep, jnp.any(keep != m)

    core, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True)))
    return core, kstar

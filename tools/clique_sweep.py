"""Statistical exactness ledger for the TPU greedy max-clique kernel.

TEASER++'s PMC_EXACT mode certifies the maximum clique with an exact
branch-and-bound (reference HelpersRealtime.py:161 selects it); our device
path is parallel greedy growth (registration/maxclique.py), exact with
overwhelming probability on clique-dominated consistency graphs but not
certified. This sweep MEASURES that claim at product scale: it generates
registration-family consistency graphs (planted inlier clique + geometric
outlier edges, the exact adjacency rule of ``teaser_solve``), runs the
greedy kernel against the native exact BBMC solver (native/maxclique.cpp),
and ledgers the agreement rate per (K, outlier-ratio) cell.

The graphs are NOT Erdos-Renyi: outlier edges come from the same
``|  ||dst_i-dst_j|| - ||src_i-src_j||  | <= 2*noise_bound*sqrt(cbar2)``
rule the solver uses, so their correlations (triangle inequality structure)
are the real adversarial family.

Results feed the BASELINE.md "greedy-clique exactness" table and the
fallback policy documented in registration/maxclique.py.

Usage:
  python tools/clique_sweep.py --cpu --budget 1000
  python tools/clique_sweep.py --budget 1000            # greedy on the TPU
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", action="store_true", help="run greedy on local CPU")
    p.add_argument("--ks", default="128,256,512,1024")
    p.add_argument("--ratios", default="0.1,0.3,0.5,0.7,0.9,0.95")
    p.add_argument("--budget", type=int, default=1000,
                   help="total graphs across the grid (cells at larger K get "
                        "proportionally fewer trials: cost ~ K^3)")
    p.add_argument("--noise-bound", type=float, default=0.01)
    p.add_argument("--cbar2", type=float, default=1.0)
    p.add_argument("--json", default="", help="write per-cell rows to this file")
    p.add_argument("--seed", type=int, default=0)
    return p


def make_graph(rng: np.random.Generator, K: int, ratio: float,
               noise_bound: float, cbar2: float):
    """One registration-family consistency graph.

    Returns ``(adj (K,K) bool, n_inliers int)``. Inlier correspondences are a
    rigid transform + iid noise (all mutually consistent by construction up
    to noise); outlier dst points are uniform in the scene sphere — their
    edges follow the same geometric rule, correlations included.
    """
    n_out = int(round(K * ratio))
    n_in = K - n_out
    src = rng.uniform(-0.25, 0.25, (K, 3)).astype(np.float32)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.uniform(-0.5, 0.5, 3)
    dst = (src @ q.T + t).astype(np.float32)
    dst[:n_in] += rng.normal(0, noise_bound / 3.0, (n_in, 3)).astype(np.float32)
    dst[n_in:] = rng.uniform(-0.25, 0.25, (n_out, 3)).astype(np.float32) + t
    sn = np.linalg.norm(src[:, None] - src[None, :], axis=-1)
    dn = np.linalg.norm(dst[:, None] - dst[None, :], axis=-1)
    thresh = 2.0 * noise_bound * np.sqrt(cbar2)
    adj = np.abs(dn - sn) <= thresh
    np.fill_diagonal(adj, False)
    return adj, n_in


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from poseestimator_tpu.registration import native
    from poseestimator_tpu.registration.maxclique import max_clique_greedy

    if not native.available():
        raise SystemExit("native exact solver unavailable (make -C native)")

    ks = [int(k) for k in args.ks.split(",")]
    ratios = [float(r) for r in args.ratios.split(",")]
    # trial allocation: cost of one graph ~ K^3 (greedy steps x matmul);
    # weight cells ~ 1/K so the budget isn't swallowed by K=1024
    w = np.array([1.0 / k for k in ks for _ in ratios])
    trials = np.maximum(3, np.round(args.budget * w / w.sum())).astype(int)

    rng = np.random.default_rng(args.seed)
    rows = []
    cell = 0
    for K in ks:
        greedy_j = jax.jit(max_clique_greedy)
        for ratio in ratios:
            n_t = int(trials[cell])
            cell += 1
            agree = 0
            ratios_sz = []
            t_greedy = t_exact = 0.0
            for _ in range(n_t):
                adj, n_in = make_graph(rng, K, ratio, args.noise_bound,
                                       args.cbar2)
                t0 = time.time()
                _, g_sz = greedy_j(jnp.asarray(adj), jnp.ones(K, bool))
                g_sz = int(jax.block_until_ready(g_sz))
                t_greedy += time.time() - t0
                t0 = time.time()
                _, e_sz = native.max_clique_exact(adj)
                t_exact += time.time() - t0
                assert g_sz <= e_sz, (g_sz, e_sz)  # greedy returns a clique
                agree += int(g_sz == e_sz)
                ratios_sz.append(g_sz / max(e_sz, 1))
            row = {
                "K": K, "outlier_ratio": ratio, "trials": n_t,
                "agreement_rate": agree / n_t,
                "size_ratio_mean": float(np.mean(ratios_sz)),
                "size_ratio_min": float(np.min(ratios_sz)),
                "greedy_ms_mean": t_greedy / n_t * 1000.0,
                "exact_ms_mean": t_exact / n_t * 1000.0,
            }
            rows.append(row)
            print(
                f"K={K:5d} ratio={ratio:4.2f} trials={n_t:4d} "
                f"agree={row['agreement_rate'] * 100:6.2f}% "
                f"size_ratio_min={row['size_ratio_min']:.3f} "
                f"greedy={row['greedy_ms_mean']:7.2f}ms "
                f"exact={row['exact_ms_mean']:7.2f}ms"
            )

    total = sum(r["trials"] for r in rows)
    worst = min(rows, key=lambda r: r["agreement_rate"])
    print(
        f"\ntotal graphs: {total}; worst cell: K={worst['K']} "
        f"ratio={worst['outlier_ratio']} agreement "
        f"{worst['agreement_rate'] * 100:.2f}%"
    )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json}")
    return rows


if __name__ == "__main__":
    main()

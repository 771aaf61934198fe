"""Finite-difference gradient validation harness.

The BASELINE north-star gradient metric: pixel-gradient max-abs-err vs
central finite differences < 1e-3 for material / camera / env-map
parameters.  The reference has no differentiability at all; this module is
the acceptance test for our detached-sampling estimator (gradients flow
through pdf-weighted contributions; discrete sampling decisions and
traversal are detached and reattached, ops/intersect.py).

FD of a Monte-Carlo estimator only matches AD when both evaluations use the
*same* random stream -- which our counter-based RNG guarantees for a fixed
(pixel, sample, seed) -- and when the perturbation does not flip a discrete
decision.  Use small eps and seeds where paths stay on the same branch.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class FDReport(NamedTuple):
    max_abs_err: float       # max |ad - fd| over all checked coordinates
    max_rel_err: float       # max |ad - fd| / max(|fd|, floor)
    ad: Any                  # AD gradient pytree (checked leaves)
    fd: Any                  # FD gradient pytree (same structure)

    @property
    def ok(self) -> bool:
        return self.max_abs_err < 1e-3


def fd_gradient(f: Callable[[Any], jnp.ndarray], params: Any,
                eps: float = 1e-3, max_coords: int | None = None) -> Any:
    """Central finite differences of scalar ``f`` w.r.t. a float pytree.

    Perturbs every scalar coordinate of every leaf (or the first
    ``max_coords`` per leaf); O(2 * n_coords) evaluations -- use tiny
    scenes/resolutions.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    out_leaves = []
    for li, leaf in enumerate(leaves):
        arr = np.asarray(leaf, np.float64)
        flat = arr.reshape(-1)
        g = np.zeros_like(flat)
        n = len(flat) if max_coords is None else min(len(flat), max_coords)
        for i in range(n):
            for sgn in (1.0, -1.0):
                pert = flat.copy()
                pert[i] += sgn * eps
                new_leaves = list(leaves)
                new_leaves[li] = jnp.asarray(
                    pert.reshape(arr.shape), jnp.float32)
                val = f(jax.tree_util.tree_unflatten(treedef, new_leaves))
                g[i] += sgn * float(val) / (2.0 * eps)
        out_leaves.append(g.reshape(arr.shape))
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


def check_gradients(f: Callable[[Any], jnp.ndarray], params: Any,
                    eps: float = 1e-3, max_coords: int | None = None,
                    rel_floor: float = 1e-2) -> FDReport:
    """Compare jax.grad(f) against central FD; returns an FDReport."""
    ad = jax.grad(lambda p: jnp.asarray(f(p), jnp.float32))(params)
    fd = fd_gradient(f, params, eps=eps, max_coords=max_coords)

    max_abs = 0.0
    max_rel = 0.0
    for a, d in zip(jax.tree_util.tree_leaves(ad),
                    jax.tree_util.tree_leaves(fd)):
        a = np.asarray(a, np.float64).reshape(-1)
        d = np.asarray(d, np.float64).reshape(-1)
        if max_coords is not None:
            a = a[:max_coords]
            d = d[:max_coords]
        err = np.abs(a - d)
        max_abs = max(max_abs, float(err.max(initial=0.0)))
        denom = np.maximum(np.abs(d), rel_floor)
        max_rel = max(max_rel, float((err / denom).max(initial=0.0)))
    return FDReport(max_abs, max_rel, ad, fd)

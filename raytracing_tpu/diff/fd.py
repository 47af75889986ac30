"""Finite-difference oracle harness (BASELINE.json: "matching a reference
finite-difference implementation to allclose on image and pixel-gradient").
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def finite_difference(f: Callable, x, eps: float = 1e-3):
    """Central-difference gradient of scalar f wrt pytree x (numpy, host).
    Deterministic f required (fix RNG keys outside)."""
    leaves, treedef = jax.tree.flatten(x)
    grads = []
    for li, leaf in enumerate(leaves):
        leaf = np.asarray(leaf, np.float64)
        g = np.zeros_like(leaf)
        flat = leaf.reshape(-1)
        gf = g.reshape(-1)
        for i in range(flat.size):
            hi = flat.copy()
            lo = flat.copy()
            hi[i] += eps
            lo[i] -= eps
            leaves_hi = list(leaves)
            leaves_lo = list(leaves)
            leaves_hi[li] = jnp.asarray(hi.reshape(leaf.shape), jnp.float32)
            leaves_lo[li] = jnp.asarray(lo.reshape(leaf.shape), jnp.float32)
            f_hi = float(f(jax.tree.unflatten(treedef, leaves_hi)))
            f_lo = float(f(jax.tree.unflatten(treedef, leaves_lo)))
            gf[i] = (f_hi - f_lo) / (2 * eps)
        grads.append(g)
    return jax.tree.unflatten(treedef, grads)


def check_grad(f: Callable, x, eps: float = 1e-3, rtol: float = 0.05,
               atol: float = 1e-4) -> dict:
    """Compare jax.grad(f) against central differences. Returns dict with
    ad/fd trees and max abs/rel errors; raises AssertionError on mismatch."""
    ad = jax.grad(f)(x)
    fd = finite_difference(f, x, eps)
    ad_flat = np.concatenate([np.asarray(l).ravel()
                              for l in jax.tree.leaves(ad)])
    fd_flat = np.concatenate([np.asarray(l).ravel()
                              for l in jax.tree.leaves(fd)])
    abs_err = np.abs(ad_flat - fd_flat)
    scale = np.maximum(np.abs(fd_flat), np.abs(ad_flat))
    ok = abs_err <= atol + rtol * scale
    if not ok.all():
        worst = np.argmax(abs_err - rtol * scale)
        raise AssertionError(
            f"grad mismatch at flat index {worst}: ad={ad_flat[worst]:.6g} "
            f"fd={fd_flat[worst]:.6g} ({(~ok).sum()}/{ok.size} bad)")
    return {"ad": ad, "fd": fd, "max_abs_err": float(abs_err.max())}

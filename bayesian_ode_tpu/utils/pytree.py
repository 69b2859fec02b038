"""Pytree numerics helpers shared by the ODE solvers and samplers.

The reference framework (torchdiffeq `_impl/misc.py`) works over tuples of
tensors with hand-rolled `_flatten` / `_scaled_dot_product` / `_norm` helpers
(misc.py:5-27, 71-76).  Here the state is an arbitrary JAX pytree and these
operations are expressed with `jax.tree` maps so they vmap/jit/shard cleanly.
"""
from __future__ import annotations

import operator
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

PyTree = Any


def tree_map(f: Callable, *trees: PyTree) -> PyTree:
    return jax.tree.map(f, *trees)


def tree_add(a: PyTree, b: PyTree) -> PyTree:
    return jax.tree.map(operator.add, a, b)


def tree_sub(a: PyTree, b: PyTree) -> PyTree:
    return jax.tree.map(operator.sub, a, b)


def tree_scale(c, a: PyTree) -> PyTree:
    return jax.tree.map(lambda x: c * x, a)


def tree_axpy(c, x: PyTree, y: PyTree) -> PyTree:
    """y + c * x, leafwise."""
    return jax.tree.map(lambda x_, y_: y_ + c * x_, x, y)


def tree_zeros_like(a: PyTree) -> PyTree:
    return jax.tree.map(jnp.zeros_like, a)


def tree_where(pred, a: PyTree, b: PyTree) -> PyTree:
    """Leafwise `where` with a scalar (or broadcastable) predicate."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_dot(a: PyTree, b: PyTree):
    """Full inner product across all leaves (sum of elementwise products)."""
    leaves = jax.tree.leaves(jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b))
    return sum(leaves)


def tree_sum_squares(a: PyTree):
    leaves = jax.tree.leaves(jax.tree.map(lambda x: jnp.sum(x * x), a))
    return sum(leaves)


def tree_size(a: PyTree) -> int:
    """Static total element count of a pytree."""
    return sum(x.size for x in jax.tree.leaves(a))


def safe_sqrt(x):
    """sqrt with zero (not infinite) slope at x == 0, so norms of
    exactly-zero residuals don't poison derivatives (double-where trick)."""
    nonzero = x > 0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, x, 1.0)), 0.0)


def tree_rms_norm(a: PyTree):
    """RMS norm over all leaves: ||x||_2 / sqrt(numel).

    Mirrors the reference `_norm` (misc.py:71-76), which for tuples computes
    sqrt(sum ||x_i||^2 / sum numel_i).
    """
    n = tree_size(a)
    return safe_sqrt(tree_sum_squares(a) / n)


def tree_random_normal(key, a: PyTree, dtype=None) -> PyTree:
    """A pytree of iid standard normals shaped like `a`."""
    leaves, treedef = jax.tree.flatten(a)
    keys = jax.random.split(key, len(leaves))
    out = [
        jax.random.normal(k, x.shape, dtype or x.dtype) for k, x in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, out)


def tree_stack_scalar_weighted(weights, trees):
    """sum_i weights[i] * trees[i] for a list of same-structure pytrees."""
    out = tree_scale(weights[0], trees[0])
    for w, t in zip(weights[1:], trees[1:]):
        out = tree_axpy(w, t, out)
    return out


__all__ = [
    "PyTree",
    "ravel_pytree",
    "tree_add",
    "tree_axpy",
    "tree_dot",
    "tree_map",
    "tree_random_normal",
    "tree_rms_norm",
    "tree_scale",
    "tree_size",
    "tree_stack_scalar_weighted",
    "tree_sub",
    "tree_sum_squares",
    "tree_where",
    "tree_zeros_like",
]

"""Chain / training checkpointing.

The reference checkpoints ad hoc (latent_ode.py saves a dict on
KeyboardInterrupt; gp.py keeps chains only in memory — SURVEY.md §5.4).
Here any pytree (sampler states, optimizer states, collected chains) can be
saved/restored mid-run, enabling elastic resume of long sampling jobs.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays as an .npz plus its treedef repr.

    The write is ATOMIC (tmp file + os.replace): mid-run checkpoints
    must never be observable half-written — a resume racing a kill
    (tests/test_experiments.py resume gate) would otherwise load a torn
    archive."""
    leaves, treedef = jax.tree.flatten(tree)
    apath = os.path.abspath(path)
    os.makedirs(os.path.dirname(apath), exist_ok=True)
    if not apath.endswith(".npz"):
        apath += ".npz"     # np.savez appends it; mirror that for replace
    tmp = apath + ".tmp.npz"
    np.savez(
        tmp,
        __treedef__=np.asarray(str(treedef)),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )
    os.replace(tmp, apath)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_pytree, using `like` for structure.

    The stored treedef repr is checked against `like`'s for a clear error
    on mismatch.
    """
    with np.load(path, allow_pickle=False) as data:
        leaves_like, treedef = jax.tree.flatten(like)
        stored = str(data["__treedef__"])
        if stored != str(treedef):
            raise ValueError(
                f"checkpoint structure mismatch:\n saved: {stored}\n "
                f"expected: {treedef}"
            )
        leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree.unflatten(treedef, leaves)

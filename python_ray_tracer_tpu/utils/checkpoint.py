"""Checkpoint / resume for inverse-rendering runs (SURVEY §5.4).

The reference persists nothing but the final PNG
(``/root/reference/ray_tracer/infrastructure/numpy/base.py:143-151``).
Optimization runs need restartable state: parameters + Adam moments + step
counter.  Renders are pure functions of the scene, so forward passes need
no checkpointing.

Format: ``.npz`` of flattened pytree leaves plus a JSON treedef — no
framework lock-in, safe to load with plain NumPy (np.load with
allow_pickle=False).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str | Path, state: Any) -> None:
    """Write any pytree of arrays atomically (tmp + rename)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    tmp = path.with_suffix(path.suffix + ".tmp")
    np.savez(
        tmp,
        __treedef__=np.frombuffer(json.dumps(str(treedef)).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )
    # np.savez appends .npz to names without it; normalize.
    written = tmp if tmp.exists() else tmp.with_suffix(tmp.suffix + ".npz")
    written.replace(path)


def load_checkpoint(path: str | Path, like: Any) -> Any:
    """Load into the structure of ``like`` (the pytree used when saving)."""
    path = Path(path)
    with np.load(path, allow_pickle=False) as data:
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = [data[f"leaf_{i}"] for i in range(n)]
        saved_treedef = (
            json.loads(bytes(data["__treedef__"]).decode()) if "__treedef__" in data.files else None
        )
    _, treedef = jax.tree_util.tree_flatten(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"{path}: checkpoint has {len(leaves)} leaves, structure expects {treedef.num_leaves}"
        )
    # Leaf COUNT alone would let a checkpoint from a different --train-fields
    # selection silently load values into the wrong parameters (ADVICE r1);
    # the stored treedef string pins the exact structure.
    if saved_treedef is not None and saved_treedef != str(treedef):
        raise ValueError(
            f"{path}: checkpoint structure mismatch.\n  saved:    {saved_treedef}\n  expected: {treedef}"
        )
    import jax.numpy as jnp

    ref_leaves = jax.tree_util.tree_leaves(like)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x, getattr(r, "dtype", None)) for x, r in zip(leaves, ref_leaves)]
    )

"""Pallas/Mosaic compatibility shims.

``pvary`` — the varying-manual-axes cast that shard_map's VMA system
auto-inserts where axis-varying values mix with kernel-local constants —
has no Mosaic TPU lowering rule in jax 0.9.0: compiling a kernel whose
``lax.fori_loop``/``lax.while_loop`` carries keep a ``pvary`` alive
inside ``shard_map`` aborts with "Unimplemented primitive in Pallas TPU
lowering ... pvary".  The op is an identity at kernel level (vma is a
TYPE property; the runtime value is untouched), so we register the
trivial rule.  Straight-line kernels never hit this (the cast folds
away); the blocked sweep kernels do.

Fail-soft: if these JAX internals move, the patch is skipped and only
shard_map'd looped kernels regress — to exactly the upstream error this
works around.
"""

from __future__ import annotations


def _register_pvary_identity() -> None:
    try:
        from jax._src.core import pvary_p
        from jax._src.pallas.mosaic import lowering as tpu_lowering

        for rules in tpu_lowering.lowering_rules.values():
            if pvary_p not in rules:
                rules[pvary_p] = lambda ctx, x, **params: x
    except Exception:  # pragma: no cover — JAX internals moved
        pass


_register_pvary_identity()

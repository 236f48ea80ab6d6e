"""Op census of the fused train kernel: what the VPU actually executes.

VERDICT r4 item 5: the ledger's MFU claim rested on a rough ~0.5 kFLOP/ray
estimate.  This script traces the REAL kernel body — `_FwdSub` forward
chain + in-kernel loss cotangent + `_adjoint_bounce` reverse chain, the
exact code `_train_kernel_sub_deep` runs — to a jaxpr (pallas refs
replaced by jnp-array shims) and counts per-lane vector ops by class:

  mad    — add/sub/mul (1 VPU op each; fused pairs are XLA's business)
  div    — true divides
  sqrt   — sqrt / rsqrt
  trans  — transcendentals (exp from sigmoid, sin/cos, pow via exp/log)
  cmp    — compares + selects + min/max + abs/sign
  misc   — int/bit/convert/floor/trunc

The census is exact for the unrolled sublane mode (the 960x540 headline
runs S=3 unrolled); the blocked mode runs the same math with fori_loop
drivers.  `benchmarks/vpu_ceiling.py` then measures the chip's ceiling on
the same mix; sustained/ceiling is the honest MFU.

Usage: JAX_PLATFORMS=cpu python benchmarks/op_census.py [depth] [n_spheres]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from python_ray_tracer_tpu.config import RenderConfig  # noqa: E402
from python_ray_tracer_tpu.models.scenes import reference_scene  # noqa: E402
from python_ray_tracer_tpu.ops.pallas_bounce import _material_table, _COLS, _NCONST  # noqa: E402
from python_ray_tracer_tpu.ops.pallas_bounce_smooth_sub import (  # noqa: E402
    _FwdSub,
    _adjoint_bounce,
    _clip_gate,
    _consts_row,
    _geometry_table,
)


class _Ref:
    """jnp-array stand-in for a pallas Ref: scalar/slice reads, accumulating
    writes (writes only occur on gradient accumulators — the census counts
    their adds like the kernel's)."""

    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, key):
        return self.arr[key]

    def __setitem__(self, key, val):
        self.arr = self.arr.at[key].set(val)


SUB, B = 8, 128  # one (8, 128) vreg-shaped tile; counts are per lane


def kernel_body(o3, d3, tgt3, mask, geom, mat, consts, depth, scene_params):
    """_train_kernel_sub_deep's math on plain arrays (save mode 'live')."""
    geom_ref, mat_ref, const_ref = _Ref(geom), _Ref(mat), _Ref(consts)
    ggeom = _Ref(jnp.zeros_like(geom))
    gmat = _Ref(jnp.zeros_like(mat))
    gconst = _Ref(jnp.zeros((1, _NCONST), o3.dtype))
    o = (o3[0], o3[1], o3[2])
    d = (d3[0], d3[1], d3[2])
    shape = o[0].shape
    dtype = o[0].dtype
    thr = jnp.ones(shape, dtype)
    alive = jnp.ones(shape, dtype)
    acc = [jnp.zeros(shape, dtype) for _ in range(3)]
    saved = []
    for _dep in range(depth):
        f = _FwdSub(o, d, thr, alive, (geom_ref, mat_ref, const_ref), scene_params)
        for i in range(3):
            acc[i] = acc[i] + f.color[i] * f.w
        saved.append((f, o, d))
        o, d, thr, alive = f.p_n, f.dout, f.thr_out, f.alive_out

    sse = jnp.zeros(shape, dtype)
    g_acc_l = []
    for i in range(3):
        e = (jnp.clip(acc[i], 0.0, 1.0) - tgt3[i]) * mask
        sse = sse + e * e
        g_acc_l.append(2.0 * e * _clip_gate(acc[i], 0.0, 1.0))
    loss = jnp.sum(sse)
    g_acc = tuple(g_acc_l)

    zero = jnp.zeros(shape, dtype)
    g_o = (zero, zero, zero)
    g_d = (zero, zero, zero)
    g_thr = zero
    g_alive = zero
    for dep in reversed(range(depth)):
        f, o, d = saved[dep]
        cots = (g_o, g_d, g_thr, g_alive, g_acc, None)
        g_o, g_d, g_thr, g_alive = _adjoint_bounce(
            f, o, d, cots, geom_ref, ggeom, gmat, gconst, scene_params
        )
    return loss, g_o, g_d, ggeom.arr, gmat.arr, gconst.arr


CLASSES = {
    "mad": {"add", "sub", "mul", "neg", "add_any"},
    "div": {"div"},
    "sqrt": {"sqrt", "rsqrt"},
    "trans": {"exp", "log", "sin", "cos", "tan", "logistic", "pow", "exp2", "log1p", "expm1", "integer_pow"},
    "cmp": {"max", "min", "lt", "le", "gt", "ge", "eq", "ne", "select_n", "abs", "sign", "clamp", "and", "or", "not", "xor", "is_finite"},
}


def classify(prim: str) -> str:
    for cls, names in CLASSES.items():
        if prim in names:
            return cls
    return "misc"


def main() -> None:
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    scene = reference_scene(960, 540, dtype=jnp.float32)
    s_total = scene.spheres.count
    s_cheap = s_total - scene.spheres.n_exact
    cfg = RenderConfig(max_depth=depth, dtype=jnp.float32, visibility="smooth", use_pallas=True)
    geom = np.asarray(_geometry_table(scene, jnp.float32))
    mat = np.asarray(_material_table(scene, jnp.float32)[:s_total])
    consts = np.asarray(_consts_row(scene, jnp.float32))
    scene_params = (
        cfg.faraway, s_cheap, s_total,
        float(cfg.edge_sharpness), float(cfg.shadow_sharpness),
        None, False, False, 1,
    )

    def fn(o3, d3, tgt3, mask):
        return kernel_body(
            o3, d3, tgt3, mask, jnp.asarray(geom), jnp.asarray(mat),
            jnp.asarray(consts), depth, scene_params,
        )

    shp3 = (3, SUB, B)
    jaxpr = jax.make_jaxpr(fn)(
        jnp.zeros(shp3), jnp.zeros(shp3), jnp.zeros(shp3), jnp.zeros((SUB, B))
    )

    lane = SUB * B
    counts: Counter = Counter()
    elems: Counter = Counter()
    elems_cse: Counter = Counter()

    def walk(jx):
        # Single-assignment CSE: two eqns with the same primitive, params
        # and (canonicalized) inputs compute the same value — count once.
        # Approximates what Mosaic's CSE executes; the raw count is the
        # unoptimized trace.
        canon: dict = {}
        seen: dict = {}

        from jax.extend.core import Literal

        def cv(v):
            return canon.get(id(v), id(v)) if not isinstance(v, Literal) else ("lit", str(v))

        for eqn in jx.eqns:
            for v in eqn.params.values():  # scans/conds if any
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
            prim = eqn.primitive.name
            n_out = int(np.prod(eqn.outvars[0].aval.shape)) if eqn.outvars and hasattr(eqn.outvars[0].aval, "shape") and eqn.outvars[0].aval.shape else 1
            counts[prim] += 1
            elems[classify(prim)] += n_out
            key = (prim, tuple(cv(v) for v in eqn.invars), str(eqn.params))
            if key in seen and prim != "jit":
                for ov, prev in zip(eqn.outvars, seen[key]):
                    canon[id(ov)] = prev
            else:
                seen[key] = tuple(cv(ov) for ov in eqn.outvars)
                elems_cse[classify(prim)] += n_out

    walk(jaxpr.jaxpr)

    per_lane = {cls: round(v / lane, 1) for cls, v in sorted(elems.items())}
    per_lane_cse = {cls: round(v / lane, 1) for cls, v in sorted(elems_cse.items())}
    total = round(sum(elems.values()) / lane, 1)
    total_cse = round(sum(elems_cse.values()) / lane, 1)
    rec = {
        "bench": "op_census_train_kernel",
        "depth": depth,
        "n_spheres": s_total,
        "per_lane_ops": per_lane,
        "total_per_lane": total,
        "per_lane_ops_cse": per_lane_cse,
        "total_per_lane_cse": total_cse,
        "note": "vector-op slots per ray lane, fwd+loss+adjoint, save=live; _cse = after single-assignment CSE",
        "top_prims": dict(counts.most_common(12)),
    }
    print(json.dumps(rec), flush=True)  # noqa: T201


if __name__ == "__main__":
    main()

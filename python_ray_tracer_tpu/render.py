"""The renderer: pure function ``(scene, cfg) -> image``.

TPU-first redesign of the reference's render path:

* the unbounded mutual recursion ``raytrace_scene -> Shader.create ->
  _calculate_reflection -> raytrace_scene``
  (``/root/reference/ray_tracer/infrastructure/numpy/base.py:91-121`` /
  ``shader.py:143-161``, measured depth 56) becomes a fixed-depth
  ``lax.scan`` carrying ``(origin, direction, throughput, alive, accum)``,
* extract/place stream compaction (``base.py:15-25,66-79,106-119``) becomes
  masked lanes: every lane computes every bounce, dead lanes are multiplied
  away (SURVEY §3.7) — static shapes, fully fusable by XLA,
* the per-shape Python loops (``base.py:97,102``; ``shader.py:126``) become
  dense (N rays × S spheres) sweeps with a nearest-hit reduction
  (:mod:`.ops.intersect`), optionally the fused Pallas kernel.

Visibility modes:

* ``hard`` replicates the reference's step functions exactly (strict
  ``disc > 0 & t > 0`` hits, shadow = "this sphere is the nearest hit along
  the light ray", ``shader.py:114-128``),
* ``smooth`` relaxes hit coverage and shadow occlusion with sigmoids so
  silhouette and shadow edges carry gradients (the differentiable-rendering
  upgrade BASELINE.json config 3 mandates; the reference is forward-only).

Multi-chip: every reduction over the sphere axis goes through a small set of
helpers that take an optional ``sphere_axis`` mesh-axis name.  When set (by
:mod:`.parallel.sharded`, inside ``shard_map``), each chip sweeps only its
shard of the sphere table and the nearest-hit / shadow / coverage reductions
finish with ``lax.pmin``/``psum`` collectives over ICI — the ring-reduction
structure SURVEY §5.7 calls for.  With ``sphere_axis=None`` the same code
paths reduce locally, so the single-chip and sharded renderers share one
bounce loop.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .camera import ray_directions
from .config import RenderConfig, VISIBILITY_SMOOTH
from .ops.intersect import IntersectResult, NearestHit, intersect_all, intersect_all_stable
from .ops.shading import NUDGE, LaneMaterial, gather_material, shade
from .ops.vecmath import normalize, reflect
from .scene import Scene


def auto_max_depth(
    scene: Scene,
    quantum: float = 1.0 / 510.0,
    color_bound: float = 2.0,
    cap: int = 64,
) -> int:
    """Depth at which truncating the reference's unbounded recursion is
    invisible at uint8 precision.

    The reference recurses until every reflected ray misses
    (``shader.py:143-156`` -> ``base.py:105``, measured depth 56 on the
    README scene); each bounce attenuates by ``0.5 * specular_gain *
    in_light`` (``shader.py:106``).  With ``g = 0.5 * max(specular_gain)``,
    everything from depth D onward contributes at most
    ``color_bound * g^D / (1 - g)`` per channel — choose the smallest D
    putting that under half a uint8 quantum.  ``color_bound`` bounds one
    bounce's local shaded color (images are clipped to [0,1]; 2.0 adds
    headroom for unclipped HDR contributions).  Host-side (reads concrete
    scene values) — resolve BEFORE jit and pass the result as
    ``RenderConfig.max_depth``.
    """
    import math

    import numpy as np

    g = 0.5 * float(np.max(np.asarray(scene.spheres.specular_gain)))
    if g <= 0.0:
        return 1  # reflections carry zero weight (shader.py:106)
    if g >= 1.0:
        return cap  # non-dissipating mirror hall: cap (beyond ~56 the
        # reference's own float energy dies; cap matches its measured max)
    # color_bound * g^D / (1 - g) < quantum / 2
    d = math.log(0.5 * quantum * (1.0 - g) / color_bound, g)
    return max(1, min(cap, math.ceil(d)))


def _sweep(
    origin: jax.Array,
    direction: jax.Array,
    center: jax.Array,
    radius: jax.Array,
    cfg: RenderConfig,
    *,
    n_exact: int | None = None,
    pin: bool = False,
    exact_mask: jax.Array | None = None,
) -> IntersectResult:
    """All-spheres intersection sweep, Pallas or XLA.

    ``n_exact`` enables the two-tier float32 path (plain math on the
    cheap sphere prefix, compensated on the exact suffix); None keeps
    everything on the compensated path.

    ``exact_mask`` (sphere-sharded mode only): per-LOCAL-row boolean of
    "this row is in the GLOBAL exact suffix".  The static ``n_exact``
    count cannot express the tier split of an arbitrary shard (SPMD runs
    one program on every shard, but the global suffix covers different
    local rows per shard), and applying the global count per shard
    upgrades globally-cheap rows to compensated math — differently
    rounded, which breaks the bitwise sharded==single-chip equality the
    tie detection and owner-equality combines rely on.  With a mask both
    tiers are computed and selected per row: each row gets the exact
    same formula it gets on a single chip.

    ``pin=True`` wraps the result in an optimization_barrier so every
    consumer reads ONE canonical computation.  Needed only where a
    collective-combined value is compared against a local recomputation
    (the sphere-sharded path): without it XLA may duplicate the sweep into
    differently-fused — differently-rounded — subgraphs and flip the
    owner-equality decision.  Off the sharded path the barrier just blocks
    fusion (measured: the bounce shatters into hundreds of extra
    materialized intermediates), so it stays off.
    """
    if not cfg.stable_intersect:
        res = intersect_all(origin, direction, center, radius, cfg.faraway)
    elif exact_mask is not None:
        from .ops.intersect import intersect_all_plain

        a = intersect_all_plain(origin, direction, center, radius, cfg.faraway)
        b = intersect_all_stable(origin, direction, center, radius, cfg.faraway)
        m = exact_mask[None, :]
        res = IntersectResult(
            t=jnp.where(m, b.t, a.t),
            sol=jnp.where(m, b.sol, a.sol),
            disc=jnp.where(m, b.disc, a.disc),
        )
    elif n_exact is None:
        res = intersect_all_stable(origin, direction, center, radius, cfg.faraway)
    else:
        from .ops.intersect import intersect_two_tier

        res = intersect_two_tier(origin, direction, center, radius, cfg.faraway, n_exact)
    if pin:
        res = IntersectResult(*jax.lax.optimization_barrier(tuple(res)))
    return res


def _soft_cover(sol: jax.Array, disc: jax.Array, sharpness: float) -> jax.Array:
    """Soft "this quadratic has a positive root" in [0, 1].

    ``sigmoid(k*disc) * sigmoid(k*sol)`` → the hard ``disc > 0 & sol > 0``
    as ``k → ∞`` (the strict inequalities of ``shape.py:50``).
    """
    return jax.nn.sigmoid(sharpness * disc) * jax.nn.sigmoid(sharpness * sol)


# ---------------------------------------------------------------------------
# Sphere-axis reductions (local, or collective when sphere_axis is a mesh
# axis name inside shard_map).
#
# AD discipline for the collective branch: pmin/pmax have no differentiation
# rule in JAX, so every *selector* (argmin winner, owner shard) is computed
# on stop_gradient'd values — constants need no JVP rule — while the
# *values* the selector picks flow through differentiable collectives
# (psum / all_gather, whose transposes XLA overlaps with backward compute).
# ---------------------------------------------------------------------------


def _invariant(x: jax.Array, sphere_axis: str | None) -> jax.Array:
    """Make a value already identical on every shard VMA-invariant.

    ``psum`` of (shard-0 copy, zeros elsewhere): bitwise exact (a sum with
    zeros), differentiable (psum transposes), and marks the result reduced
    over the axis for the VMA checker.
    """
    if sphere_axis is None:
        return x
    k = jax.lax.axis_index(sphere_axis)
    return jax.lax.psum(jnp.where(k == 0, x, jnp.zeros_like(x)), sphere_axis)


def _combine_nearest(
    t_table: jax.Array,  # (N, S_local)
    faraway: float,
    sphere_axis: str | None,
    sphere_offset: jax.Array | int,
) -> NearestHit:
    """Nearest-hit reduction over (possibly sharded) sphere axis.

    The reference reduces with sequential ``np.minimum`` (``base.py:97-98``)
    then re-derives the winner by equality (``base.py:103``); an exact tie
    between two spheres is shaded twice and summed there.  We take the
    argmin (lowest global index wins) instead — identical except on
    measure-zero ties, which :mod:`tests.test_golden` verifies do not occur
    in the golden scene.
    """
    if sphere_axis is None:
        tmin = jnp.min(t_table, axis=1)
        idx = jnp.argmin(t_table, axis=1).astype(jnp.int32) + sphere_offset
        hit = tmin != jnp.asarray(faraway, dtype=t_table.dtype)
        return NearestHit(t=tmin, idx=idx, hit=hit)

    # Selector path (no gradients): find the winning global index.  pmin
    # selects (bitwise) one of the shard minima, so the owner shard
    # recognises itself by exact equality — valid only if its tmin_l is
    # computed ONCE.  The barrier stops XLA from duplicating tmin_l into
    # differently-fused (differently-rounded) subgraphs for the two uses.
    t_sg = jax.lax.stop_gradient(t_table)
    tmin_l = jax.lax.optimization_barrier(jnp.min(t_sg, axis=1))
    idx_l = jnp.argmin(t_sg, axis=1).astype(jnp.int32) + sphere_offset
    tmin_sel = jax.lax.pmin(tmin_l, sphere_axis)
    cand = jnp.where(tmin_l == tmin_sel, idx_l, jnp.iinfo(jnp.int32).max)
    idx = jax.lax.pmin(cand, sphere_axis)

    # Value path (differentiable): re-gather the winner's t from the live
    # table; only the owner contributes, psum'd to every shard.  Bitwise
    # equal to the owner's value (a sum with zeros) and its gradient flows
    # to exactly the winning sphere — the same subgradient jnp.min takes.
    t_val, _ = _self_lookup(t_table, idx, sphere_offset, 0.0)
    tmin = jax.lax.psum(t_val, sphere_axis)
    hit = tmin != jnp.asarray(faraway, dtype=t_table.dtype)
    return NearestHit(t=tmin, idx=idx, hit=hit)


def _self_lookup(
    table: jax.Array,  # (N, S_local) per-sphere values
    idx: jax.Array,  # (N,) global sphere index
    sphere_offset: jax.Array | int,
    fill: float,
) -> tuple[jax.Array, jax.Array]:
    """Each lane's value for its *own* sphere; ``fill`` where not owned.

    Returns ``(value, owns)`` — in sharded mode only the owning chip holds
    the real value, others hold ``fill`` (combined by the caller with
    pmin/psum as appropriate).

    Implemented as a one-hot masked sum, not a row gather: the sum's
    transpose is a broadcast multiply while a gather transposes to an
    N-lane scatter-add — serialized and very slow on TPU.
    """
    s_local = table.shape[1]
    gidx = jnp.arange(s_local, dtype=jnp.int32)[None, :] + sphere_offset
    onehot = gidx == idx[:, None]  # (N, S_local); all-False when not owned
    val = jnp.sum(jnp.where(onehot, table, jnp.zeros_like(table)), axis=1)
    owns = jnp.any(onehot, axis=1)
    val = jnp.where(owns, val, jnp.asarray(fill, table.dtype))
    return val, owns


def _combine_nearest_reduced(
    t_l: jax.Array,  # (N,) per-shard reduced nearest t
    idx_l: jax.Array,  # (N,) GLOBAL winning index within this shard
    faraway: float,
    sphere_axis: str,
) -> NearestHit:
    """Cross-shard nearest-hit combine on already-reduced per-shard results.

    The fused Pallas sweep reduces over its shard's spheres in-kernel; this
    finishes the reduction across the sphere mesh axis with the same AD
    discipline as :func:`_combine_nearest`: selectors (pmin winners) on
    stop_gradient'd values, the winning t re-masked from the live input and
    psum'd so its gradient flows to exactly the owning shard's kernel VJP.
    """
    t_sg = jax.lax.stop_gradient(t_l)
    t_pin = jax.lax.optimization_barrier(t_sg)  # one canonical copy (see _combine_nearest)
    tmin_sel = jax.lax.pmin(t_pin, sphere_axis)
    cand = jnp.where(t_pin == tmin_sel, idx_l, jnp.iinfo(jnp.int32).max)
    idx = jax.lax.pmin(cand, sphere_axis)  # lowest global index wins ties
    owns = idx_l == idx
    t_val = jnp.where(owns, t_l, jnp.zeros_like(t_l))
    tmin = jax.lax.psum(t_val, sphere_axis)
    hit = tmin != jnp.asarray(faraway, t_l.dtype)
    return NearestHit(t=tmin, idx=idx, hit=hit)


def _shadow_hard(
    res: IntersectResult,
    idx: jax.Array,
    sphere_axis: str | None,
    sphere_offset: jax.Array | int,
    dtype: Any,
) -> jax.Array:
    """Hard shadow test, ref ``shader.py:114-128``.

    The reference computes "lit iff the lane's own sphere is the nearest hit
    along the shadow ray" as ``t_self == reduce(min, all)`` (the self-hit
    sits at FARAWAY when the path is clear, so equality holds on a clear
    path).  We evaluate the equivalent ``t_self <= min(others)`` instead:
    identical on every input, but not a bitwise float equality — robust to
    XLA recomputing the two sides in differently-fused subgraphs.
    """
    s_local = res.t.shape[1]
    gidx = jnp.arange(s_local, dtype=jnp.int32)[None, :] + sphere_offset
    is_self = gidx == idx[:, None]
    t_others = jnp.where(is_self, jnp.asarray(jnp.inf, res.t.dtype), res.t)
    tmin_others = jnp.min(t_others, axis=1)
    t_self, _ = _self_lookup(res.t, idx, sphere_offset, jnp.inf)
    if sphere_axis is not None:
        # Visibility is a step function — no useful gradient — so the
        # non-differentiable pmin runs on stop_gradient'd values.
        tmin_others = jax.lax.pmin(jax.lax.stop_gradient(tmin_others), sphere_axis)
        t_self = jax.lax.pmin(jax.lax.stop_gradient(t_self), sphere_axis)
    return (t_self <= tmin_others).astype(dtype)


def _shadow_smooth(
    res: IntersectResult,
    idx: jax.Array,
    cfg: RenderConfig,
    sphere_axis: str | None,
    sphere_offset: jax.Array | int,
    dtype: Any,
) -> jax.Array:
    """Smooth shadow: product over *other* spheres of (1 - soft occlusion)."""
    occl = _soft_cover(res.sol, res.disc, cfg.shadow_sharpness)  # (N, S_local)
    gidx = jnp.arange(res.t.shape[1], dtype=jnp.int32)[None, :] + sphere_offset
    not_self = gidx != idx[:, None]
    clear = jnp.prod(jnp.where(not_self, 1.0 - occl, jnp.ones_like(occl)), axis=1)
    if sphere_axis is not None:
        # all_gather + prod is differentiable; the result is identical on
        # every shard, so _invariant re-establishes axis invariance exactly.
        clear = jnp.prod(jax.lax.all_gather(clear, sphere_axis), axis=0)
        clear = _invariant(clear, sphere_axis)
    return clear.astype(dtype)


def _smooth_winner_idx(
    res: IntersectResult,
    near: NearestHit,
    sphere_axis: str | None,
    sphere_offset: jax.Array | int,
) -> jax.Array:
    """Winning sphere per lane for smooth coverage.

    Hit lanes keep the nearest sphere; miss lanes attribute coverage (and
    its gradient) to the sphere whose discriminant came closest to zero.
    """
    disc_sg = jax.lax.stop_gradient(res.disc)  # selector only — no gradient
    dmax_l = jnp.max(disc_sg, axis=1)
    fidx_l = jnp.argmax(disc_sg, axis=1).astype(jnp.int32) + sphere_offset
    if sphere_axis is None:
        fidx = fidx_l
    else:
        dmax_l = jax.lax.optimization_barrier(dmax_l)  # see _combine_nearest
        dmax = jax.lax.pmax(dmax_l, sphere_axis)
        cand = jnp.where(dmax_l == dmax, fidx_l, jnp.iinfo(jnp.int32).max)
        fidx = jax.lax.pmin(cand, sphere_axis)
    return jnp.where(near.hit, near.idx, fidx)


def _coverage_at(
    res: IntersectResult,
    idx: jax.Array,
    sharpness: float,
    sphere_axis: str | None,
    sphere_offset: jax.Array | int,
) -> jax.Array:
    """Soft coverage of each lane's winning sphere."""
    cover_all = _soft_cover(res.sol, res.disc, sharpness)
    cover, _ = _self_lookup(cover_all, idx, sphere_offset, 0.0)
    if sphere_axis is not None:
        cover = jax.lax.psum(cover, sphere_axis)
    return cover


def _smooth_winner_cover_parts(parts, near, sphere_axis, sphere_offset, sharpness):
    """Winner index + soft coverage from per-shard SmoothParts.

    The kernel analog of :func:`_smooth_winner_idx` + :func:`_coverage_at`
    on reduced per-shard quantities: the max-discriminant fallback winner
    combines with a pmax/pmin selector pass (stop_gradient — selectors
    carry no gradient), and the winner's coverage inputs ``(sol, disc)``
    psum from the owning shard (exact: per-shard global index ranges are
    disjoint, so exactly one shard matches), keeping the gradient flowing
    into that shard's kernel VJP.  Sigmoids evaluate after the collective
    — the operand is bitwise the owner's value, so this equals the XLA
    path's select-after-sigmoid up to roundoff.
    """
    gidx_l = parts.idx + sphere_offset
    gfidx_l = parts.fidx + sphere_offset
    dmax_sg = jax.lax.optimization_barrier(jax.lax.stop_gradient(parts.dmax))
    dmax = jax.lax.pmax(dmax_sg, sphere_axis)
    cand = jnp.where(dmax_sg == dmax, gfidx_l, jnp.iinfo(jnp.int32).max)
    fidx = jax.lax.pmin(cand, sphere_axis)
    idx = jnp.where(near.hit, near.idx, fidx)

    owns_hit = gidx_l == idx
    owns_f = gfidx_l == idx
    zero = jnp.zeros_like(parts.sol_w)
    sol = jnp.where(
        near.hit, jnp.where(owns_hit, parts.sol_w, zero), jnp.where(owns_f, parts.sol_f, zero)
    )
    disc = jnp.where(
        near.hit, jnp.where(owns_hit, parts.disc_w, zero), jnp.where(owns_f, parts.dmax, zero)
    )
    sol = jax.lax.psum(sol, sphere_axis)
    disc = jax.lax.psum(disc, sphere_axis)
    return idx, _soft_cover(sol, disc, sharpness)


def trace(
    origin: jax.Array,  # (N, 3) or (3,)
    direction: jax.Array,  # (N, 3) unit
    scene: Scene,
    cfg: RenderConfig,
    *,
    sweep_center: jax.Array | None = None,  # (S_local, 3) geometry shard
    sweep_radius: jax.Array | None = None,  # (S_local,)
    sphere_axis: str | None = None,  # mesh axis the sweep is sharded over
    sphere_offset: jax.Array | int = 0,  # global index of sweep row 0
    ray_axis: str | None = None,  # mesh axis the ray lanes are sharded over
    ray_offset: jax.Array | int = 0,  # global ray index of lane 0 (RNG parity)
    key: jax.Array | None = None,  # PRNG key for stochastic roughness
) -> jax.Array:
    """Trace N rays to ``cfg.max_depth`` bounces; returns (N, 3) color.

    Misses contribute black (ref ``base.py:100``: color starts at (0,0,0)
    and only hit lanes are placed back).

    ``sweep_center``/``sweep_radius`` default to the scene's full sphere
    table; :mod:`.parallel.sharded` passes a per-chip shard plus the mesh
    axis name so the reductions above finish with collectives.  Material
    gather always reads the (replicated, tiny) full table.
    """
    dtype = cfg.dtype
    direction = jnp.asarray(direction, dtype)
    n = direction.shape[0]
    origin = jnp.broadcast_to(jnp.asarray(origin, dtype), direction.shape)
    cam_pos = jnp.asarray(scene.camera.position, dtype)
    light_pos = jnp.asarray(scene.lights.point_position, dtype)
    if sweep_center is None:
        sweep_center = scene.spheres.center
    if sweep_radius is None:
        sweep_radius = scene.spheres.radius
    smooth = cfg.visibility == VISIBILITY_SMOOTH
    atlas_dummy = scene.texture_atlas.shape[1] == 1 and scene.texture_atlas.shape[2] == 1
    # Varying-axes are read from the operand TYPES, not the axis names:
    # under ``shard_map(check_vma=False)`` (interpret-mode CI, where the
    # pallas interpreter cannot thread mixed-vma operands) the types carry
    # no vma and the kernels are called without vma annotations.
    vma_dir = frozenset(getattr(jax.typeof(direction), "vma", frozenset()))
    interp_sharded = cfg.pallas_interpret and ray_axis is not None and ray_axis in vma_dir
    from .ops.pallas_bounce_smooth_sub import MAX_BLK_SPHERES_SMOOTH

    smooth_tex_ok = atlas_dummy or scene.spheres.count <= MAX_BLK_SPHERES_SMOOTH
    if smooth and cfg.use_pallas and sphere_axis is None and key is None and smooth_tex_ok and not interp_sharded:
        # Fully-fused fwd+bwd smooth bounce (custom VJP); works inside
        # shard_map via vma on the kernel outputs (or with the checker
        # disabled in interpret mode).  Image atlases are supported by the
        # sublane kernels (in-kernel UV, external texel gather).
        return _trace_smooth_fused(origin, direction, scene, cfg, vma=vma_dir or None)
    # The fused hard-visibility kernels run per sphere shard; under sphere
    # sharding the in-kernel reductions finish with the collective combines
    # below (VERDICT r1 item 4).
    fused = cfg.use_pallas and not smooth and cfg.tie_mode == "first"
    if fused and sphere_axis is None and key is None and not cfg.ray_chunk:
        # Ray-sharded (or direct-API) big scenes take the tile-culled
        # kernels — 3x the blocked sweep at config 4 (docs/PERF.md) and
        # entirely shard-local (candidate masks, group sort, kernels).
        from .ops.pallas_culled import (
            MAX_CULL_DEPTH, MAX_CULL_EXACT, MIN_CULL_SPHERES, trace_fused_culled,
        )

        if (
            scene.spheres.count >= MIN_CULL_SPHERES
            and scene.spheres.n_exact <= MAX_CULL_EXACT
            and cfg.max_depth <= MAX_CULL_DEPTH
        ):
            return trace_fused_culled(origin, direction, scene, cfg, vma=vma_dir or None)
    if fused:
        from .ops.pallas_intersect import nearest_hit_pallas, shadow_hard_pallas, shadow_parts_pallas
    vma_sweep = frozenset(getattr(jax.typeof(sweep_center), "vma", frozenset()))
    kvma = set(vma_dir) | set(vma_sweep)
    sphere_vma_on = sphere_axis is not None and sphere_axis in vma_sweep

    def _sphere_varying(x: jax.Array) -> jax.Array:
        """Mark ray-state kernel operands varying over the sphere axis too
        (every pallas_call operand must agree on the varying set)."""
        if not sphere_vma_on or sphere_axis in getattr(jax.typeof(x), "vma", frozenset()):
            return x
        return jax.lax.pcast(x, (sphere_axis,), to="varying")
    stochastic = cfg.stochastic_roughness and key is not None
    # Double-shade exact nearest-hit ties (ref base.py:103,119 semantics).
    tie_sum = cfg.tie_mode == "sum" and not smooth and not fused
    # Sphere-sharded SMOOTH sweeps through per-shard partial kernels: the
    # XLA fallback materializes (N, S_local) tables per bounce; the
    # kernels reduce in-kernel (O(N + S) HBM) and the collectives below
    # finish — the smooth analog of the fused-hard shard path.
    sm_parts = smooth and sphere_axis is not None and cfg.use_pallas
    if sm_parts:
        from .ops.pallas_smooth_parts import smooth_clear_parts_pallas, smooth_nearest_parts_pallas
    # Sphere-sharded two-tier split: the global exact suffix covers
    # different LOCAL rows on each shard, which the static per-shard
    # n_exact count cannot express (see _sweep).  Build the global-index
    # tier mask; only needed when the split cuts strictly inside the
    # table (0 < E < S — the all-plain/all-stable ends are shard-uniform).
    exact_mask = None
    if sphere_axis is not None and cfg.stable_intersect:
        n_ex, s_glob = scene.spheres.n_exact, scene.spheres.count
        if 0 < n_ex < s_glob:
            s_loc = sweep_center.shape[0]
            exact_mask = (
                jnp.arange(s_loc, dtype=jnp.int32) + sphere_offset >= s_glob - n_ex
            )

    def bounce(carry, _):
        if stochastic:
            from .ops.rng import fold_seed

            o, d, throughput, alive, accum, k = carry
            k, k_bounce = fold_seed(k, 1), fold_seed(k, 2)
        else:
            o, d, throughput, alive, accum = carry

        if fused:
            # Sphere-sharded tiering note: the kernels clamp the static
            # global n_exact to min(n_exact, s_local) per shard, which can
            # only UPGRADE globally-cheap rows to compensated math (the
            # global exact suffix is always covered — see _sweep's
            # exact_mask derivation).  Accuracy-conservative; the fused
            # path never does bitwise tie detection (tie_mode="first"
            # only), so the rounding difference vs single-chip is benign.
            res = None
            near_l = nearest_hit_pallas(
                _sphere_varying(o),
                _sphere_varying(d),
                sweep_center,
                sweep_radius,
                cfg.faraway,
                n_exact=scene.spheres.n_exact,
                block_rays=cfg.block_rays,
                block_spheres=cfg.block_spheres,
                interpret=cfg.pallas_interpret,
                vma=kvma or None,
            )
            if sphere_axis is None:
                near = near_l
            else:
                near = _combine_nearest_reduced(
                    near_l.t, near_l.idx + sphere_offset, cfg.faraway, sphere_axis
                )
        elif sm_parts:
            res = None
            parts = smooth_nearest_parts_pallas(
                _sphere_varying(o),
                _sphere_varying(d),
                sweep_center,
                sweep_radius,
                cfg.faraway,
                n_exact=scene.spheres.n_exact,
                block_rays=cfg.block_rays,
                block_spheres=cfg.block_spheres,
                interpret=cfg.pallas_interpret,
                vma=kvma or None,
            )
            near = _combine_nearest_reduced(
                parts.t, parts.idx + sphere_offset, cfg.faraway, sphere_axis
            )
        else:
            res = _sweep(
                o, d, sweep_center, sweep_radius, cfg,
                n_exact=scene.spheres.n_exact,
                pin=sphere_axis is not None or tie_sum,
                exact_mask=exact_mask,
            )
            near = _combine_nearest(res.t, cfg.faraway, sphere_axis, sphere_offset)

        if smooth:
            if sm_parts:
                idx, cover = _smooth_winner_cover_parts(
                    parts, near, sphere_axis, sphere_offset, cfg.edge_sharpness
                )
                coverage = cover * alive
            else:
                idx = _smooth_winner_idx(res, near, sphere_axis, sphere_offset)
                coverage = _coverage_at(res, idx, cfg.edge_sharpness, sphere_axis, sphere_offset) * alive
        else:
            idx = near.idx
            coverage = near.hit.astype(dtype) * alive

        # Sanitize t so dead lanes stay finite (masked-lane contract).
        t_safe = jnp.where(near.hit, near.t, jnp.ones_like(near.t))
        mat: LaneMaterial = gather_material(scene.spheres, idx)

        p = o + d * t_safe[:, None]  # shader.py:73
        normal = (p - mat.center) * (1.0 / mat.radius)[:, None]  # shader.py:74
        to_light = normalize(light_pos[None, :] - p)  # shader.py:75
        to_camera = normalize(cam_pos[None, :] - p)  # shader.py:76 — ORIGINAL camera, every bounce
        p_nudged = p + normal * NUDGE  # shader.py:77

        if fused:
            # Visibility is a step function — constant under AD, exactly
            # like the XLA hard path's comparison (zero tangent).
            sg = jax.lax.stop_gradient
            if sphere_axis is None:
                in_light = shadow_hard_pallas(
                    sg(p_nudged),
                    sg(to_light),
                    sg(sweep_center),
                    sg(sweep_radius),
                    idx,
                    cfg.faraway,
                    n_exact=scene.spheres.n_exact,
                    block_rays=cfg.block_rays,
                    block_spheres=cfg.block_spheres,
                    interpret=cfg.pallas_interpret,
                    vma=kvma or None,
                )
            else:
                # Per-shard (min over others, t of self) partials, then
                # pmin combines — shader.py:127-128 semantics across the
                # sphere mesh axis.
                t_others_l, t_self_l = shadow_parts_pallas(
                    _sphere_varying(sg(p_nudged)),
                    _sphere_varying(sg(to_light)),
                    sg(sweep_center),
                    sg(sweep_radius),
                    idx - sphere_offset,  # local index within this shard
                    cfg.faraway,
                    n_exact=scene.spheres.n_exact,
                    block_rays=cfg.block_rays,
                    block_spheres=cfg.block_spheres,
                    interpret=cfg.pallas_interpret,
                    vma=kvma or None,
                )
                t_others = jax.lax.pmin(t_others_l, sphere_axis)
                t_self = jax.lax.pmin(t_self_l, sphere_axis)
                in_light = (t_self <= t_others).astype(dtype)
        elif sm_parts:
            clear_l = smooth_clear_parts_pallas(
                _sphere_varying(p_nudged),
                _sphere_varying(to_light),
                sweep_center,
                sweep_radius,
                idx - sphere_offset,  # local index within this shard
                cfg.faraway,
                cfg.shadow_sharpness,
                n_exact=scene.spheres.n_exact,
                block_rays=cfg.block_rays,
                block_spheres=cfg.block_spheres,
                interpret=cfg.pallas_interpret,
                vma=kvma or None,
            )
            # Same collective form as _shadow_smooth: differentiable
            # all_gather product, then exact re-invariance.
            clear = jnp.prod(jax.lax.all_gather(clear_l, sphere_axis), axis=0)
            in_light = _invariant(clear, sphere_axis).astype(dtype)
        else:
            shadow_res = _sweep(
                p_nudged, to_light, sweep_center, sweep_radius, cfg,
                n_exact=scene.spheres.n_exact, pin=sphere_axis is not None,
                exact_mask=exact_mask,
            )
            if smooth:
                in_light = _shadow_smooth(shadow_res, idx, cfg, sphere_axis, sphere_offset, dtype)
            else:
                in_light = _shadow_hard(shadow_res, idx, sphere_axis, sphere_offset, dtype)
        local = shade(p, normal, to_light, to_camera, in_light, mat, scene)

        accum = accum + local.color * (throughput * coverage)[:, None]
        if tie_sum:
            # Second tied winner: HIGHEST index whose t equals the winning
            # t bitwise (the sweep result is pinned by a barrier, so both
            # sides read one canonical computation).  Shade it too and add
            # — the reference shades every sphere at the minimum distance
            # and sums (base.py:103,119).  2-way ties only; the mirror
            # continuation stays with the lowest-index winner.
            gidx = jnp.arange(res.t.shape[1], dtype=jnp.int32)[None, :] + sphere_offset
            tied = res.t == near.t[:, None]
            idx2_l = jnp.max(jnp.where(tied, gidx, -1), axis=1)
            idx2 = jax.lax.pmax(idx2_l, sphere_axis) if sphere_axis is not None else idx2_l
            has2 = near.hit & (idx2 != idx)
            idx2 = jnp.where(has2, idx2, idx)
            mat2: LaneMaterial = gather_material(scene.spheres, idx2)
            normal2 = (p - mat2.center) * (1.0 / mat2.radius)[:, None]
            p_nudged2 = p + normal2 * NUDGE
            shadow_res2 = _sweep(
                p_nudged2, to_light, sweep_center, sweep_radius, cfg,
                n_exact=scene.spheres.n_exact, pin=sphere_axis is not None,
                exact_mask=exact_mask,
            )
            in_light2 = _shadow_hard(shadow_res2, idx2, sphere_axis, sphere_offset, dtype)
            local2 = shade(p, normal2, to_light, to_camera, in_light2, mat2, scene)
            w2 = throughput * coverage * has2.astype(dtype)
            accum = accum + local2.color * w2[:, None]
            if cfg.max_depth > 1:
                # Both tied winners spawn mirror recursion upstream: each
                # shaded batch calls _calculate_reflection (base.py:110 ->
                # shader.py:96,152), so the second winner's bounce tree
                # contributes too.  The continuation is linear in its
                # entry weight, so it runs as a NESTED fixed-depth trace
                # scaled by w2 * refl_coeff2.  Ties inside that
                # continuation follow lowest-index (ties-of-ties are
                # measure-zero squared); cost is O(depth^2) bounces —
                # tie_mode="sum" is the exactness mode, not the fast path.
                import dataclasses

                sub_cfg = dataclasses.replace(
                    cfg, max_depth=cfg.max_depth - 1, tie_mode="first", use_pallas=False
                )
                cont2 = trace(
                    p_nudged2, reflect(d, normal2), scene, sub_cfg,
                    sweep_center=sweep_center, sweep_radius=sweep_radius,
                    sphere_axis=sphere_axis, sphere_offset=sphere_offset,
                    ray_axis=ray_axis,
                )
                accum = accum + cont2 * (w2 * local2.refl_coeff)[:, None]
        throughput = throughput * coverage * local.refl_coeff
        alive = coverage if smooth else (alive * near.hit.astype(dtype))

        o_next = p_nudged
        if stochastic:
            # Glossy reflection: jitter the mirror by a GGX-sampled
            # microfacet (the old engine's stochastic roughness, SURVEY §4).
            from .ops.rng import uniform2
            from .ops.vecmath import ggx_perturb_reflect

            xi = uniform2(k_bounce, n, dtype, offset=ray_offset)
            d_next = ggx_perturb_reflect(d, normal, mat.specular_roughness, xi)
            return (o_next, d_next, throughput, alive, accum, k), None
        d_next = reflect(d, normal)  # shader.py:151
        return (o_next, d_next, throughput, alive, accum), None

    init = (
        origin,
        direction,
        jnp.ones((n,), dtype),
        jnp.ones((n,), dtype),
        jnp.zeros((n, 3), dtype),
    )
    if stochastic:
        init = init + (key,)
    if ray_axis is not None and ray_axis in vma_dir:
        # Inside shard_map the scan carry becomes varying over the ray axis
        # on the first iteration; mark the init likewise so the carry types
        # are invariant (required by the VMA checker).  When the checker is
        # OFF (check_vma=False, interpret-mode CI — detectable as the
        # sharded direction operand carrying no vma) the pcast is a no-op
        # whose TRANSPOSE is a psum that then fails the vma type check, so
        # it must be skipped entirely — this is what let interpret-mode
        # sharded gradients run at all.
        def to_varying(x: jax.Array) -> jax.Array:
            if ray_axis in getattr(jax.typeof(x), "vma", frozenset()):
                return x
            return jax.lax.pcast(x, (ray_axis,), to="varying")

        init = jax.tree_util.tree_map(to_varying, init)
    step = jax.checkpoint(bounce) if cfg.remat else bounce
    final, _ = jax.lax.scan(step, init, None, length=cfg.max_depth)
    return final[4]


def _trace_smooth_fused(origin, direction, scene, cfg, vma=None, transposed=False, key=None):
    """Dispatch between the fused smooth implementations.

    Big scenes at big frames take the CULLED smooth path (per-tile
    candidate lists with exact sigmoid-underflow margins —
    :mod:`.ops.pallas_culled_smooth`).  Otherwise sphere tables up to
    MAX_BLK_SPHERES_SMOOTH take the sublane-packed kernels (full-width
    VPU tiles; unrolled sphere loops for tiny tables, fori_loop blocked
    mode past MAX_SUB_SPHERES_SMOOTH — see docs/PERF.md).  Bigger tables
    fall back to the blocked lane kernels whose sweeps amortize over
    (K, B) tiles.  Stochastic roughness (``key``) is supported only by
    the sublane pair (callers gate on MAX_BLK_SPHERES_SMOOTH).
    """
    from .ops.pallas_bounce_smooth_sub import MAX_BLK_SPHERES_SMOOTH, trace_fused_smooth_sub

    n_rays = direction.shape[1] if transposed else direction.shape[0]
    from .ops.pallas_culled_smooth import cull_smooth_ok, trace_culled_smooth

    if cull_smooth_ok(scene, cfg, n_rays):
        return trace_culled_smooth(
            origin, direction, scene, cfg, vma=vma, transposed=transposed, key=key
        )
    if scene.spheres.count <= MAX_BLK_SPHERES_SMOOTH:
        return trace_fused_smooth_sub(
            origin, direction, scene, cfg, vma=vma, transposed=transposed, key=key
        )
    assert key is None, "stochastic smooth requires the sublane kernels"
    from .ops.pallas_bounce_smooth import trace_fused_smooth

    return trace_fused_smooth(origin, direction, scene, cfg, vma=vma, transposed=transposed)


def _can_fuse_bounce(scene: Scene, cfg: RenderConfig) -> bool:
    """The fully-fused bounce kernels cover: Pallas on, no ray chunking.
    Hard visibility uses the forward-only kernel (which samples image
    atlases in-kernel up to MAX_FUSED_TEXELS); smooth uses the fwd+bwd
    custom-VJP pair (const/checker textures only).  Everything else falls
    back to the XLA path."""
    atlas = scene.texture_atlas
    atlas_dummy = atlas.shape[1] == 1 and atlas.shape[2] == 1
    if cfg.visibility == VISIBILITY_SMOOTH:
        from .ops.pallas_bounce_smooth_sub import MAX_BLK_SPHERES_SMOOTH

        tex_ok = atlas_dummy or scene.spheres.count <= MAX_BLK_SPHERES_SMOOTH
    else:
        from .ops.pallas_bounce import MAX_FUSED_TEXELS
        from .ops.pallas_bounce_sub import MAX_SUB_SPHERES
        from .ops.pallas_culled import MAX_CULL_DEPTH, MAX_CULL_EXACT, MIN_CULL_SPHERES

        # Culled-eligible scenes sample atlases via the external texel
        # gather — no size cap (mirror _render_sample's routing so a big
        # textured scene never falls through to the capped lane kernel).
        culled_ok = (
            scene.spheres.count >= MIN_CULL_SPHERES
            and scene.spheres.n_exact <= MAX_CULL_EXACT
            and cfg.max_depth <= MAX_CULL_DEPTH
        )
        tex_ok = (
            atlas_dummy
            or scene.spheres.count <= MAX_SUB_SPHERES  # sub kernel: no texel cap
            or culled_ok
            or atlas.shape[0] * atlas.shape[1] * atlas.shape[2] <= MAX_FUSED_TEXELS
        )
        if cfg.tie_mode != "first":
            return False  # double-shading ties needs the (N, S) tables
    return cfg.use_pallas and tex_ok and not cfg.ray_chunk


def _render_sample(scene: Scene, cfg: RenderConfig, jitter: jax.Array | None, key: jax.Array | None) -> jax.Array:
    """One (optionally jittered) sample per pixel → flat (H*W, 3) colors.

    With ``cfg.ray_chunk > 0`` the trace runs as a sequential ``lax.map``
    over ray tiles, bounding peak memory at O(chunk * spheres) — how huge
    frames x huge sphere counts fit on one chip without the Pallas path.
    """
    from .ops.pallas_bounce_sub import MAX_SUB_SPHERES, trace_fused_sub

    atlas = scene.texture_atlas
    atlas_dummy = atlas.shape[1] == 1 and atlas.shape[2] == 1
    # The sublane kernel samples image atlases via the external texel
    # gather — no atlas size cap.
    sub_ok = scene.spheres.count <= MAX_SUB_SPHERES
    # The sublane kernels cover stochastic glossy bounces in BOTH modes
    # (hard forward-only; smooth fwd+bwd with the perturbation adjoint),
    # xi fed from the host PRNG; bigger tables with a key fall back.
    from .ops.pallas_bounce_smooth_sub import MAX_BLK_SPHERES_SMOOTH

    smooth_sub_ok = scene.spheres.count <= MAX_BLK_SPHERES_SMOOTH
    key_ok = key is None or (
        (sub_ok and cfg.visibility != VISIBILITY_SMOOTH)
        or (smooth_sub_ok and cfg.visibility == VISIBILITY_SMOOTH)
    )
    if _can_fuse_bounce(scene, cfg) and key_ok:
        # Lane-major (3, N) rays end to end — no 6 MB relayout per frame
        # (measured ~3 ms of fixed per-frame cost in the transposes).
        from .camera import ray_directions_t

        jitter_t = None if jitter is None else jitter.T
        dirs_t = ray_directions_t(scene.camera, cfg.dtype, jitter_t)
        if cfg.visibility == VISIBILITY_SMOOTH:
            return _trace_smooth_fused(
                scene.camera.position, dirs_t, scene, cfg, transposed=True, key=key
            )
        from .ops.pallas_culled import MAX_CULL_DEPTH, MAX_CULL_EXACT, MIN_CULL_SPHERES, trace_fused_culled

        s = scene.spheres.count
        if (
            key is None
            and s >= MIN_CULL_SPHERES
            and scene.spheres.n_exact <= MAX_CULL_EXACT
            and cfg.max_depth <= MAX_CULL_DEPTH
        ):
            # Big scene: per-tile candidate-list culling (O(candidates)
            # per ray).  Reflected bounces re-sort rays by (origin cell,
            # direction bin) so the culling keeps working at depth and
            # dead rays compact into skipped tiles (docs/PERF.md).  Image
            # atlases ride the external texel gather — no size cap.
            return trace_fused_culled(scene.camera.position, dirs_t, scene, cfg, transposed=True)
        if sub_ok:
            return trace_fused_sub(scene.camera.position, dirs_t, scene, cfg, transposed=True, key=key)
        from .ops.pallas_bounce import trace_fused

        return trace_fused(scene.camera.position, dirs_t, scene, cfg, transposed=True)
    dirs = ray_directions(scene.camera, cfg.dtype, jitter)
    n = dirs.shape[0]
    if cfg.ray_chunk and n > cfg.ray_chunk:
        chunk = cfg.ray_chunk
        n_pad = -(-n // chunk) * chunk
        if n_pad != n:
            dirs = jnp.concatenate([dirs, jnp.broadcast_to(dirs[:1], (n_pad - n, 3))], axis=0)
        tiles = dirs.reshape(n_pad // chunk, chunk, 3)
        if key is None:
            color = jax.lax.map(lambda d: trace(scene.camera.position, d, scene, cfg), tiles)
        else:
            from .ops.rng import fold_seed

            keys = fold_seed(key, jnp.arange(tiles.shape[0], dtype=jnp.uint32))
            color = jax.lax.map(
                lambda dk: trace(scene.camera.position, dk[0], scene, cfg, key=dk[1]),
                (tiles, keys),
            )
        color = color.reshape(n_pad, 3)[:n]
    else:
        color = trace(scene.camera.position, dirs, scene, cfg, key=key)
    return color


def fused_train_l2_ok(scene: Scene, cfg: RenderConfig) -> bool:
    """Is the single-launch fused train-step kernel applicable?

    Scope of :func:`l2_loss_fused`: smooth visibility through the sublane
    kernels (unrolled or blocked), const/checker textures, one center ray
    per pixel, depth inside the in-kernel unroll cap.  Everything else
    keeps the two-launch custom-VJP route.
    """
    from .ops.pallas_bounce_smooth_sub import MAX_FUSE_DEPTH, MAX_FUSED_TRAIN_SPHERES
    from .ops.pallas_culled_smooth import cull_smooth_ok

    atlas = scene.texture_atlas
    atlas_dummy = atlas.shape[1] == 1 and atlas.shape[2] == 1
    # Big-scene big-frame training routes through the CULLED smooth path
    # (render() -> _trace_smooth_fused): candidate-swept sweeps beat the
    # single-launch kernel's full-table sweeps there.
    n_rays = scene.camera.width * scene.camera.height
    if cfg.visibility == VISIBILITY_SMOOTH and cull_smooth_ok(scene, cfg, n_rays):
        return False
    return (
        cfg.use_pallas
        and cfg.visibility == VISIBILITY_SMOOTH
        and 2 <= cfg.max_depth <= MAX_FUSE_DEPTH
        and cfg.samples_per_pixel == 1
        and atlas_dummy
        and scene.spheres.count <= MAX_FUSED_TRAIN_SPHERES
        and not cfg.ray_chunk
    )


def l2_loss_fused(scene: Scene, target: jax.Array, cfg: RenderConfig) -> jax.Array:
    """``l2_image_loss(render(scene, cfg), target)`` as ONE kernel launch.

    The fused train kernel traces forward, forms the elementwise loss
    cotangent against the packed target in-kernel, and runs the adjoint
    chain in reverse — no residual HBM round trip, no forward replay, no
    loss glue.  Callers gate on :func:`fused_train_l2_ok`.
    """
    from .camera import ray_directions_t
    from .ops.pallas_bounce_smooth_sub import fused_train_l2

    dirs_t = ray_directions_t(scene.camera, cfg.dtype, None)
    key = None
    if cfg.stochastic_roughness:
        # EXACT seed schedule of render()'s sample loop at spp == 1, i = 0.
        from .ops.rng import fold_seed, seed_root

        key = fold_seed(fold_seed(seed_root(cfg.rng_seed), 0), 4)
    tgt = jnp.asarray(target, cfg.dtype).reshape(-1, 3)
    return fused_train_l2(
        scene.camera.position, dirs_t, tgt, scene, cfg, transposed=True, key=key
    )


def render(scene: Scene, cfg: RenderConfig) -> jax.Array:
    """Render the scene to an (H, W, 3) float image (unclipped).

    The full pipeline of ``application.py:43-52``: camera ray generation →
    trace → (quantization lives in :mod:`.utils.image`).

    ``cfg.samples_per_pixel > 1`` averages jittered subpixel samples (a
    sequential scan — memory stays at one frame);
    ``cfg.stochastic_roughness`` draws glossy reflection directions.  Both
    are deterministic functions of ``cfg.rng_seed``.
    """
    h, w = scene.camera.height, scene.camera.width
    spp = cfg.samples_per_pixel
    if spp == 1 and not cfg.stochastic_roughness:
        color = _render_sample(scene, cfg, None, None)
        return color.reshape(h, w, 3)

    from .ops.rng import fold_seed, seed_root, uniform2

    base = seed_root(cfg.rng_seed)
    n = h * w

    def sample(acc, i):
        k = fold_seed(base, i)
        k_jit, k_trace = fold_seed(k, 3), fold_seed(k, 4)
        jitter = uniform2(k_jit, n, cfg.dtype) - 0.5 if spp > 1 else None
        color = _render_sample(scene, cfg, jitter, k_trace if cfg.stochastic_roughness else None)
        return acc + color, None

    acc, _ = jax.lax.scan(sample, jnp.zeros((n, 3), cfg.dtype), jnp.arange(spp))
    return (acc / spp).reshape(h, w, 3)


_render_jit = jax.jit(render, static_argnums=1)


def render_jit(scene: Scene, cfg: RenderConfig) -> jax.Array:
    """Jitted :func:`render` with a persistent compilation cache."""
    return _render_jit(scene, cfg)

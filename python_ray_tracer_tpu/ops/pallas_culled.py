"""Tile-culled bounce path: the acceleration structure for big scenes.

The fused kernels sweep every sphere for every ray — O(S) per ray caps
BASELINE config 4 (1024 spheres, 1920x1080, depth 4) at ~7 Mrays/s
(VERDICT r1 item 2).  The reference has no acceleration structure either
(``shape.py:28-51`` is called per shape per batch, ``base.py:97``); this
module adds the TPU-native equivalent of one:

* Every consecutive ``_BOUND_G``-ray run is bounded by componentwise
  intervals of its origins/directions AND a point-apex cone; each
  (group, sphere) pair gets CONSERVATIVE algebraic tests (interval
  point-line distance ∧ cone containment — no transcendentals), and a
  ray tile's candidate set is the UNION of its groups' masks.  False
  negatives are impossible, so the image matches the unculled sweep up
  to selection-root rounding; false positives only cost speed.
* Shadow lists get a third, far tighter test: every shadow LINE passes
  through the point light, so a group's line family is a DOUBLE cone
  with a point apex at the light (both nappes — the reference's shadow
  t is unbounded, so occluders beyond the light still block).
* A stable argsort turns the mask into per-tile candidate lists
  (ascending sphere index — preserving lowest-index-wins tie
  semantics); the kernels ``fori_loop`` over ``count`` candidates with
  dynamic SMEM scalar reads instead of sweeping all S spheres.
* Sweeps SELECT on a cheap naive-root quadratic (``_sphere_sol_fast``)
  and recompute the winner's t exactly once per tile.
* The bounce splits into TWO kernels so the shadow sweep can be culled
  against the *actual* hit points: culled nearest-hit -> XLA glue
  (winner material take, hit point, shadow-ray bounds) -> culled
  shadow + shading + mirror continuation.

Primary tiles are scanline strips (narrow direction cones) and shadow
rays converge on the light, so typical candidate counts are a small
fraction of S.  Reflected bounces scatter a tile's directions over the
hemisphere, so before each reflected sweep the whole ray state is
RE-SORTED (dead rays last, live rays binned by origin cell + direction
bin — ``ray_sort_keys``): tiles become coherent cones again and the
culling keeps paying at depth, while spent rays compact into tiles the
energy cut skips outright.  A carried group id undoes the permutation
at the end (block gather — cheap).

Scope: hard visibility, const/checker/image textures (image texel colors
are gathered OUTSIDE the kernel from exported flat ids + dww weights —
no atlas size cap), forward-only (config 4 is a forward benchmark;
training runs through the smooth kernels), exact tier small (swept
unconditionally, unrolled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene
from .pallas_bounce import (
    _CX, _CY, _CZ, _RAD, _DG, _DCR, _DCG, _DCB, _SG, _ROUGH, _IG, _IOR,
    _TFW, _TFT, _TFI, _KIND, _TID, _TEXH, _TEXW, _material_table,
    _asin_poly, _atan2_poly,
)
from .pallas_bounce_sub import _SUBLANES, _consts_row, _geometry_table, _sphere_t, _sphere_t_exact
from .pallas_intersect import _round_up
from .shading import AMBIENT, GLINT_EXPONENT, NUDGE, SHADING_EPS

# Culling pays off when the per-sphere interval tests are cheap relative
# to the sweeps they remove; below this the plain sublane kernel wins.
MIN_CULL_SPHERES = 96
MAX_CULL_EXACT = 8  # exact-tier spheres are swept unconditionally
# Reflected bounces are RE-SORTED before each sweep (dead rays last,
# live rays binned by origin cell + direction bin) so their tiles become
# coherent again and the candidate culling keeps working at depth;
# measured faster than the blocked lane kernel at every depth tried
# (docs/PERF.md), so the culled path now owns all depths.
MAX_CULL_DEPTH = 4096

# Material columns the shade kernel consumes (pre-gathered by winner
# index in XLA glue).  Geometry columns are NOT here: hit point and
# normal come out of the nearest kernel directly.  Atlas scenes add the
# texture id + native extents (the in-kernel work is only the flat texel
# index; the texel color is gathered OUTSIDE by XLA — no atlas size cap,
# the same scheme as the sublane kernels).
_MCOLS = (_DG, _DCR, _DCG, _DCB, _SG, _ROUGH, _IG, _IOR, _TFW, _TFT, _TFI, _KIND)
_MCOLS_TEX = _MCOLS + (_TID, _TEXH, _TEXW)

# How the shade kernel obtains the winner's material row:
#   "xla"       — glue pre-gathers (12, 8, M) rows with one per-lane take
#                 (row-count-bound: 11 + 3.7 ms per config-4 frame).
#   "direct"    — kernel gathers from a VMEM (12, S_pad) table with one
#                 cross-vreg take_along_axis per channel.
#   "piecewise" — same, but phrased as (8, 128)-tile gathers + selects
#                 (the conservative form if Mosaic rejects cross-vreg
#                 lane gathers).
# benchmarks/gather_probe.py measures which of these this jaxlib lowers
# and how fast; parity across all three is pinned by tests/test_culled.py.
# On-chip A/B at config 4 (benchmarks/culled_ab.py, 2026-08-19): "direct"
# fails Mosaic lowering (the gather rule asserts the indices/operand
# shape form); "piecewise" lowers and beats "xla" 0.0756 vs 0.0925
# s/frame — the (8,128)-tile gather+select form keeps the material take
# in VMEM instead of a row-count-bound 2M-row HBM take.
MAT_GATHER_MODE = "piecewise"

# Reflected-bounce re-sort granularity: contiguous ray groups moved as
# blocks (block gathers are row-count-bound at ~92 M rows/s; per-ray
# and per-element gathers are 4-20x slower however phrased — see
# trace_fused_culled).  Must divide the tile size (8*b_cols).
# On-chip A/B at config 4 (benchmarks/culled_ab.py, 2026-08-19):
# g64 0.0925 / g32 0.0891 / g16 0.1013 / g8 0.1176 s per frame — the
# CPU sweep-work curve (colsort_stats.py) keeps improving down to g8,
# but the finer interleaved (ng, 11*G) gather overtakes the sweep
# savings below 32.  32 is the measured frame-time optimum.
_SORT_G = 32

# Bound-group granularity for the candidate masks: every consecutive
# _BOUND_G-ray run gets its own conservative bounds (box + cone),
# OR-ed into its tile's candidate list.  With _SORT_G=32 finer than
# _BOUND_G=64, a bound group can MIX rays from two adjacent sort groups
# — still conservative (bounds are recomputed from post-sort ray state
# over whatever 64 rays land in the run), just potentially looser than
# when the two granularities matched.  The g32 sort still measured
# fastest end-to-end despite this (benchmarks/culled_ab.py, 2026-08-19:
# g64 0.0925 / g32 0.0891 s per frame); bound32 was re-swept after the
# flip and LOST (docs/PERF.md knob re-sweep), so 64 stays.
_BOUND_G = 64

# Ray-tile size for the culled kernels.  Smaller tiles bound tighter
# interval cones (tile1024 sweeps 30% of spheres vs 43% at tile4096
# after the reflected-bounce sort) at the cost of more candidate-build
# work; benchmarks/cull_attrib.py A/Bs this on the chip.
CULL_BLOCK_RAYS = 4 * _SUBLANES * 128

# From this bounce index on, SKIP the candidate build (interval tests +
# argsort + counts) and run full-table sweeps for live tiles — the
# cnt_full overflow path the kernels already have.  The r3 CPU probe
# measured bounce >= 2 candidate lists at essentially the whole table
# (nearest 244k/258k candidate-tiles at bounces 2-3, docs/PERF.md), so
# the build there buys nothing; the re-sort stays (it feeds the dead-ray
# tile compaction).  On-chip A/B (benchmarks/culled_ab.py, 2026-08-20):
# base 0.0718 / fullsweep1 0.0788 / fullsweep2 0.0652 / fullsweep3
# 0.0686 s per config-4 frame — bounce 1 still culls (51k/187k
# candidate-tiles), bounces 2+ don't.  2 is the measured optimum;
# bitwise-identical images (tests/test_culled.py).
FULL_SWEEP_FROM_BOUNCE: int | None = 2


def _interval_prod(al, ah, bl, bh):
    p1, p2, p3, p4 = al * bl, al * bh, ah * bl, ah * bh
    lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    return lo, hi


def interval_hit_mask(
    o_lo: jax.Array,  # (T, 3) per-tile origin bounds
    o_hi: jax.Array,
    d_lo: jax.Array,  # (T, 3) per-tile UNIT-direction bounds
    d_hi: jax.Array,
    center: jax.Array,  # (S, 3)
    radius: jax.Array,  # (S,)
    t_margin: float = 0.0,
    both_nappes: bool = False,
) -> jax.Array:
    """(T, S) bool: could ANY ray in the tile's interval box hit sphere s?

    Uses dist^2(line, C) = |oc|^2 - (d.oc)^2 for unit d, bounded from
    below with interval arithmetic; a forward hit additionally needs the
    closest-approach parameter t* = -d.oc to admit a positive value (or
    the origin box to overlap the sphere).  Conservative by construction.

    ``t_margin`` (smooth culling): admit spheres whose nearest root /
    closest-approach parameter could be as low as ``-t_margin`` — the
    smooth kernels' ``sigmoid(sharp * sol)`` is nonzero down to
    ``sol = -90/sharp``.  Any such sphere's center lies within
    ``radius + t_margin`` of some ray origin (|oc| <= |sol| + r), so the
    behind-the-origin clause widens by exactly that.  Pass the INFLATED
    radius (``sqrt(r^2 + m/4)``, covering ``sigmoid(sharp * disc)``)
    through ``radius`` — proof in docs/PERF.md (smooth culling margins).

    ``both_nappes`` (smooth NEAREST lists): keep ONLY the line-distance
    test — no forward/behind clause at all.  The smooth nearest kernel's
    miss-lane fallback is the argmax of ``disc`` over ALL spheres, and a
    sphere entirely BEHIND the ray (sol far below the margin, coverage
    exactly 0) can win that race whenever its line distance is under the
    radius; if it is culled, the kernel falls back to a different sphere
    whose coverage need not be 0 (the r5 480x270 parity bug: self-sphere
    fallback with cov 0.5 vs a behind sphere with cov 0).  With the test
    reduced to line distance vs the INFLATED radius, exclusion implies
    ``disc < -90/sharp`` for every lane, so sigmoid(disc) == 0 in f32 and
    BOTH the excluded sphere and any candidate the fallback picks instead
    carry exactly zero coverage — winner identity can only differ where
    every choice contributes nothing (and kills the lane either way).
    """
    oc_l = o_lo[:, None, :] - center[None, :, :]  # (T, S, 3)
    oc_h = o_hi[:, None, :] - center[None, :, :]
    straddle = (oc_l <= 0) & (oc_h >= 0)
    comp_min2 = jnp.where(straddle, 0.0, jnp.minimum(oc_l**2, oc_h**2))
    n2_lo = comp_min2.sum(-1)  # lower bound of |oc|^2

    s_lo = jnp.zeros_like(n2_lo)
    s_hi = jnp.zeros_like(n2_lo)
    for i in range(3):
        lo, hi = _interval_prod(
            d_lo[:, None, i], d_hi[:, None, i], oc_l[..., i], oc_h[..., i]
        )
        s_lo = s_lo + lo
        s_hi = s_hi + hi
    s2_hi = jnp.maximum(s_lo**2, s_hi**2)
    dist2_lo = n2_lo - s2_hi
    r2 = (radius**2)[None, :]
    if both_nappes:
        return dist2_lo <= r2
    rt2 = ((radius + t_margin) ** 2)[None, :] if t_margin else r2
    return (dist2_lo <= r2) & ((s_lo < 0) | (n2_lo <= rt2))


def pack_tiles(x_t: jax.Array, b_cols: int) -> jax.Array:
    """(C, N_pad) -> (C, 8, M) with each (8, b_cols) tile = 8*b_cols
    CONSECUTIVE rays.

    A plain reshape would put each tile's 8 sublane rows in 8 far-apart
    image strips — the tile's direction bounds would span most of the
    frustum and cull nothing.  Tile-contiguous packing keeps a tile a few
    consecutive scanline segments: a narrow cone.
    """
    c, n_pad = x_t.shape
    nt = n_pad // (b_cols * _SUBLANES)
    return (
        x_t.reshape(c, nt, _SUBLANES, b_cols).transpose(0, 2, 1, 3).reshape(c, _SUBLANES, nt * b_cols)
    )


def unpack_tiles(x3: jax.Array, b_cols: int) -> jax.Array:
    """Inverse of :func:`pack_tiles`: (C, 8, M) -> (C, N_pad)."""
    c, _, m = x3.shape
    nt = m // b_cols
    return x3.reshape(c, _SUBLANES, nt, b_cols).transpose(0, 2, 1, 3).reshape(c, m * _SUBLANES)


def _tile_bounds(
    v3: jax.Array, b_cols: int, valid: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """Per-tile componentwise (lo, hi) of a (3, 8, M) state array -> (T, 3).

    ``valid`` (8, M) masks lanes out of the bounds (identity elements for
    min/max): miss lanes carry junk hit points that would inflate the
    shadow-ray boxes to uselessness.  An all-dead tile yields lo > hi,
    which the interval test maps to an empty candidate set — correct,
    since no live ray exists there.
    """
    m = v3.shape[2]
    t = m // b_cols
    v = v3.reshape(3, _SUBLANES, t, b_cols)
    if valid is None:
        return v.min(axis=(1, 3)).T, v.max(axis=(1, 3)).T
    big = jnp.asarray(1.0e30, v3.dtype)
    vm = valid.reshape(1, _SUBLANES, t, b_cols)
    lo = jnp.where(vm, v, big).min(axis=(1, 3)).T
    hi = jnp.where(vm, v, -big).max(axis=(1, 3)).T
    return lo, hi



# Per-tile candidate cap: each tile carries a (MAX_CAND,) id row the
# kernels read from SMEM; a tile whose conservative count exceeds the
# cap falls back to the full sweep (cnt_full) — still exact, just
# unculled for that tile.  With ids only (no pre-gathered geometry) a
# generous cap is nearly free: 1024 beat 512 on the chip.
MAX_CAND = 1024

# Unroll factor for the dynamic sphere loops: each scalar-indexed
# candidate costs ~45 one-vreg vector ops; the serial scalar loads +
# loop control around them don't pipeline (measured ~4x slowdown vs the
# blocked sweep at one candidate per iteration).  Grouping U candidates
# per iteration amortizes the scalar path.
_UNROLL = 8


def _unrolled_loop(cnt, body_one, carry, unroll=_UNROLL):
    """fori_loop with a U-wide unrolled main loop + exact remainder."""
    groups = cnt // unroll

    def gbody(g, c):
        j0 = g * unroll
        for u in range(unroll):
            c = body_one(j0 + u, c)
        return c

    carry = jax.lax.fori_loop(0, groups, gbody, carry)
    return jax.lax.fori_loop(groups * unroll, cnt, body_one, carry)


# Sorts all spent rays to the tail.  Plain Python int, NOT a jnp
# constant: this module is imported lazily from inside jit traces
# (render.py), and a module-level traced array would escape its trace
# (observed UnexpectedTracerError when the first import happened under
# jit).
_DEAD_KEY = 1 << 24

# Debug hook (tests/benchmarks only): force individual candidate tests
# wide open to attribute a parity failure to one clause.
_DBG_FORCE: dict = {}


def ray_sort_keys(
    o_f: jax.Array,  # (3, N) ray origins, ray order
    d_f: jax.Array,  # (3, N) unit directions
    live: jax.Array,  # (N,) bool — carries visible energy
    bb_lo: jax.Array,  # (3,) scene bounding box (cheap tier)
    bb_hi: jax.Array,
) -> jax.Array:
    """Spatial-directional bin key per ray, dead rays last.

    Reflected bounces are tile-incoherent (a mirror sphere scatters a
    scanline tile's directions over the hemisphere), which defeats the
    per-tile interval culling.  Sorting rays by (origin cell, direction
    bin) re-establishes coherence: rays bouncing off the same sphere
    region into similar directions land in the same tile, so its interval
    box tightens back to a narrow cone.  Dead rays compact into all-dead
    tiles that the energy cut skips outright.

    Key layout (25 bits): dead(1) | cell_x(4) cell_z(4) cell_y(4) |
    dir_x(4) dir_y(4) dir_z(4).  16^3 origin cells over the cheap-tier
    bbox (huge exact-tier spheres like the ground would blow the grid;
    their hit points clamp to the boundary cells, which still separate
    them by x/z), 16 direction bins per axis.  Coarser cells + finer
    direction bins beat the first-cut 32^3x4^3 layout (43% vs 47% sweep
    work — benchmarks/sort_cull_stats.py): reflected cones diverge, so
    direction coherence matters more than origin locality.
    """
    inv = 15.0 / jnp.maximum(bb_hi - bb_lo, 1e-6)
    cell = [
        jnp.clip((o_f[a] - bb_lo[a]) * inv[a], 0.0, 15.0).astype(jnp.uint32)
        for a in range(3)
    ]
    dbin = [
        jnp.clip((d_f[a] + 1.0) * 8.0, 0.0, 15.0).astype(jnp.uint32)
        for a in range(3)
    ]
    key = (
        (cell[0] << jnp.uint32(20))
        | (cell[2] << jnp.uint32(16))
        | (cell[1] << jnp.uint32(12))
        | (dbin[0] << jnp.uint32(8))
        | (dbin[1] << jnp.uint32(4))
        | dbin[2]
    )
    return jnp.where(live, key, jnp.uint32(_DEAD_KEY) | key)


def _group_cull_mask(
    o3: jax.Array,  # (3, 8, M)
    d3: jax.Array,  # (3, 8, M)
    center: jax.Array,  # (S, 3)
    radius: jax.Array,  # (S,)
    b_cols: int,
    valid: jax.Array | None,
    light: jax.Array | None = None,  # (3,) — shadow rays aim at this point
    t_margin: float = 0.0,  # smooth-mode sol margin (see interval_hit_mask)
    both_nappes: bool = False,  # smooth NEAREST lists (see interval_hit_mask)
) -> jax.Array:
    """(T, S) candidate mask as the UNION of per-_BOUND_G-ray-group tests.

    One interval box over a whole 4096-ray tile is hopeless after a
    mirror bounce: the measured false-positive rate was 94% (mean 419
    candidates listed vs 25 actually hit — benchmarks/key_layout_probe
    .py).  Bounding each 64-ray group separately and OR-ing group masks
    into the tile list roughly halves the sweep work (mean 218).  Each
    group gets TWO conservative tests, AND-ed (the intersection of two
    conservative tests is conservative):

    * the componentwise interval box test (as before, per group), and
    * a point-apex cone test: apex = origin-box center, origin spread
      folded into the sphere radius, axis = mean direction, half-angle
      from the worst live ray.  ``cos b >= cos(theta + phi)`` evaluated
      purely algebraically (no transcendentals), with the wrap case
      ``theta + phi >= pi`` admitted unconditionally.

    Bound groups are consecutive _BOUND_G-ray runs.  The _SORT_G=32 sort
    is finer than _BOUND_G=64, so a run may mix rays from two sort
    groups; the bounds stay conservative for any grouping because they
    are recomputed from the post-sort ray state (see the _BOUND_G note).
    """
    dtype = o3.dtype
    sub, m = o3.shape[1], o3.shape[2]
    t = m // b_cols
    k = b_cols // _BOUND_G
    s = center.shape[0]

    def grouped(v3):
        return v3.reshape(3, sub, t, k, _BOUND_G)

    og, dg = grouped(o3), grouped(d3)
    big = jnp.asarray(1.0e30, dtype)
    if valid is None:
        vg = None
        o_lo = og.min(axis=-1)
        o_hi = og.max(axis=-1)
        d_lo = dg.min(axis=-1)
        d_hi = dg.max(axis=-1)
        live_g = jnp.ones((sub, t, k), bool)
    else:
        vg = valid.reshape(1, sub, t, k, _BOUND_G)
        o_lo = jnp.where(vg, og, big).min(axis=-1)
        o_hi = jnp.where(vg, og, -big).max(axis=-1)
        d_lo = jnp.where(vg, dg, big).min(axis=-1)
        d_hi = jnp.where(vg, dg, -big).max(axis=-1)
        live_g = vg[0].any(axis=-1)

    # Cone parameters per group.  Apex = origin-box center; the box
    # half-diagonal is a conservative bound on any origin's distance
    # from the apex and is folded into each sphere's radius.
    apex = 0.5 * (o_lo + o_hi)
    ext = o_hi - o_lo
    pad = 0.5 * jnp.sqrt(ext[0] ** 2 + ext[1] ** 2 + ext[2] ** 2)
    axis = d_lo + d_hi  # mean direction, unnormalized
    a_n = jnp.sqrt(axis[0] ** 2 + axis[1] ** 2 + axis[2] ** 2)
    axis = axis / jnp.maximum(a_n, 1e-9)
    cosang = sum(dg[i] * axis[i][..., None] for i in range(3))
    if vg is not None:
        cosang = jnp.where(vg[0], cosang, 1.0)
    cos_t = jnp.clip(cosang.min(axis=-1), -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))

    def flat(x):
        return x.reshape(-1)  # (NG,) with NG = sub*t*k

    ngl = (sub * t * k,)
    n2_lo = jnp.zeros(ngl + (s,), dtype)
    s_lo = jnp.zeros(ngl + (s,), dtype)
    s_hi = jnp.zeros(ngl + (s,), dtype)
    vdotu = jnp.zeros(ngl + (s,), dtype)
    d2 = jnp.zeros(ngl + (s,), dtype)
    for i in range(3):
        oc_l = flat(o_lo[i])[:, None] - center[None, :, i]
        oc_h = flat(o_hi[i])[:, None] - center[None, :, i]
        straddle = (oc_l <= 0) & (oc_h >= 0)
        n2_lo += jnp.where(straddle, 0.0, jnp.minimum(oc_l**2, oc_h**2))
        plo, phi = _interval_prod(
            flat(d_lo[i])[:, None], flat(d_hi[i])[:, None], oc_l, oc_h
        )
        s_lo += plo
        s_hi += phi
        v_i = center[None, :, i] - flat(apex[i])[:, None]
        vdotu += v_i * flat(axis[i])[:, None]
        d2 += v_i * v_i
    r2 = (radius**2)[None, :]
    rt2 = ((radius + t_margin) ** 2)[None, :] if t_margin else r2
    box = n2_lo - jnp.maximum(s_lo**2, s_hi**2) <= r2
    if not both_nappes:
        box = box & ((s_lo < 0) | (n2_lo <= rt2))

    dist = jnp.sqrt(d2)
    rr = radius[None, :] + flat(pad)[:, None]
    sfr = jnp.minimum(rr / jnp.maximum(dist, 1e-9), 1.0)
    cos_phi = jnp.sqrt(jnp.maximum(1.0 - sfr * sfr, 0.0))
    ct = flat(cos_t)[:, None]
    st = flat(sin_t)[:, None]
    # beta <= theta + phi, via cos(beta) >= cos(theta + phi); only valid
    # while theta + phi <= pi — the wrap case (theta > pi - phi, i.e.
    # cos_t < -cos_phi) must pass unconditionally.  The dist clause widens
    # by t_margin in smooth mode (backward-nappe roots down to -t_margin:
    # the cone only bounds the FORWARD nappe — see interval_hit_mask).
    cone = (
        (vdotu >= jnp.maximum(dist, 1e-9) * (ct * cos_phi - st * sfr - 1e-6))
        | (dist <= rr + t_margin)
        | (ct < -cos_phi)
    )
    if both_nappes:
        # Mirrored nappe: the LINE family's backward half is the same cone
        # around -axis, so the sphere also qualifies when angle(v, -axis)
        # <= theta + phi — cos of which is -vdotu / dist.  Required for
        # exactness of the smooth nearest argmax-disc fallback (see
        # interval_hit_mask's both_nappes note).
        cone = cone | (
            -vdotu >= jnp.maximum(dist, 1e-9) * (ct * cos_phi - st * sfr - 1e-6)
        )
    if _DBG_FORCE.get("box"):
        box = jnp.ones_like(box)
    if _DBG_FORCE.get("cone"):
        cone = jnp.ones_like(cone)
    mask_g = box & cone & flat(live_g)[:, None]

    if light is not None:
        # Shadow rays all aim at ONE point, so their LINES pass (within
        # NUDGE — the glue normalizes L - p but shoots from p_n) through
        # the light: the whole group's line family is a DOUBLE cone with
        # apex at the light, axis toward the origin box, and half-angle
        # the box's angular radius seen from the light.  A point apex
        # has no direction-spread pad at all, which is what makes this
        # test tight where the box/mean-direction cone is hopeless
        # (measured: shadow lists were 2-5x looser than nearest lists —
        # benchmarks /tmp probes, docs/PERF.md).  The mirrored nappe is
        # REQUIRED: the reference's shadow t is unbounded, so occluders
        # beyond the light still block (shader.py:114-128 quirk).
        lg_v = tuple(flat(apex[i]) - light[i] for i in range(3))  # (NG,)
        lg_d = jnp.sqrt(lg_v[0] ** 2 + lg_v[1] ** 2 + lg_v[2] ** 2)
        lg_inv = 1.0 / jnp.maximum(lg_d, 1e-9)
        # group angular radius from the light: box half-diagonal + NUDGE
        # (line-through-light exactness slack), as sin
        sg_sin = jnp.minimum((flat(pad) + NUDGE) * lg_inv, 1.0)
        sg_cos = jnp.sqrt(jnp.maximum(1.0 - sg_sin * sg_sin, 0.0))
        ls_dot = jnp.zeros(ngl + (s,), dtype)
        ls_d2 = jnp.zeros(ngl + (s,), dtype)
        for i in range(3):
            v_i = center[None, :, i] - light[i]
            ls_dot += v_i * (lg_v[i] * lg_inv)[:, None]
            ls_d2 += v_i * v_i
        ls_d = jnp.sqrt(ls_d2)
        # r + NUDGE: translating the actual ray line (through p_n) onto
        # the exact line through (p, light) shifts it by |p_n - p| =
        # NUDGE, which must inflate the sphere on the other side too.
        r_sl = radius[None, :] + NUDGE
        ss_sin = jnp.minimum(r_sl / jnp.maximum(ls_d, 1e-9), 1.0)
        ss_cos = jnp.sqrt(jnp.maximum(1.0 - ss_sin * ss_sin, 0.0))
        rhs = sg_cos[:, None] * ss_cos - sg_sin[:, None] * ss_sin - 1e-6
        lcone = (jnp.abs(ls_dot) >= jnp.maximum(ls_d, 1e-9) * rhs) | (ls_d <= r_sl)
        mask_g = mask_g & lcone

    # OR group masks into tile masks: group index order is (sub, t, k).
    return mask_g.reshape(sub, t, k, s).any(axis=(0, 2))


def candidate_lists(
    o3: jax.Array,  # (3, 8, M) ray origins
    d3: jax.Array,  # (3, 8, M) unit directions
    center: jax.Array,  # (S_cheap, 3) cheap-tier spheres
    radius: jax.Array,  # (S_cheap,)
    b_cols: int,
    valid: jax.Array | None = None,  # (8, M) lanes included in the bounds
    light: jax.Array | None = None,  # (3,) — set for SHADOW lists only
    t_margin: float = 0.0,  # smooth-mode sol margin (see interval_hit_mask)
    both_nappes: bool = False,  # smooth NEAREST lists (see interval_hit_mask)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-tile capped candidate ids + loop counts.

    Returns ``(cand, cnt_cand, cnt_full)``: ``cand`` is (T, MAX_CAND)
    int32, ascending sphere index (garbage past the count); per tile the
    kernels loop ``cnt_cand`` candidates OR ``cnt_full`` full-table
    spheres (exactly one of the two is nonzero — overflowing tiles sweep
    everything, preserving conservativeness).
    """
    s_cheap = center.shape[0]
    if b_cols % _BOUND_G == 0:
        mask = _group_cull_mask(o3, d3, center, radius, b_cols, valid, light,
                                t_margin, both_nappes)
    else:
        o_lo, o_hi = _tile_bounds(o3, b_cols, valid)
        d_lo, d_hi = _tile_bounds(d3, b_cols, valid)
        mask = interval_hit_mask(o_lo, o_hi, d_lo, d_hi, center, radius,
                                 t_margin, both_nappes)
    # Stable sort on (not mask): candidates first, each group ascending by
    # sphere index — the sequential min keeps lowest-index tie semantics.
    order = jnp.argsort(jnp.where(mask, 0, 1), axis=1, stable=True).astype(jnp.int32)
    w = min(s_cheap, MAX_CAND)
    cand = order[:, :w]
    if w < MAX_CAND:
        cand = jnp.concatenate(
            [cand, jnp.zeros((cand.shape[0], MAX_CAND - w), jnp.int32)], axis=1
        )
    counts = mask.sum(axis=1).astype(jnp.int32)
    overflow = counts > MAX_CAND
    # (1, T) rows: SMEM pads every ROW to 512 bytes, so a (T, 1) column
    # would cost T x 512 B (measured 1 MB at config-4 scale — SMEM OOM).
    cnt_cand = jnp.where(overflow, 0, counts)[None, :]
    cnt_full = jnp.where(overflow, s_cheap, 0)[None, :]
    return cand, cnt_cand, cnt_full


def _geom_scalars(geom_ref, k):
    # Tables are TRANSPOSED for SMEM ((4, S) / (C, S)): SMEM pads every
    # ROW to 512 bytes, so (S, 4) would cost S x 512 B (measured SMEM OOM
    # at 1024 spheres); 4 rows of S scalars cost ~4 KB.
    return geom_ref[0, k], geom_ref[1, k], geom_ref[2, k], geom_ref[3, k]


def _sphere_sol_fast(o, d, cx, cy, cz, r):
    """Cheap naive-root hit distance — for sweep SELECTION only.

    Un-doubled ``b = d.(o-c)``, roots ``-b -/+ sqrt(b^2 - c2)``: ~24
    vector ops and no divide, vs ~38 + a divide for the reference-exact
    q-form ``_sphere_t`` (the sweeps dominate the config-4 frame, so per
    -candidate ops are the budget — docs/PERF.md).  The naive small root
    cancels catastrophically at grazing incidence, so the NEAREST kernel
    recomputes the carried winner's t with the exact form once per tile;
    only the argmin decision between near-tied spheres can differ, which
    the tolerance-based parity tests admit.

    Returns ``(sol, valid)``.  A negative discriminant makes ``sqrt``
    NaN, every NaN comparison is false, and ``valid`` inherits that — no
    clamping selects needed.
    """
    ocx = o[0] - cx
    ocy = o[1] - cy
    ocz = o[2] - cz
    b = d[0] * ocx + d[1] * ocy + d[2] * ocz
    c2 = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    sq = jnp.sqrt(b * b - c2)
    t0 = -b - sq
    sol = jnp.where(t0 > 0, t0, sq - b)
    return sol, sol > 0


# ---------------------------------------------------------------------------
# Kernel A: culled nearest-hit.
# ---------------------------------------------------------------------------


def _near_kernel_culled(
    o_ref, d_ref, cand_ref, cntc_ref, cntf_ref, geom_ref, t_out, idx_out, p_out, n_out,
    *, faraway: float, s_cheap: int, s_total: int,
):
    dtype = o_ref.dtype
    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    shape = o[0].shape
    far = jnp.asarray(faraway, dtype)
    i = pl.program_id(0)

    # The winner's GEOMETRY is carried through the loop as four extra
    # vector selects per candidate: an XLA-side `take(geom, idx)` costs
    # 12-17 ms/bounce at 2M rays (elementwise minor-axis gather — device
    # trace in docs/PERF.md), vs ~15% more select work in a sweep that is
    # already compute-bound.  Misses keep sphere 0's geometry (the old
    # `take` on idx==0 did the same); `hit` masks them downstream.
    def select(take, t_k, sid, g, carry):
        tmin, imin, cw = carry
        return (
            jnp.where(take, t_k, tmin),
            jnp.where(take, sid, imin),
            tuple(jnp.where(take, g[c], cw[c]) for c in range(4)),
        )

    def cand_body(j, carry):
        # Candidate geometry via SMEM id-indirection: one SMEM id read +
        # four SMEM scalar reads (the full sweep's proven-fast pattern) —
        # no pre-gathered (T, MAX_CAND, 4) arrays in HBM at all.
        sid = cand_ref[0, 0, j]
        g = _geom_scalars(geom_ref, sid)
        sol, valid = _sphere_sol_fast(o, d, g[0], g[1], g[2], g[3])
        # strict <: lowest index wins (candidates ascend)
        return select(valid & (sol < carry[0]), sol, sid, g, carry)

    def full_body(k, carry):
        g = _geom_scalars(geom_ref, k)
        sol, valid = _sphere_sol_fast(o, d, g[0], g[1], g[2], g[3])
        return select(valid & (sol < carry[0]), sol, k, g, carry)

    g0 = _geom_scalars(geom_ref, 0)
    carry = (
        jnp.full(shape, far),
        jnp.zeros(shape, jnp.int32),
        tuple(jnp.full(shape, g0[c], dtype) for c in range(4)),
    )
    carry = _unrolled_loop(cntc_ref[0, i], cand_body, carry)
    carry = _unrolled_loop(cntf_ref[0, i], full_body, carry)
    for k in range(s_cheap, s_total):  # exact tier: always swept
        g = _geom_scalars(geom_ref, k)
        t_k = _sphere_t_exact(o, d, g[0], g[1], g[2], g[3], faraway, dtype)
        carry = select(t_k < carry[0], t_k, k, g, carry)
    t_sel, imin, cw = carry
    # The sweep selected the winner on cheap naive roots; its t is now
    # recomputed ONCE with the exact forms (q-form / compensated) on the
    # carried geometry — grazing-incidence cancellation never reaches the
    # hit point, shadow origin, or reported distance.  ~80 extra vector
    # ops per TILE vs ~14 saved per CANDIDATE (hundreds at config 4).
    t_q = _sphere_t(o, d, cw[0], cw[1], cw[2], cw[3], faraway, dtype)
    if s_cheap < s_total:
        t_ex = _sphere_t_exact(o, d, cw[0], cw[1], cw[2], cw[3], faraway, dtype)
        t_win = jnp.where(imin >= s_cheap, t_ex, t_q)
    else:
        t_win = t_q
    tmin = jnp.where(t_sel != far, t_win, far)
    hit = tmin != far
    t_safe = jnp.where(hit, tmin, jnp.ones_like(tmin))
    t_out[:, :] = tmin
    idx_out[:, :] = jnp.where(hit, imin, 0)
    for c in range(3):
        p_c = o[c] + d[c] * t_safe
        p_out[c] = p_c
        # divide (not reciprocal-multiply): bit-identical to the XLA
        # glue this replaces, which the parity tests pin.
        n_out[c] = (p_c - cw[c]) / cw[3]


# ---------------------------------------------------------------------------
# Kernel B: culled shadow + shading + mirror continuation.
# ---------------------------------------------------------------------------


def _shade_kernel_culled(
    o_ref, d_ref, thr_ref, alive_ref, acc_ref, t_ref, idx_ref, pn_ref, n_ref, tl_ref,
    matv_ref, candb_ref, cntb_ref, cntbf_ref, geom_ref, const_ref,
    *outs,
    faraway: float, s_cheap: int, s_total: int, mat_mode: str = "xla",
    tex_hw: tuple | None = None,
):
    mcols = _MCOLS_TEX if tex_hw is not None else _MCOLS
    if tex_hw is not None:
        o_out, d_out, thr_out, alive_out, acc_out, flat_out, dww_out = outs
    else:
        o_out, d_out, thr_out, alive_out, acc_out = outs
    dtype = o_ref.dtype
    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    thr = thr_ref[:, :]
    alive = alive_ref[:, :]
    tmin = t_ref[:, :]
    idx = idx_ref[:, :]
    p_n = (pn_ref[0], pn_ref[1], pn_ref[2])
    normal = (n_ref[0], n_ref[1], n_ref[2])  # from the nearest kernel
    to_light = (tl_ref[0], tl_ref[1], tl_ref[2])
    shape = tmin.shape
    far = jnp.asarray(faraway, dtype)
    i = pl.program_id(0)

    hit = (tmin != far).astype(dtype)
    coverage = hit * alive
    t_safe = jnp.where(hit > 0, tmin, jnp.ones_like(tmin))

    # Winner material: either PRE-GATHERED by the XLA glue (a per-lane
    # take on the winner index — forward-only, so no scatter-add adjoint
    # risk) or gathered here from the (12, S_pad) VMEM table with Mosaic
    # lane gathers (MAT_GATHER_MODE).  The in-kernel SELECT loop (16
    # vector selects per candidate) was priced out — it cost more VPU
    # work than the nearest sweep itself; a dynamic gather is O(S/128)
    # per channel instead of O(candidates).
    if mat_mode == "xla":
        def m(col):
            return matv_ref[mcols.index(col)]
    else:
        s_pad = matv_ref.shape[1]
        b = idx.shape[1]
        gathered = []
        for c in range(len(mcols)):
            row = matv_ref[c, :]  # (s_pad,)
            if mat_mode == "direct":
                rb = jax.lax.broadcast_in_dim(row, (idx.shape[0], s_pad), (1,))
                gathered.append(jnp.take_along_axis(rb, idx, axis=1))
            else:  # piecewise: per-vreg gathers + hi-bit selects
                hi_i, lo_i = idx // 128, idx % 128
                acc_g = jnp.zeros(idx.shape, dtype)
                for kk in range(s_pad // 128):
                    piece = jax.lax.broadcast_in_dim(
                        row[kk * 128 : (kk + 1) * 128], (idx.shape[0], 128), (1,)
                    )
                    cols = [
                        jnp.take_along_axis(piece, lo_i[:, c0 : c0 + 128], axis=1)
                        for c0 in range(0, b, 128)
                    ]
                    g_full = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)
                    acc_g = jnp.where(hi_i == kk, g_full, acc_g)
                gathered.append(acc_g)

        def m(col):
            return gathered[mcols.index(col)]

    p = tuple(o[i_] + d[i_] * t_safe for i_ in range(3))  # shader.py:73

    def const(c):
        return const_ref[0, c]

    cam = (const(0), const(1), const(2))

    def norm3(v):
        mag = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
        inv = 1.0 / jnp.where(mag == 0, jnp.ones_like(mag), mag)
        return tuple(c * inv for c in v)

    to_cam = norm3(tuple(cam[i_] - p[i_] for i_ in range(3)))  # shader.py:76

    # Culled hard shadow (shader.py:114-128 semantics).
    big = jnp.asarray(3.0e38, dtype)

    # Shadow sweeps use the cheap naive roots directly (no winner
    # recompute): ``in_light`` only compares the SELF distance against
    # other spheres', generically well-separated quantities.  The one
    # cancellation-sensitive value — the self sphere's t ~ NUDGE-sized
    # tiny root — keeps ~1e-4 relative accuracy in f32, far from
    # flipping the comparison (analysis in docs/PERF.md).
    def shadow_cand_body(j, carry):
        t_others, t_self = carry
        sid = candb_ref[0, 0, j]
        cx, cy, cz, r = _geom_scalars(geom_ref, sid)
        sol, valid = _sphere_sol_fast(p_n, to_light, cx, cy, cz, r)
        # miss sentinel MUST be faraway (not ``big``): the exact tier
        # below returns faraway on miss, and ``in_light = t_self <=
        # t_others`` relies on all-miss lanes TYING at one sentinel
        # (the reference's faraway==faraway quirk, shader.py:114-128).
        t_k = jnp.where(valid, sol, far)
        is_self = idx == sid
        return (
            jnp.minimum(t_others, jnp.where(is_self, big, t_k)),
            jnp.where(is_self, jnp.minimum(t_self, t_k), t_self),
        )

    def shadow_full_body(k, carry):
        t_others, t_self = carry
        cx, cy, cz, r = _geom_scalars(geom_ref, k)
        sol, valid = _sphere_sol_fast(p_n, to_light, cx, cy, cz, r)
        t_k = jnp.where(valid, sol, far)
        is_self = idx == k
        return (
            jnp.minimum(t_others, jnp.where(is_self, big, t_k)),
            jnp.where(is_self, jnp.minimum(t_self, t_k), t_self),
        )

    carry = (jnp.full(shape, big), jnp.full(shape, big))
    carry = _unrolled_loop(cntb_ref[0, i], shadow_cand_body, carry)
    t_others, t_self = _unrolled_loop(cntbf_ref[0, i], shadow_full_body, carry)
    for k in range(s_cheap, s_total):
        cx, cy, cz, r = _geom_scalars(geom_ref, k)
        t_k = _sphere_t_exact(p_n, to_light, cx, cy, cz, r, faraway, dtype)
        is_self = idx == k
        t_others = jnp.minimum(t_others, jnp.where(is_self, big, t_k))
        t_self = jnp.where(is_self, jnp.minimum(t_self, t_k), t_self)
    in_light = (t_self <= t_others).astype(dtype)

    # --- shading (ops/shading.py term-for-term; provenance there) -------
    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    n_dot_l = jnp.maximum(dot3(normal, to_light), 0.0)

    cx_i = jnp.trunc(p[0] * 2.0).astype(jnp.int32) % 2
    cz_i = jnp.trunc(p[2] * 2.0).astype(jnp.int32) % 2
    checker = (cx_i == cz_i).astype(dtype)
    is_checker = m(_KIND) == 1.0
    tex = tuple(jnp.where(is_checker, checker, m(c)) for c in (_DCR, _DCG, _DCB))
    if tex_hw is not None:
        # Equirectangular image texture (ref shape.py:68-81): the kernel
        # computes ONLY the flat texel index (polynomial atan2/asin over
        # the winner's native extents); the texel color is gathered
        # OUTSIDE by XLA and composed with the exported dww weight — the
        # sublane kernels' scheme, so any atlas size fits.
        th_pad, tw_pad = tex_hw
        is_image = m(_KIND) == 2.0
        u = 0.5 + _atan2_poly(normal[2], normal[0]) / (2.0 * jnp.pi)
        v = 0.5 - _asin_poly(normal[1]) / jnp.pi
        u = u - jnp.floor(u)
        v = v - jnp.floor(v)
        th_l = m(_TEXH)
        tw_l = m(_TEXW)
        ti = jnp.clip((u * (tw_l - 1.0)).astype(jnp.int32), 0, (tw_l - 1.0).astype(jnp.int32))
        tj = jnp.clip((v * (th_l - 1.0)).astype(jnp.int32), 0, (th_l - 1.0).astype(jnp.int32))
        flat = m(_TID).astype(jnp.int32) * (th_pad * tw_pad) + tj * tw_pad + ti
        flat_out[:, :] = jnp.where(is_image, flat, 0)
        tex = tuple(jnp.where(is_image, jnp.zeros_like(t), t) for t in tex)

    diffuse_w = n_dot_l * in_light * m(_DG)
    if tex_hw is not None:
        dww_out[:, :] = jnp.where(is_image, diffuse_w * thr * coverage, jnp.zeros(shape, dtype))

    dome_up = jnp.maximum(normal[1], 0.0) * const(9)
    dome = (const(6) * dome_up, const(7) * dome_up, const(8) * dome_up)

    L = to_light
    V = to_cam
    H = norm3(tuple(L[i_] + V[i_] for i_ in range(3)))
    n_dot_v = jnp.clip(dot3(normal, V), 0.0, 1.0)
    n_dot_h = jnp.clip(dot3(normal, H), 0.0, 1.0)
    v_dot_h = jnp.clip(dot3(V, H), 0.0, 1.0)
    n_dot_l_c = jnp.clip(dot3(normal, L), 0.0, 1.0)
    ior = m(_IOR)
    f0 = ((ior - 1.0) / (ior + 1.0)) ** 2
    fresnel = f0 + (1.0 - f0) * (1.0 - v_dot_h) ** 5
    alpha = m(_ROUGH) ** 2
    denom = n_dot_h**2 * (alpha**2 - 1.0) + 1.0
    dist = (alpha**2) / (jnp.pi * (denom**2 + SHADING_EPS))

    def g1(x):
        return 2.0 * x / (x + jnp.sqrt(alpha**2 + (1.0 - alpha**2) * (x**2)) + SHADING_EPS)

    geom = g1(n_dot_l_c) * g1(n_dot_v)
    spec_base = (fresnel * dist * geom) / (4.0 * n_dot_v + SHADING_EPS)
    glint = (1.0 - n_dot_v) ** GLINT_EXPONENT * n_dot_l_c
    spec = jnp.where(n_dot_v <= 0, 0.0, spec_base + m(_SG) * glint)
    spec_term = spec * m(_SG) * in_light

    view_angle = jnp.clip(dot3(normal, to_cam), 0.0, 1.0)
    angle_factor = jnp.abs(view_angle - 0.5) * 2.0
    phase = angle_factor * jnp.pi * m(_TFT) * 10.0
    ip = jnp.sin(phase)
    hue = (m(_TFI) - 1.0) / 2.0
    irid_w = m(_TFW) * m(_IG)
    irid = (
        (ip * hue + (1.0 - hue) * (1.0 - ip)) * irid_w,
        (ip * (1.0 - hue) + hue * (1.0 - ip)) * irid_w,
        (0.5 + 0.5 * ip) * irid_w,
    )

    amb = jnp.asarray(AMBIENT, dtype)
    color = tuple(amb + tex[i_] * diffuse_w + dome[i_] + spec_term + irid[i_] for i_ in range(3))

    w = thr * coverage
    refl_coeff = 0.5 * m(_SG) * in_light  # shader.py:106 split
    thr_next = w * refl_coeff
    alive_next = alive * hit

    ddn = 2.0 * dot3(d, normal)
    refl = norm3(tuple(d[i_] - normal[i_] * ddn for i_ in range(3)))

    for i_ in range(3):
        acc_out[i_] = acc_ref[i_] + color[i_] * w
        o_out[i_] = p_n[i_]
        d_out[i_] = refl[i_]
    thr_out[:, :] = thr_next
    alive_out[:, :] = alive_next


def trace_fused_culled(
    origin: jax.Array,
    direction: jax.Array,  # (N, 3) unit — or (3, N) with transposed=True
    scene: Scene,
    cfg,  # RenderConfig
    transposed: bool = False,
    vma: frozenset | None = None,  # varying mesh axes when inside shard_map
) -> jax.Array:
    """Hard-visibility trace with per-tile candidate-list culling.

    Works inside ``shard_map`` over the ray axis: every per-bounce step
    (candidate masks, group sort, kernels) is shard-local.  ``vma`` (or
    the varying set read off ``direction``'s type) annotates the kernel
    outputs; replicated tables are pcast to varying so every pallas
    operand agrees (the same contract as trace_fused_smooth_sub).
    """
    from .pallas_bounce import _ray_state_t

    dtype = cfg.dtype
    if vma is None:
        vma = frozenset(getattr(jax.typeof(direction), "vma", frozenset())) or None
    # Default 4096-ray tiles: per-candidate vector work spans 4 vregs per
    # op, so the serial scalar candidate reads hide behind it; smaller
    # requested blocks round up (more padding, same semantics).
    block = max(cfg.block_rays, CULL_BLOCK_RAYS)
    if block % _SUBLANES:
        raise ValueError(f"block_rays must be a multiple of {_SUBLANES}")
    o_t, d_t, n = _ray_state_t(origin, direction, cfg, transposed)
    n_pad = _round_up(d_t.shape[1], block)
    if n_pad != d_t.shape[1]:
        extra = n_pad - d_t.shape[1]
        o_t = jnp.concatenate([o_t, jnp.broadcast_to(o_t[:, :1], (3, extra))], axis=1)
        d_t = jnp.concatenate([d_t, jnp.broadcast_to(d_t[:, :1], (3, extra))], axis=1)
    m_cols = n_pad // _SUBLANES
    b_cols = block // _SUBLANES
    n_tiles = m_cols // b_cols

    o3 = pack_tiles(o_t, b_cols)
    d3 = pack_tiles(d_t, b_cols)

    atlas = scene.texture_atlas
    textured = atlas.shape[1] > 1 or atlas.shape[2] > 1
    tex_hw = (int(atlas.shape[1]), int(atlas.shape[2])) if textured else None
    texels = jnp.asarray(atlas, dtype).reshape(-1, 3) if textured else None
    mcols = _MCOLS_TEX if textured else _MCOLS

    geom = _geometry_table(scene, dtype)
    geom_t = geom.T  # (4, S) — SMEM-friendly (rows pad to 512 B each)
    mat = _material_table(scene, dtype)[: scene.spheres.count]
    mat16 = jnp.stack([mat[:, c] for c in mcols], axis=1)  # (S, C) kernel order
    if MAT_GATHER_MODE != "xla":
        # in-kernel gather reads a (C, S_pad) table (lane-padded to the
        # vreg width; winner idx < S so the pad is never addressed)
        s_pad128 = _round_up(scene.spheres.count, 128)
        mat16 = jnp.zeros((len(mcols), s_pad128), dtype).at[:, : scene.spheres.count].set(mat16.T)
    consts = _consts_row(scene, dtype)
    light = jnp.asarray(scene.lights.point_position, dtype)
    s_total = scene.spheres.count
    s_cheap = s_total - scene.spheres.n_exact
    center_cheap = jnp.asarray(scene.spheres.center[:s_cheap], dtype)
    radius_cheap = jnp.asarray(scene.spheres.radius[:s_cheap], dtype)

    vec = pl.BlockSpec((3, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    if MAT_GATHER_MODE == "xla":
        vec16 = pl.BlockSpec(
            (len(mcols), _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
    else:
        vec16 = pl.BlockSpec(mat16.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((_SUBLANES, b_cols), lambda i: (0, i), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # Per-tile candidate-id row in SMEM ((T, 1, MAX_CAND) so the block's
    # trailing dims equal the array's — the Mosaic block-shape rule).
    cand_spec = pl.BlockSpec((1, 1, MAX_CAND), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)

    def _sds(shape, dt):
        if vma is None:
            return jax.ShapeDtypeStruct(shape, dt)
        return jax.ShapeDtypeStruct(shape, dt, vma=vma)

    near_call = pl.pallas_call(
        functools.partial(_near_kernel_culled, faraway=cfg.faraway, s_cheap=s_cheap, s_total=s_total),
        grid=(n_tiles,),
        in_specs=[vec, vec, cand_spec, smem, smem, smem],
        out_specs=(lane, lane, vec, vec),
        out_shape=(
            _sds((_SUBLANES, m_cols), dtype),
            _sds((_SUBLANES, m_cols), jnp.int32),
            _sds((3, _SUBLANES, m_cols), dtype),
            _sds((3, _SUBLANES, m_cols), dtype),
        ),
        interpret=cfg.pallas_interpret,
    )
    tex_specs = (lane, lane) if textured else ()
    tex_shapes = (
        (_sds((_SUBLANES, m_cols), jnp.int32), _sds((_SUBLANES, m_cols), dtype))
        if textured
        else ()
    )
    shade_call = pl.pallas_call(
        functools.partial(
            _shade_kernel_culled, faraway=cfg.faraway, s_cheap=s_cheap,
            s_total=s_total, mat_mode=MAT_GATHER_MODE, tex_hw=tex_hw,
        ),
        grid=(n_tiles,),
        in_specs=[
            vec, vec, lane, lane, vec, lane, lane, vec, vec, vec,
            vec16, cand_spec, smem, smem, smem, smem,
        ],
        out_specs=(vec, vec, lane, lane, vec) + tex_specs,
        out_shape=(
            _sds((3, _SUBLANES, m_cols), dtype),
            _sds((3, _SUBLANES, m_cols), dtype),
            _sds((_SUBLANES, m_cols), dtype),
            _sds((_SUBLANES, m_cols), dtype),
            _sds((3, _SUBLANES, m_cols), dtype),
        )
        + tex_shapes,
        interpret=cfg.pallas_interpret,
    )

    if vma:
        def _to_varying(x):
            missing = tuple(a for a in vma if a not in getattr(jax.typeof(x), "vma", frozenset()))
            return jax.lax.pcast(x, missing, to="varying") if missing else x

        # Every pallas operand must agree on the varying set: the ray
        # state is varying already; the replicated tables get pcast.
        o3, d3, geom_t, mat16, consts = (
            _to_varying(x) for x in (o3, d3, geom_t, mat16, consts)
        )

    # Below this throughput a bounce cannot move the uint8 image (half a
    # quantum is ~2e-3; color magnitudes are ~O(1)); tiles whose every
    # lane is under it skip BOTH sweeps (their loop counts zero out).
    # (3e-4 was also safe by the remaining-energy bound but measured
    # zero speedup, so the 10x-margin cut stays.)
    dead_thr = 2e-4

    def tile_live(thr):
        t = thr.reshape(_SUBLANES, m_cols // b_cols, b_cols)
        return (jnp.max(t, axis=(0, 2)) > dead_thr)[None, :]  # (1, T)

    # Cheap-tier scene bbox for the reflected-ray sort keys (exact-tier
    # spheres like the ground plane are enormous and would flatten the
    # origin grid to one cell).
    bb_lo = jnp.min(center_cheap - radius_cheap[:, None], axis=0)
    bb_hi = jnp.max(center_cheap + radius_cheap[:, None], axis=0)

    def full_sweep_lists(live):
        """FULL_SWEEP_FROM_BOUNCE candidate lists: zero cand array / zero
        cnt with cnt_full = s_cheap for live tiles — the kernels' proven
        overflow (cnt_full) route, no interval tests, no argsort."""
        cand = jnp.zeros((n_tiles, MAX_CAND), jnp.int32)
        cnt = jnp.zeros((1, n_tiles), jnp.int32)
        cnt_full = jnp.where(live, center_cheap.shape[0], 0)
        if vma:
            cand, cnt, cnt_full = (_to_varying(x) for x in (cand, cnt, cnt_full))
        return cand, cnt, cnt_full

    def bounce(carry, _, primary: bool, full_sweep: bool = False):
        o3, d3, thr, alive, acc, pix = carry
        if primary:
            lane_valid = None
        else:
            # Re-sort the ray state so tiles become coherent again: dead
            # rays compact into tail tiles (skipped by the energy cut),
            # live rays group by (origin cell, direction bin) so both the
            # nearest AND shadow candidate lists cull at depth.  Per-ray
            # results are grouping-independent (candidate lists are
            # conservative), so only the tile energy cut — already
            # sub-quantum — sees the permutation.
            #
            # The permutation moves contiguous _SORT_G-ray GROUPS keyed
            # by their live-weighted centroid, not individual rays.  A
            # true per-ray sort WAS tried (it halves the candidate sweep
            # work: 555k -> 218k nearest candidate-tiles on the CPU
            # probe) but moving the 12-channel state per ray costs
            # 15-75 ms/bounce however it is phrased — 1-D per-channel
            # takes, minor-axis takes, and 13-operand lax.sort all
            # bottom out at >=1.4 ms per 2M-element gather on v5e —
            # while the 64-ray block gather moves the same bytes in
            # ~4 ms total (row-count-bound, ~92 M rows/s).
            state = jnp.concatenate(
                [
                    unpack_tiles(o3, b_cols),
                    unpack_tiles(d3, b_cols),
                    unpack_tiles(jnp.stack([thr, alive]), b_cols),
                    unpack_tiles(acc, b_cols),
                ],
                axis=0,
            )  # (11, N_pad) flat ray order
            ng = n_pad // _SORT_G
            live_f = ((state[6] * state[7]) > dead_thr).astype(dtype)
            lg = live_f.reshape(ng, _SORT_G)
            wsum = jnp.maximum(lg.sum(axis=1), 1.0)
            cg = state[:6].reshape(6, ng, _SORT_G)
            cent = (cg * lg).sum(axis=2) / wsum  # (6, ng) live-ray centroid
            keys = ray_sort_keys(
                cent[0:3], cent[3:6], lg.any(axis=1), bb_lo, bb_hi
            )
            perm = jnp.argsort(keys, stable=True)
            # Interleave channels per group before the gather: ONE take
            # of (ng, 11*_SORT_G) rows moves 11x fewer rows than 11
            # channel takes, and TPU gathers are row-count-bound
            # (~92 M rows/s); the two transposes are plain HBM copies.
            st = state.reshape(11, ng, _SORT_G).transpose(1, 0, 2)
            st = jnp.take(st.reshape(ng, 11 * _SORT_G), perm, axis=0)
            state = st.reshape(ng, 11, _SORT_G).transpose(1, 0, 2)
            pix = jnp.take(pix, perm)  # (ng,) group ids follow their rays
            s3 = pack_tiles(state.reshape(11, n_pad), b_cols)
            o3, d3 = s3[0:3], s3[3:6]
            thr, alive = s3[6], s3[7]
            acc = s3[8:11]
            lane_valid = (thr * alive) > dead_thr  # (8, M)
        live = tile_live(thr)
        if full_sweep:
            cand_a, cnt_a, cnt_af = full_sweep_lists(live)
        else:
            cand_a, cnt_a, cnt_af = candidate_lists(
                o3, d3, center_cheap, radius_cheap, b_cols, valid=lane_valid
            )
            cnt_a = jnp.where(live, cnt_a, 0)
            cnt_af = jnp.where(live, cnt_af, 0)
        tmin, idx, p, normal = near_call(o3, d3, cand_a[:, None, :], cnt_a, cnt_af, geom_t)

        # XLA glue: hit point + normal come OUT of the kernel (winner
        # geometry carried in-loop — an XLA `take(geom, idx)` costs
        # 12-17 ms/bounce here); the 12 material columns are either
        # gathered here as one wide per-lane take (forward-only, so the
        # gather has no scatter-add adjoint to fear) or in-kernel from
        # the whole table (MAT_GATHER_MODE).
        far = jnp.asarray(cfg.faraway, dtype)
        hit = tmin != far
        if MAT_GATHER_MODE == "xla":
            matv = jnp.moveaxis(jnp.take(mat16, idx, axis=0), -1, 0)  # (12, 8, M)
        else:
            matv = mat16  # (12, S_pad) table; the kernel gathers
        p_n = p + normal * NUDGE
        lv = light[:, None, None] - p
        to_light = lv / jnp.sqrt(jnp.sum(lv * lv, axis=0, keepdims=True))

        # Shadow bounds consider only lanes that HIT something AND carry
        # visible energy — miss/spent lanes' junk p_n would blow the box.
        shadow_valid = hit & (thr * alive > dead_thr)
        if full_sweep:
            cand_b, cnt_b, cnt_bf = full_sweep_lists(live)
        else:
            cand_b, cnt_b, cnt_bf = candidate_lists(
                p_n, to_light, center_cheap, radius_cheap, b_cols,
                valid=shadow_valid, light=light,
            )
            cnt_b = jnp.where(live, cnt_b, 0)
            cnt_bf = jnp.where(live, cnt_bf, 0)
        out = shade_call(
            o3, d3, thr, alive, acc, tmin, idx, p_n, normal, to_light,
            matv, cand_b[:, None, :], cnt_b, cnt_bf, geom_t, consts,
        )
        if textured:
            # Image-diffuse term composed OUTSIDE the kernel: nearest-texel
            # gather on the exported flat ids times the dww weight.
            *core, flat, dww = out
            tex_c = jnp.moveaxis(jnp.take(texels, flat, axis=0), -1, 0)  # (3, 8, M)
            out = tuple(core[:4]) + (core[4] + tex_c * dww[None],)
        return out + (pix,), None

    init = (
        o3,
        d3,
        jnp.ones((_SUBLANES, m_cols), dtype),
        jnp.ones((_SUBLANES, m_cols), dtype),
        jnp.zeros((3, _SUBLANES, m_cols), dtype),
        # Per-GROUP id: the sorts only ever permute whole _SORT_G-ray
        # groups, so the undo is a cheap block gather, not a 2M-element
        # per-ray gather (docs/PERF.md trace).
        jnp.arange(n_pad // _SORT_G, dtype=jnp.int32),
    )
    if vma:
        # scan carries must enter varying (the body outputs are varying)
        init = tuple(_to_varying(x) for x in init)
    carry, _ = bounce(init, None, primary=True)
    if cfg.max_depth > 1:
        fs = FULL_SWEEP_FROM_BOUNCE
        n_cull = cfg.max_depth - 1 if fs is None else max(0, min(fs, cfg.max_depth) - 1)
        n_full = cfg.max_depth - 1 - n_cull
        if n_cull:
            carry, _ = jax.lax.scan(
                functools.partial(bounce, primary=False), carry, None, length=n_cull
            )
        if n_full:
            carry, _ = jax.lax.scan(
                functools.partial(bounce, primary=False, full_sweep=True),
                carry, None, length=n_full,
            )
    acc_f = unpack_tiles(carry[4], b_cols)  # (3, N_pad), sorted ray order
    if cfg.max_depth > 1:  # undo the per-bounce sorts at group granularity
        acc_g = acc_f.reshape(3, n_pad // _SORT_G, _SORT_G)
        acc_f = jnp.take(acc_g, jnp.argsort(carry[5]), axis=1).reshape(3, n_pad)
    return acc_f.T[:n]

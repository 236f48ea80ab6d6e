"""Per-shard SMOOTH-visibility partial kernels (sphere-sharded training).

Under sphere sharding the smooth path previously fell back to the XLA
sweep, materializing per-bounce (N rays x S_local spheres) ``(t, sol,
disc)`` tables per shard (``render._sweep``) — O(N*S) HBM, which caps
frame x sphere scale.  These kernels make the same structural move
:mod:`.pallas_intersect` made for hard visibility (VERDICT r1 item 4):
reduce over the shard's spheres IN-KERNEL to O(N) per-ray quantities and
let collectives finish the reduction across the sphere mesh axis.

Semantics replicate the XLA smooth helpers exactly (same quadratic
forms, reference provenance ``shape.py:28-51`` via
:mod:`.pallas_bounce_smooth`):

* :func:`smooth_nearest_parts_pallas` — per ray, this shard's strict-hit
  winner ``(t, idx)`` plus its raw ``(sol, disc)`` (the coverage
  sigmoids' inputs, ``render._coverage_at``), and the max-discriminant
  fallback ``(dmax, fidx, sol_f)`` that attributes miss-lane coverage
  (``render._smooth_winner_idx``).  custom_vjp: implicit adjoints of the
  two SELECTED rows only — O(N) XLA + two segment-sum scatters, the
  :func:`.pallas_intersect._nearest_bwd` pattern extended with the
  as-computed ``(sol, disc)`` branch adjoint (``_sol_disc_adjoint``).
* :func:`smooth_clear_parts_pallas` — per ray, the product over this
  shard's spheres (excluding self) of ``1 - sigmoid occlusion``
  (``render._shadow_smooth``); the caller all-gather-products across the
  sphere axis.  custom_vjp: a BACKWARD kernel re-sweeps the shard per
  block and emits lane gradients plus per-block (center, radius)
  gradients — keeping the O(N*S) adjoint table out of HBM too.

Tier note (same as the hard kernels): the static global ``n_exact``
clamps to ``min(n_exact, s_local)`` per shard — upgrade-only
(accuracy-conservative; see ``render._sweep``'s exact_mask discussion —
smooth mode does no bitwise tie detection, so the rounding shift is
benign and within the sharded-equivalence test tolerances).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_bounce_smooth import (
    _compensated_b_cterm,
    _quad_sol_disc,
    _sig,
    _sol_disc_adjoint,
    _EPS_DEN,
)
from .pallas_intersect import (
    _out_struct,
    _pad_rays,
    _round_up,
    _split_tiers,
)
from .vecmath import dot


class SmoothParts(NamedTuple):
    """Per-shard reduced smooth-sweep quantities (LOCAL sphere indices)."""

    t: jax.Array  # (N,) winner hit distance; faraway when no strict hit
    idx: jax.Array  # (N,) int32 local winner index (0 when no hit)
    sol_w: jax.Array  # (N,) winner's raw root (== t on hit lanes)
    disc_w: jax.Array  # (N,) winner's raw discriminant
    dmax: jax.Array  # (N,) max discriminant over the shard (fallback)
    fidx: jax.Array  # (N,) int32 local argmax-disc index
    sol_f: jax.Array  # (N,) the argmax-disc row's raw root


def _block_sol_disc_fast(o, d, c, r, faraway):
    """(sol, disc, t) for a (K, B) block — plain tier, lane-ray layout."""
    dtype = r.dtype
    oc = tuple(o[i] - c[i] for i in range(3))
    b = 2.0 * (d[0] * oc[0] + d[1] * oc[1] + d[2] * oc[2])
    ct = oc[0] * oc[0] + oc[1] * oc[1] + oc[2] * oc[2] - r * r
    return _quad_sol_disc(b, ct, faraway, dtype)


def _block_sol_disc_comp(o, d, c, r, faraway):
    """(sol, disc, t) — compensated (exact) tier."""
    dtype = r.dtype
    b, ct = _compensated_b_cterm(o, d, c, r, dtype)
    return _quad_sol_disc(b, ct, faraway, dtype)


def _read_rays(o_ref, d_ref):
    o = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :])
    d = (d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])
    return o, d


def _sphere_block(c_ref, r_ref, k0, block):
    cb = c_ref[pl.ds(k0, block), :]
    return (cb[:, 0:1], cb[:, 1:2], cb[:, 2:3]), r_ref[pl.ds(k0, block), :]


# ---------------------------------------------------------------------------
# Kernel 1: smooth nearest + coverage-input partials.
# ---------------------------------------------------------------------------


def _smooth_nearest_kernel(
    o_ref, d_ref, cc_ref, rc_ref, ce_ref, re_ref,
    t_out, idx_out, solw_out, discw_out, dmax_out, fidx_out, solf_out,
    *, faraway: float, bs_cheap: int, bs_exact: int, exact_base: int,
):
    o, d = _read_rays(o_ref, d_ref)
    width = o[0].shape[1]
    dtype = rc_ref.dtype
    int_max = jnp.iinfo(jnp.int32).max

    def tier(c_ref, r_ref, bs, base, block_fn, carry):
        def body(k, carry):
            tmin, imin, solw, discw, dmax, fidx, solf = carry
            c, r = _sphere_block(c_ref, r_ref, k * bs, bs)
            sol, disc, t = block_fn(o, d, c, r, faraway)  # (K, B)
            sidx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + (k * bs + base)

            # Strict-hit winner within the block (lowest index on exact
            # ties — one-hot picked so the (sol, disc) extraction sums).
            tb = jnp.min(t, axis=0, keepdims=True)
            ib = jnp.min(jnp.where(t == tb, sidx, int_max), axis=0, keepdims=True)
            picked = sidx == ib  # exactly one row
            sol_b = jnp.sum(jnp.where(picked, sol, 0.0), axis=0, keepdims=True)
            disc_b = jnp.sum(jnp.where(picked, disc, 0.0), axis=0, keepdims=True)
            take = tb < tmin  # earlier block wins ties (lower index)
            tmin = jnp.where(take, tb, tmin)
            imin = jnp.where(take, ib, imin)
            solw = jnp.where(take, sol_b, solw)
            discw = jnp.where(take, disc_b, discw)

            # Max-discriminant fallback (FIRST max, like jnp.argmax).
            db = jnp.max(disc, axis=0, keepdims=True)
            fb = jnp.min(jnp.where(disc == db, sidx, int_max), axis=0, keepdims=True)
            picked_f = sidx == fb
            solf_b = jnp.sum(jnp.where(picked_f, sol, 0.0), axis=0, keepdims=True)
            taked = db > dmax  # strict: earlier block wins ties
            dmax = jnp.where(taked, db, dmax)
            fidx = jnp.where(taked, fb, fidx)
            solf = jnp.where(taked, solf_b, solf)
            return tmin, imin, solw, discw, dmax, fidx, solf

        return jax.lax.fori_loop(0, c_ref.shape[0] // bs, body, carry)

    carry = (
        jnp.full((1, width), jnp.asarray(faraway, dtype)),
        jnp.zeros((1, width), jnp.int32),
        jnp.zeros((1, width), dtype),
        jnp.zeros((1, width), dtype),
        jnp.full((1, width), -jnp.asarray(3.0e38, dtype)),
        jnp.zeros((1, width), jnp.int32),
        jnp.zeros((1, width), dtype),
    )
    carry = tier(cc_ref, rc_ref, bs_cheap, 0, _block_sol_disc_fast, carry)
    tmin, imin, solw, discw, dmax, fidx, solf = tier(
        ce_ref, re_ref, bs_exact, exact_base, _block_sol_disc_comp, carry
    )
    far = jnp.asarray(faraway, dtype)
    t_out[:, :] = tmin
    idx_out[:, :] = jnp.where(tmin == far, 0, imin)
    solw_out[:, :] = solw
    discw_out[:, :] = discw
    dmax_out[:, :] = dmax
    fidx_out[:, :] = fidx
    solf_out[:, :] = solf


def _smooth_nearest_call(
    origin, direction, center, radius, faraway,
    n_exact, block_rays, block_spheres, interpret, vma,
):
    o, d, n = _pad_rays(origin, direction, block_rays)
    cc, rc, ce, re, bs_cheap, bs_exact, s_cheap = _split_tiers(
        center, radius, n_exact, block_spheres
    )
    n_pad = d.shape[0]
    kernel = functools.partial(
        _smooth_nearest_kernel,
        faraway=faraway, bs_cheap=bs_cheap, bs_exact=bs_exact, exact_base=s_cheap,
    )
    lane = pl.BlockSpec((1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    dt = d.dtype
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // block_rays,),
        in_specs=[vec, vec, whole, whole, whole, whole],
        out_specs=(lane,) * 7,
        out_shape=(
            _out_struct((1, n_pad), dt, vma),
            _out_struct((1, n_pad), jnp.int32, vma),
            _out_struct((1, n_pad), dt, vma),
            _out_struct((1, n_pad), dt, vma),
            _out_struct((1, n_pad), dt, vma),
            _out_struct((1, n_pad), jnp.int32, vma),
            _out_struct((1, n_pad), dt, vma),
        ),
        interpret=interpret,
    )(o.T, d.T, cc, rc, ce, re)
    return tuple(x[0, :n] for x in outs)


def _row_quad(origin, direction, center, radius, idx):
    """(b, ct, oc) of the quadratic at sphere row ``idx`` per lane."""
    c_k = jnp.take(center, idx, axis=0)  # (N, 3)
    r_k = jnp.take(radius, idx, axis=0)  # (N,)
    oc = origin - c_k
    b = 2.0 * dot(direction, oc)
    ct = dot(oc, oc) - r_k * r_k
    return b, ct, oc, r_k


def _row_adjoint(origin, direction, center, radius, idx, g_sol, g_disc):
    """Push (g_sol, g_disc) at sphere row ``idx`` to (o, d, c_k, r_k) rows."""
    b, ct, oc, r_k = _row_quad(origin, direction, center, radius, idx)
    g_b, g_ct = _sol_disc_adjoint(b, ct, g_sol, g_disc)
    g_o = direction * (2.0 * g_b)[:, None] + oc * (2.0 * g_ct)[:, None]
    g_d = oc * (2.0 * g_b)[:, None]
    gc_rows = -g_o  # d(b,ct)/dc = -d(b,ct)/do
    gr_rows = -2.0 * r_k * g_ct
    return g_o, g_d, gc_rows, gr_rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _smooth_nearest_raw(
    origin, direction, center, radius, faraway, n_exact, block_rays, block_spheres, interpret, vma
):
    return _smooth_nearest_call(
        origin, direction, center, radius, faraway, n_exact, block_rays, block_spheres, interpret, vma
    )


def _smooth_nearest_fwd(origin, direction, center, radius, faraway, n_exact, block_rays, block_spheres, interpret, vma):
    outs = _smooth_nearest_call(
        origin, direction, center, radius, faraway, n_exact, block_rays, block_spheres, interpret, vma
    )
    t, idx, _solw, _discw, _dmax, fidx, _solf = outs
    return outs, (origin, direction, center, radius, t, idx, fidx)


def _smooth_nearest_bwd(faraway, n_exact, block_rays, block_spheres, interpret, vma, residuals, cots):
    """Adjoints at the two SELECTED rows (winner + disc-fallback) only.

    The winner's raw root doubles as its hit distance, so ``g_t`` (hit
    lanes only — misses emit the faraway constant) folds into ``g_sol_w``;
    ``g_dmax`` is the fallback row's disc cotangent.  Branch decisions are
    recomputed from the plain-tier (b, ct) per row — the same
    approximation :func:`.pallas_intersect._nearest_bwd` makes for the
    compensated tier (gradients of the error terms are negligible).
    """
    origin, direction, center, radius, t, idx, fidx = residuals
    (g_t, _g_idx, g_solw, g_discw, g_dmax, _g_fidx, g_solf) = cots

    hit = t != jnp.asarray(faraway, t.dtype)
    hitf = hit.astype(t.dtype)
    g_sol_w = g_solw + jnp.where(hit, g_t, 0.0)
    # Zero the winner-row adjoint entirely on miss lanes: their (sol_w,
    # disc_w) outputs came from idx 0's faraway-masked carry init path.
    g_sol_w = g_sol_w * hitf
    g_disc_w = g_discw * hitf

    g_o1, g_d1, gc1, gr1 = _row_adjoint(origin, direction, center, radius, idx, g_sol_w, g_disc_w)
    g_o2, g_d2, gc2, gr2 = _row_adjoint(origin, direction, center, radius, fidx, g_solf, g_dmax)

    s = center.shape[0]
    d_center = jax.ops.segment_sum(
        jnp.concatenate([gc1, gc2], axis=0), jnp.concatenate([idx, fidx]), num_segments=s
    )
    d_radius = jax.ops.segment_sum(
        jnp.concatenate([gr1, gr2], axis=0), jnp.concatenate([idx, fidx]), num_segments=s
    )
    return g_o1 + g_o2, g_d1 + g_d2, d_center, d_radius


_smooth_nearest_raw.defvjp(_smooth_nearest_fwd, _smooth_nearest_bwd)


def smooth_nearest_parts_pallas(
    origin: jax.Array,
    direction: jax.Array,
    center: jax.Array,  # (S_local, 3) — a sphere SHARD
    radius: jax.Array,
    faraway: float,
    *,
    n_exact: int | None = None,
    block_rays: int = 512,
    block_spheres: int = 32,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> SmoothParts:
    """Per-shard smooth nearest/coverage partials; see module docstring."""
    origin = jnp.broadcast_to(origin, direction.shape)
    if n_exact is None:
        n_exact = center.shape[0]
    outs = _smooth_nearest_raw(
        origin, direction, center, radius, faraway, n_exact,
        block_rays, block_spheres, interpret, frozenset(vma) if vma else None,
    )
    return SmoothParts(*outs)


# ---------------------------------------------------------------------------
# Kernel 2: smooth shadow-clear partial (+ backward kernel).
# ---------------------------------------------------------------------------


def _clear_fwd_kernel(
    o_ref, d_ref, self_ref, cc_ref, rc_ref, ce_ref, re_ref, clear_out,
    *, faraway: float, sharpness: float, bs_cheap: int, bs_exact: int, exact_base: int,
):
    o, d = _read_rays(o_ref, d_ref)
    width = o[0].shape[1]
    dtype = rc_ref.dtype
    self_idx = self_ref[:, :].astype(jnp.int32)  # (1, B)

    def tier(c_ref, r_ref, bs, base, block_fn, clear):
        def body(k, clear):
            c, r = _sphere_block(c_ref, r_ref, k * bs, bs)
            sol, disc, _ = block_fn(o, d, c, r, faraway)
            sidx = jax.lax.broadcasted_iota(jnp.int32, sol.shape, 0) + (k * bs + base)
            occl = _sig(sharpness * disc) * _sig(sharpness * sol)
            fac = jnp.where(sidx == self_idx, jnp.ones_like(occl), 1.0 - occl)
            # sequential row product (unrolled — Mosaic has no reduce-prod;
            # same factors as the XLA path's sphere-axis prod, rounding
            # order within the sharded-equivalence tolerances)
            prod = fac[0:1, :]
            for kk in range(1, fac.shape[0]):
                prod = prod * fac[kk : kk + 1, :]
            return clear * prod

        return jax.lax.fori_loop(0, c_ref.shape[0] // bs, body, clear)

    clear = jnp.ones((1, width), dtype)
    clear = tier(cc_ref, rc_ref, bs_cheap, 0, _block_sol_disc_fast, clear)
    clear = tier(ce_ref, re_ref, bs_exact, exact_base, _block_sol_disc_comp, clear)
    clear_out[:, :] = clear


def _clear_bwd_kernel(
    o_ref, d_ref, self_ref, clear_ref, g_ref, cc_ref, rc_ref, ce_ref, re_ref,
    go_out, gd_out, ggeom_out,
    *, faraway: float, sharpness: float, bs_cheap: int, bs_exact: int,
    exact_base: int, geom_base_exact: int,
):
    """Product adjoint, re-swept per sphere block (render Phase-C form).

    g_fac_k = g_clear * clear / fac_k; lane gradients accumulate across
    blocks; per-block (center, radius) gradients reduce the tile and
    accumulate into the whole-array ``ggeom_out`` (revisited by every
    grid step; zeroed on step 0).
    """
    o, d = _read_rays(o_ref, d_ref)
    dtype = rc_ref.dtype
    self_idx = self_ref[:, :].astype(jnp.int32)
    clear = clear_ref[:, :]
    g_clear = g_ref[:, :]
    gc = g_clear * clear  # shared numerator

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        ggeom_out[:, :] = jnp.zeros_like(ggeom_out)

    def tier(c_ref, r_ref, bs, base, geom_base, block_fn, carry):
        def body(k, carry):
            go0, go1, go2, gd0, gd1, gd2 = carry
            c, r = _sphere_block(c_ref, r_ref, k * bs, bs)
            sol, disc, _ = block_fn(o, d, c, r, faraway)
            sidx = jax.lax.broadcasted_iota(jnp.int32, sol.shape, 0) + (k * bs + base)
            sd = _sig(sharpness * disc)
            ss = _sig(sharpness * sol)
            occl = sd * ss
            is_self = sidx == self_idx
            fac = jnp.where(is_self, jnp.ones_like(occl), 1.0 - occl)
            g_fac = gc / jnp.maximum(fac, _EPS_DEN)
            g_occl = jnp.where(is_self, 0.0, -g_fac)
            g_disc = g_occl * ss * sd * (1.0 - sd) * sharpness
            g_sol = g_occl * sd * ss * (1.0 - ss) * sharpness
            # plain-tier (b, ct) for the branch adjoint (see
            # _smooth_nearest_bwd note on the compensated tier)
            oc = tuple(o[i] - c[i] for i in range(3))
            b = 2.0 * (d[0] * oc[0] + d[1] * oc[1] + d[2] * oc[2])
            ct = oc[0] * oc[0] + oc[1] * oc[1] + oc[2] * oc[2] - r * r
            g_b, g_ct = _sol_disc_adjoint(b, ct, g_sol, g_disc)
            go = tuple(2.0 * d[i] * g_b + 2.0 * oc[i] * g_ct for i in range(3))  # (K, B)
            gd = tuple(2.0 * oc[i] * g_b for i in range(3))
            go0 = go0 + jnp.sum(go[0], axis=0, keepdims=True)
            go1 = go1 + jnp.sum(go[1], axis=0, keepdims=True)
            go2 = go2 + jnp.sum(go[2], axis=0, keepdims=True)
            gd0 = gd0 + jnp.sum(gd[0], axis=0, keepdims=True)
            gd1 = gd1 + jnp.sum(gd[1], axis=0, keepdims=True)
            gd2 = gd2 + jnp.sum(gd[2], axis=0, keepdims=True)
            rows = jnp.concatenate(
                [jnp.sum(-go[i], axis=1, keepdims=True) for i in range(3)]
                + [jnp.sum(-2.0 * r * g_ct, axis=1, keepdims=True)],
                axis=1,
            )  # (K, 4)
            ggeom_out[pl.ds(geom_base + k * bs, bs), :] += rows
            return go0, go1, go2, gd0, gd1, gd2

        return jax.lax.fori_loop(0, c_ref.shape[0] // bs, body, carry)

    width = o[0].shape[1]
    zero = jnp.zeros((1, width), dtype)
    carry = (zero, zero, zero, zero, zero, zero)
    carry = tier(cc_ref, rc_ref, bs_cheap, 0, 0, _block_sol_disc_fast, carry)
    out = tier(ce_ref, re_ref, bs_exact, exact_base, geom_base_exact, _block_sol_disc_comp, carry)
    for i in range(3):
        go_out[i : i + 1, :] = out[i]
        gd_out[i : i + 1, :] = out[3 + i]


def _clear_call(origin, direction, self_f, faraway, sharpness, center, radius,
                n_exact, block_rays, block_spheres, interpret, vma):
    o, d, n = _pad_rays(origin, direction, block_rays)
    cc, rc, ce, re, bs_cheap, bs_exact, s_cheap = _split_tiers(
        center, radius, n_exact, block_spheres
    )
    n_pad = d.shape[0]
    si = jnp.concatenate([self_f, jnp.zeros((n_pad - n,), self_f.dtype)]).reshape(1, n_pad)
    kernel = functools.partial(
        _clear_fwd_kernel,
        faraway=faraway, sharpness=sharpness,
        bs_cheap=bs_cheap, bs_exact=bs_exact, exact_base=s_cheap,
    )
    lane = pl.BlockSpec((1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    clear = pl.pallas_call(
        kernel,
        grid=(n_pad // block_rays,),
        in_specs=[vec, vec, lane, whole, whole, whole, whole],
        out_specs=lane,
        out_shape=_out_struct((1, n_pad), d.dtype, vma),
        interpret=interpret,
    )(o.T, d.T, si, cc, rc, ce, re)
    return clear[0, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 7, 8, 9, 10, 11))
def _clear_raw(origin, direction, self_f, faraway, sharpness, center, radius,
               n_exact, block_rays, block_spheres, interpret, vma):
    return _clear_call(
        origin, direction, self_f, faraway, sharpness, center, radius,
        n_exact, block_rays, block_spheres, interpret, vma,
    )


def _clear_fwd(origin, direction, self_f, faraway, sharpness, center, radius,
               n_exact, block_rays, block_spheres, interpret, vma):
    clear = _clear_call(
        origin, direction, self_f, faraway, sharpness, center, radius,
        n_exact, block_rays, block_spheres, interpret, vma,
    )
    return clear, (origin, direction, self_f, center, radius, clear)


def _clear_bwd(faraway, sharpness, n_exact, block_rays, block_spheres, interpret, vma,
               residuals, g_clear):
    origin, direction, self_f, center, radius, clear = residuals
    o, d, n = _pad_rays(origin, direction, block_rays)
    cc, rc, ce, re, bs_cheap, bs_exact, s_cheap = _split_tiers(
        center, radius, n_exact, block_spheres
    )
    n_pad = d.shape[0]

    def pad_lane(x):
        return jnp.concatenate([x, jnp.zeros((n_pad - n,), x.dtype)]).reshape(1, n_pad)

    si = pad_lane(self_f)
    cl = pad_lane(clear)
    gl = pad_lane(g_clear)
    rows_cheap, rows_exact = cc.shape[0], ce.shape[0]
    kernel = functools.partial(
        _clear_bwd_kernel,
        faraway=faraway, sharpness=sharpness,
        bs_cheap=bs_cheap, bs_exact=bs_exact, exact_base=s_cheap,
        geom_base_exact=rows_cheap,
    )
    lane = pl.BlockSpec((1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_rows = rows_cheap + rows_exact
    geom_acc = pl.BlockSpec((n_rows, 4), lambda i: (0, 0), memory_space=pltpu.VMEM)
    go, gd, ggeom = pl.pallas_call(
        kernel,
        grid=(n_pad // block_rays,),
        in_specs=[vec, vec, lane, lane, lane, whole, whole, whole, whole],
        out_specs=(vec, vec, geom_acc),
        out_shape=(
            _out_struct((3, n_pad), d.dtype, vma),
            _out_struct((3, n_pad), d.dtype, vma),
            _out_struct((n_rows, 4), d.dtype, vma),
        ),
        interpret=interpret,
    )(o.T, d.T, si, cl, gl, cc, rc, ce, re)
    s = center.shape[0]
    n_ex = min(n_exact, s)
    g_rows = jnp.concatenate(
        [ggeom[: s - n_ex], ggeom[rows_cheap : rows_cheap + n_ex]], axis=0
    )  # (S_local, 4) in original row order
    g_center = g_rows[:, :3]
    g_radius = g_rows[:, 3]
    return (go.T[:n], gd.T[:n], jnp.zeros_like(self_f), g_center, g_radius)


_clear_raw.defvjp(_clear_fwd, _clear_bwd)


def smooth_clear_parts_pallas(
    origin: jax.Array,  # (N, 3) nudged points
    direction: jax.Array,  # (N, 3) unit dirs to the light
    center: jax.Array,  # (S_local, 3) — a sphere SHARD
    radius: jax.Array,
    self_idx: jax.Array,  # (N,) int32 LOCAL winner index (global - offset);
    # out-of-range values never match (not-owned lanes) — shadow_parts rule
    faraway: float,
    sharpness: float,
    *,
    n_exact: int | None = None,
    block_rays: int = 512,
    block_spheres: int = 32,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> jax.Array:
    """Per-shard smooth shadow-clear partial; the caller products across
    the sphere mesh axis (``prod(all_gather(...))``, render._shadow_smooth
    collective form).  Differentiable (custom backward kernel).

    ``self_idx`` rides as float32 so the custom_vjp sees only float
    operands (exact for any realistic sphere count; zero cotangent)."""
    origin = jnp.broadcast_to(origin, direction.shape)
    if n_exact is None:
        n_exact = center.shape[0]
    return _clear_raw(
        origin, direction, self_idx.astype(direction.dtype), faraway, float(sharpness),
        center, radius, n_exact, block_rays, block_spheres, interpret,
        frozenset(vma) if vma else None,
    )

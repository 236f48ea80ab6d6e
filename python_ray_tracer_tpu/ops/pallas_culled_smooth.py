"""Tile-culled SMOOTH bounce path: the acceleration structure for
DIFFERENTIABLE rendering at big-scene / big-frame scale.

The smooth training kernels (:mod:`.pallas_bounce_smooth_sub`, blocked
mode) sweep every sphere for every ray three times per bounce (nearest +
forward shadow + adjoint shadow) — O(S) per ray, the reference's own hot
loop (``/root/reference/ray_tracer/infrastructure/numpy/base.py:97`` +
``shape.py:28-51``) made dense.  This module extends the hard-visibility
candidate-list machinery (:mod:`.pallas_culled`) to the smooth sweeps,
with EXACT culling:

* ``sigmoid(sharp * x)`` underflows to exactly 0.0f once ``exp``
  overflows, i.e. for ``x < -90/sharp`` (f32 ``exp`` overflows past
  ~88.7; 90 leaves slack).  A sphere whose every ray in a tile has
  ``disc < -m`` OR ``sol < -m`` (``m = 90/sharp``) contributes an
  occlusion factor of exactly 1 and a coverage (and gradient) of exactly
  0 — culling it is exact to f32 resolution.
* ``disc = b^2 - 4c = 4(r^2 - d_perp^2)`` for unit rays, so
  ``disc >= -m  <=>  d_perp <= sqrt(r^2 + m/4)``: the interval tests run
  with the radius INFLATED to ``r_eff = sqrt(r^2 + m/4)``.
* ``sol >= -m`` additionally admits spheres just behind a ray origin;
  any such sphere's center lies within ``r_eff + m`` of the origin
  (|oc| <= |sol| + r), which widens the behind-the-origin clauses of the
  box/cone tests by ``t_margin = m`` (see
  :func:`.pallas_culled.interval_hit_mask`).

Structure per bounce (mirrors the hard path's two-kernel split so the
shadow lists cull against the ACTUAL hit points):

1. **Kernel A** (forward-only, stop_gradient inputs): culled nearest
   sweep + max-disc fallback winner — the smooth winner SELECTORS
   (piecewise-constant under AD, like the saved ``(idx, hit)`` of the
   two-launch pair) plus the hit point/normal the shadow candidate
   bounds need, plus a shadow-relevance mask (lanes with exactly zero
   coverage or throughput contribute nothing — excluding them from the
   bounds is exact).
2. XLA glue: shadow candidate lists from (p_n, to_light) with the
   light-apex double-cone test (margin-inflated).
3. **Kernel B** (custom_vjp fwd/bwd pair): the blocked smooth bounce of
   :class:`.pallas_bounce_smooth_sub._FwdSub` with the nearest sweep
   replaced by the known ``(idx, hit)`` and the shadow loops (forward
   product AND Phase C adjoint) iterating the candidate list.

Scope: deterministic smooth visibility (no stochastic roughness),
const/checker/image textures (external texel gather, like the other
smooth kernels), depth via a Python bounce loop.  Bounces past
``SMOOTH_CULL_BOUNCES`` fall back to the plain blocked ``_bounce_sub``
(reflected tiles are direction-incoherent without a re-sort; the hard
path measured bounce >= 2 candidate lists at essentially the full table
even WITH the re-sort — docs/PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene
from .pallas_bounce import _material_table, _COLS, _RAD
from .pallas_bounce_smooth import (
    _block_sol_disc_exact,
    _block_sol_disc_plain,
    _compensated_b_cterm,
    _dot3,
    _quad_sol_disc,
    _sig,
)
from .pallas_bounce_smooth_sub import (
    _SUBLANES,
    _adjoint_bounce,
    _bounce_sub,
    _consts_row,
    _FwdSub,
    _gather_cols_blk,
    _geometry_table,
    _smem_acc_spec,
    _sds,
    _vmem_acc_spec,
    _zero_table_grads,
)
from .pallas_culled import (
    CULL_BLOCK_RAYS,
    MAX_CAND,
    MAX_CULL_EXACT,
    MIN_CULL_SPHERES,
    _SORT_G,
    _unrolled_loop,
    candidate_lists,
    pack_tiles,
    ray_sort_keys,
    unpack_tiles,
)
from .pallas_intersect import _round_up
from .shading import NUDGE

# Bounces [0, SMOOTH_CULL_BOUNCES) build candidate lists; later bounces
# run the plain blocked _bounce_sub (see module docstring).  Before each
# culled REFLECTED bounce the ray state is re-sorted into coherent
# (origin cell, direction bin) groups — the hard path's scheme, made
# differentiable by a custom_vjp permutation (backward = inverse
# gather).  The hard path's finding (bounce >= 2 lists ~ full table, so
# stop culling there) did NOT transfer: on-chip A/B at 1024 spheres
# 1920x1080 depth 3 (benchmarks/culled_smooth_bench.py, 2026-08-20) the
# Adam step measured 374.0 / 288.3 / 218.9 ms culling 1 / 2 / 3 bounces
# (unculled 515.8) — the smooth sweeps run 3x per bounce (nearest +
# shadow fwd + shadow adjoint), so even half-full candidate lists pay
# where the hard path's single forward sweep did not.  Cull every bounce.
SMOOTH_CULL_BOUNCES = 1 << 30

# The culled smooth route pays candidate-build + two-kernel overhead per
# bounce; below this ray count the tiles are too wide a frustum slice to
# cull (the 256x144 probe measured 0.8-1.0 candidate fractions,
# docs/PERF.md) and the plain blocked kernels win.
MIN_CULL_SMOOTH_RAYS = 518400  # 960x540

# f32 sigmoid(x) == 0.0 exactly for x < -88.73 (exp overflow); 90 leaves
# slack for the candidate tests' own 1e-6 epsilons.
_SIG_UNDERFLOW = 90.0


# Stochastic glossy roughness through the culled path: interpret-parity-
# pinned (tests/test_culled_smooth.py::test_culled_stochastic_matches_
# blocked) AND hardware-validated (benchmarks/stoch_cull_smoke.py,
# 2026-08-21, post both_nappes fix): forward culled == blocked BITWISE at
# 960x540x128, gradients to 8.4e-6 relative, culled grad dispatch already
# faster at the gate edge (39.6 vs 42.3 ms).  Routed.
CULL_SMOOTH_STOCHASTIC = True


def cull_smooth_ok(scene: Scene, cfg, n_rays: int) -> bool:
    """Is the culled smooth route applicable (and expected to win)?"""
    from .pallas_bounce_smooth_sub import MAX_BLK_SPHERES_SMOOTH

    return (
        cfg.use_pallas
        and scene.spheres.count >= MIN_CULL_SPHERES
        and scene.spheres.count <= MAX_BLK_SPHERES_SMOOTH
        and scene.spheres.n_exact <= MAX_CULL_EXACT
        and n_rays >= MIN_CULL_SMOOTH_RAYS
        and (CULL_SMOOTH_STOCHASTIC or not cfg.stochastic_roughness)
    )


# ---------------------------------------------------------------------------
# Kernel A: culled smooth nearest — winner/fallback SELECTORS + bounds.
# ---------------------------------------------------------------------------


def _near_kernel_cs(
    o_ref, d_ref, thr_ref, alive_ref, cand_ref, cntc_ref, cntf_ref,
    geom_ref, geomT_ref,
    idx_out, hit_out, p_out, n_out, sval_out,
    *, faraway: float, s_cheap: int, s_total: int, sharp_e: float, unroll: int,
):
    dtype = o_ref.dtype
    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    shape = o[0].shape
    far = jnp.asarray(faraway, dtype)
    it = pl.program_id(0)

    # EXACT twin of _FwdSub's blocked nearest sweep (same per-sphere
    # formulas, same strict-< / strict-> tie rules), iterating this
    # tile's candidates.  True hits are always candidates (the inflated
    # radius is a superset of the plain one), so (tmin, imin) match the
    # full sweep bitwise.  The max-disc fallback races over ALL spheres
    # in the full sweep — including ones entirely BEHIND the ray — so the
    # nearest list is built with both_nappes=True (a pure line-distance
    # test, no forward clause): then a culled sphere has sigmoid(disc)
    # == 0 for every lane in the tile, the candidate argmax's disc is no
    # larger, and both choices' coverage is exactly zero — the winner can
    # only differ where the lane contributes nothing and dies either way
    # (see interval_hit_mask's both_nappes note; r5 parity bisect).
    def nb(k, carry, fn):
        tmin, imin, dmax, idmax = carry
        c = (geom_ref[0, k], geom_ref[1, k], geom_ref[2, k], geom_ref[3, k])
        sol, disc, t, _, _ = fn(o, d, (c[0], c[1], c[2]), c[3], faraway)
        take = t < tmin  # strict: lowest index wins exact ties
        tmin = jnp.where(take, t, tmin)
        imin = jnp.where(take, k, imin)
        taked = disc > dmax  # strict: lowest index on disc ties
        dmax = jnp.where(taked, disc, dmax)
        idmax = jnp.where(taked, k, idmax)
        return tmin, imin, dmax, idmax

    carry = (
        jnp.full(shape, far),
        jnp.zeros(shape, jnp.int32),
        jnp.full(shape, -jnp.asarray(3.0e38, dtype)),
        jnp.zeros(shape, jnp.int32),
    )
    body_p = functools.partial(nb, fn=_block_sol_disc_plain)
    carry = _unrolled_loop(
        cntc_ref[0, it], lambda j, c: body_p(cand_ref[0, 0, j], c), carry, unroll
    )
    carry = _unrolled_loop(cntf_ref[0, it], body_p, carry, unroll)
    for k in range(s_cheap, s_total):  # exact tier: always swept
        carry = nb(k, carry, fn=_block_sol_disc_exact)
    tmin, imin, dmax, idmax = carry

    hit = tmin != far
    idx = jnp.where(hit, imin, idmax)

    # Winner geometry + tier-matched per-lane quadratic — the same values
    # kernel B recomputes; here they only feed the hit point / normal the
    # shadow candidate BOUNDS use, and the exact zero-coverage gate.
    g = _gather_cols_blk(geomT_ref, (0, 1, 2, 3), idx, dtype)
    c_w = (g[0], g[1], g[2])
    r_w = g[3]
    oc = tuple(o[i] - c_w[i] for i in range(3))
    b_p = 2.0 * _dot3(d, oc)
    ct_p = _dot3(oc, oc) - r_w * r_w
    if s_cheap == s_total:
        b_w, ct_w = b_p, ct_p
    elif s_cheap == 0:
        b_w, ct_w = _compensated_b_cterm(o, d, c_w, r_w, dtype)
    else:
        b_e, ct_e = _compensated_b_cterm(o, d, c_w, r_w, dtype)
        is_exact = idx >= s_cheap
        b_w = jnp.where(is_exact, b_e, b_p)
        ct_w = jnp.where(is_exact, ct_e, ct_p)
    sol_w, disc_w, _ = _quad_sol_disc(b_w, ct_w, faraway, dtype)
    cov_w = _sig(sharp_e * disc_w) * _sig(sharp_e * sol_w)

    t_safe = jnp.where(hit, sol_w, jnp.ones_like(sol_w))
    inv_r = 1.0 / r_w
    idx_out[:, :] = idx
    hit_out[:, :] = hit.astype(dtype)
    for i in range(3):
        p_c = o[i] + d[i] * t_safe
        p_out[i] = p_c
        n_out[i] = (p_c - c_w[i]) * inv_r
    # Lanes with EXACTLY zero coverage or throughput contribute nothing
    # (forward or gradient) — excluding them from the shadow bounds is
    # exact, and keeps far-field hit points (the huge ground sphere) from
    # blowing up the shadow boxes.
    sval_out[:, :] = (
        (cov_w > 0) & (thr_ref[:, :] > 0) & (alive_ref[:, :] > 0)
    ).astype(dtype)


# ---------------------------------------------------------------------------
# Kernel B: fwd/bwd smooth shade with candidate-swept shadow loops.
# ---------------------------------------------------------------------------


def _fwd_kernel_cs(*refs, params):
    tex_hw = params[5]
    stoch = params[6]
    (o_ref, d_ref, thr_ref, alive_ref, acc_ref, idx_ref, hit_ref,
     candb_ref, cntb_ref, cntbf_ref, geom_ref, mat_ref, const_ref, *rest) = refs
    if stoch:
        xi_ref, *rest = rest
        xi = (xi_ref[0], xi_ref[1])
    else:
        xi = None
    (o_out, d_out, thr_out, alive_out, acc_out, clear_out, *tex_outs) = rest
    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    f = _FwdSub(
        o, d, thr_ref[:, :], alive_ref[:, :], (geom_ref, mat_ref, const_ref), params,
        known=(idx_ref[:, :], hit_ref[:, :] != 0),
        cand_sh=(candb_ref, cntb_ref, cntbf_ref),
        xi=xi,
    )
    for i in range(3):
        acc_out[i] = acc_ref[i] + f.color[i] * f.w
        o_out[i] = f.p_n[i]
        d_out[i] = f.dout[i]
    thr_out[:, :] = f.thr_out
    alive_out[:, :] = f.alive_out
    clear_out[:, :] = f.clear
    if tex_outs:
        flat_out, dww_out = tex_outs
        flat_out[:, :] = f.flat
        dww_out[:, :] = f.dww


def _bwd_kernel_cs(*refs, params):
    (faraway, s_cheap, s_total, _, _, tex_hw, stoch, blocked, *_rest) = params
    (
        o_ref, d_ref, thr_ref, alive_ref, idx_ref, hit_ref, clear_ref,
        candb_ref, cntb_ref, cntbf_ref, geom_ref, mat_ref, const_ref, *rest,
    ) = refs
    if stoch:
        xi_ref, *rest = rest
        xi = (xi_ref[0], xi_ref[1])
    else:
        xi = None
    (go_ref, gd_ref, gthr_ref, galive_ref, gacc_ref, *rest) = rest
    gdww_raw = None
    if tex_hw is not None:
        gdww_raw = rest[0][:, :]
        rest = rest[1:]
    (go_in_ref, gd_in_ref, gthr_in_ref, galive_in_ref, ggeom_ref, gmat_ref, gconst_ref) = rest
    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    f = _FwdSub(
        o, d, thr_ref[:, :], alive_ref[:, :], (geom_ref, mat_ref, const_ref), params,
        saved=(idx_ref[:, :], hit_ref[:, :] != 0, clear_ref[:, :]),
        cand_sh=(candb_ref, cntb_ref, cntbf_ref),
        xi=xi,
    )
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        _zero_table_grads(ggeom_ref, gmat_ref, gconst_ref, blocked, s_total)

    cots = (
        (go_ref[0], go_ref[1], go_ref[2]),
        (gd_ref[0], gd_ref[1], gd_ref[2]),
        gthr_ref[:, :],
        galive_ref[:, :],
        (gacc_ref[0], gacc_ref[1], gacc_ref[2]),
        gdww_raw,
    )
    g_o_in, g_d_in, g_thr_in, g_alive_in = _adjoint_bounce(
        f, o, d, cots, geom_ref, ggeom_ref, gmat_ref, gconst_ref, params
    )
    for i in range(3):
        go_in_ref[i] = g_o_in[i]
        gd_in_ref[i] = g_d_in[i]
    gthr_in_ref[:, :] = g_thr_in
    galive_in_ref[:, :] = g_alive_in


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp.
# ---------------------------------------------------------------------------


def _specs_cs(b_cols):
    lane = pl.BlockSpec((_SUBLANES, b_cols), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((3, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    cand = pl.BlockSpec((1, 1, MAX_CAND), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    return lane, vec, smem, cand


def _near_call_cs(params, o3, d3, thr, alive, cand_a, cnt_a, cnt_af, geomT, geomT_pad):
    (faraway, s_cheap, s_total, sharp_e, _sharp_s, _tex_hw, _st, _bl,
     block_rays, interpret, vma) = params
    m_cols = d3.shape[2]
    b_cols = block_rays // _SUBLANES
    lane, vec, smem, cand = _specs_cs(b_cols)
    dtype = d3.dtype
    kernel = functools.partial(
        _near_kernel_cs, faraway=faraway, s_cheap=s_cheap, s_total=s_total,
        sharp_e=sharp_e, unroll=1 if interpret else 8,
    )
    return pl.pallas_call(
        kernel,
        grid=(m_cols // b_cols,),
        in_specs=[vec, vec, lane, lane, cand, smem, smem, smem,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(lane, lane, vec, vec, lane),
        out_shape=(
            _sds((_SUBLANES, m_cols), jnp.int32, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
        ),
        interpret=interpret,
    )(o3, d3, thr, alive, cand_a, cnt_a, cnt_af, geomT, geomT_pad)


def _kparams(params):
    """Call-level params -> kernel-level params (the _FwdSub layout)."""
    from .pallas_bounce_smooth_sub import _blk_unroll

    (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked,
     block_rays, interpret, vma) = params
    return (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked,
            1 if interpret else _blk_unroll(s_total))


def _fwd_call_cs(params, o3, d3, thr, alive, acc, idx, hit, cand_b, cnt_b, cnt_bf, geom, mat, consts, xi3=None):
    (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked,
     block_rays, interpret, vma) = params
    m_cols = d3.shape[2]
    b_cols = block_rays // _SUBLANES
    lane, vec, smem, cand = _specs_cs(b_cols)
    lane_i = lane
    dtype = d3.dtype
    kernel = functools.partial(_fwd_kernel_cs, params=_kparams(params))
    xi_spec = (
        [pl.BlockSpec((2, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)]
        if stoch
        else []
    )
    xi_in = (xi3,) if stoch else ()
    tex_specs = (lane, lane) if tex_hw is not None else ()
    tex_shapes = (
        (_sds((_SUBLANES, m_cols), jnp.int32, vma), _sds((_SUBLANES, m_cols), dtype, vma))
        if tex_hw is not None
        else ()
    )
    return pl.pallas_call(
        kernel,
        grid=(m_cols // b_cols,),
        in_specs=[vec, vec, lane, lane, vec, lane_i, lane, cand, smem, smem,
                  smem, pl.BlockSpec(memory_space=pltpu.VMEM), smem] + xi_spec,
        out_specs=(vec, vec, lane, lane, vec, lane) + tex_specs,
        out_shape=(
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
        )
        + tex_shapes,
        interpret=interpret,
    )(o3, d3, thr, alive, acc, idx, hit, cand_b, cnt_b, cnt_bf, geom.T, mat, consts, *xi_in)


def _bwd_call_cs(params, o3, d3, thr, alive, idx, hit, clear, cand_b, cnt_b, cnt_bf,
                 geom, mat, consts, g_o, g_d, g_thr, g_alive, g_acc, g_dww=None, xi3=None):
    (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked,
     block_rays, interpret, vma) = params
    m_cols = d3.shape[2]
    b_cols = block_rays // _SUBLANES
    lane, vec, smem, cand = _specs_cs(b_cols)
    dtype = d3.dtype
    geom_acc = _vmem_acc_spec(geom.shape)
    mat_acc = _vmem_acc_spec(mat.shape)
    kernel = functools.partial(_bwd_kernel_cs, params=_kparams(params))
    xi_spec = (
        [pl.BlockSpec((2, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)]
        if stoch
        else []
    )
    xi_in = (xi3,) if stoch else ()
    tex_in = (g_dww,) if tex_hw is not None else ()
    return pl.pallas_call(
        kernel,
        grid=(m_cols // b_cols,),
        in_specs=[
            vec, vec, lane, lane, lane, lane, lane,  # saved state + idx/hit/clear
            cand, smem, smem,  # shadow candidates
            smem, pl.BlockSpec(memory_space=pltpu.VMEM), smem,  # tables
        ]
        + xi_spec
        + [
            vec, vec, lane, lane, vec,  # cotangents
        ]
        + ([lane] if tex_hw is not None else []),
        out_specs=(vec, vec, lane, lane, geom_acc, mat_acc, _smem_acc_spec(consts.shape)),
        out_shape=(
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
            _sds(geom.shape, dtype, vma),
            _sds(mat.shape, dtype, vma),
            _sds(consts.shape, dtype, vma),
        ),
        interpret=interpret,
    )(o3, d3, thr, alive, idx, hit, clear, cand_b, cnt_b, cnt_bf,
      geom.T, mat, consts, *xi_in, g_o, g_d, g_thr, g_alive, g_acc, *tex_in)


def _int_zero(x):
    """float0 cotangent for an integer-dtype primal."""
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bounce_cs(params, o3, d3, thr, alive, acc, idx, hit, cand_b, cnt_b, cnt_bf, geom, mat, consts):
    outs = _fwd_call_cs(params, o3, d3, thr, alive, acc, idx, hit, cand_b, cnt_b, cnt_bf, geom, mat, consts)
    tex_hw = params[5]
    return outs[:5] + (outs[6:] if tex_hw is not None else ())


def _bounce_cs_vjp_fwd(params, o3, d3, thr, alive, acc, idx, hit, cand_b, cnt_b, cnt_bf, geom, mat, consts):
    outs = _fwd_call_cs(params, o3, d3, thr, alive, acc, idx, hit, cand_b, cnt_b, cnt_bf, geom, mat, consts)
    clear = outs[5]
    primal = outs[:5] + (outs[6:] if params[5] is not None else ())
    return primal, (o3, d3, thr, alive, idx, hit, clear, cand_b, cnt_b, cnt_bf, geom, mat, consts)


def _bounce_cs_vjp_bwd(params, res, cots):
    (o3, d3, thr, alive, idx, hit, clear, cand_b, cnt_b, cnt_bf, geom, mat, consts) = res
    if params[5] is not None:
        (g_o, g_d, g_thr, g_alive, g_acc, _g_flat, g_dww) = cots  # flat is int: float0
        g_dww = jnp.asarray(g_dww, d3.dtype)
    else:
        (g_o, g_d, g_thr, g_alive, g_acc) = cots
        g_dww = None
    (go_in, gd_in, gthr_in, galive_in, ggeom, gmat, gconsts) = _bwd_call_cs(
        params, o3, d3, thr, alive, idx, hit, clear, cand_b, cnt_b, cnt_bf,
        geom, mat, consts, g_o, g_d, g_thr, g_alive, g_acc, g_dww,
    )
    # idx/hit are SELECTORS (piecewise-constant, like the saved residuals
    # of the two-launch pair) and the candidate lists are conservative
    # sets: all carry zero cotangents.
    return (go_in, gd_in, gthr_in, galive_in, g_acc,
            _int_zero(idx), jnp.zeros_like(hit),
            _int_zero(cand_b), _int_zero(cnt_b), _int_zero(cnt_bf),
            ggeom, gmat, gconsts)


_bounce_cs.defvjp(_bounce_cs_vjp_fwd, _bounce_cs_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bounce_cs_stoch(params, o3, d3, thr, alive, acc, idx, hit, cand_b, cnt_b, cnt_bf, xi3, geom, mat, consts):
    """Stochastic-roughness culled bounce: xi (2, 8, M) uniforms drive the
    GGX microfacet perturbation of the mirror continuation (constant
    sample; its adjoint chains through the perturbation)."""
    outs = _fwd_call_cs(params, o3, d3, thr, alive, acc, idx, hit, cand_b, cnt_b, cnt_bf, geom, mat, consts, xi3=xi3)
    return outs[:5] + (outs[6:] if params[5] is not None else ())


def _bounce_cs_stoch_vjp_fwd(params, o3, d3, thr, alive, acc, idx, hit, cand_b, cnt_b, cnt_bf, xi3, geom, mat, consts):
    outs = _fwd_call_cs(params, o3, d3, thr, alive, acc, idx, hit, cand_b, cnt_b, cnt_bf, geom, mat, consts, xi3=xi3)
    clear = outs[5]
    primal = outs[:5] + (outs[6:] if params[5] is not None else ())
    return primal, (o3, d3, thr, alive, idx, hit, clear, cand_b, cnt_b, cnt_bf, xi3, geom, mat, consts)


def _bounce_cs_stoch_vjp_bwd(params, res, cots):
    (o3, d3, thr, alive, idx, hit, clear, cand_b, cnt_b, cnt_bf, xi3, geom, mat, consts) = res
    if params[5] is not None:
        (g_o, g_d, g_thr, g_alive, g_acc, _g_flat, g_dww) = cots
        g_dww = jnp.asarray(g_dww, d3.dtype)
    else:
        (g_o, g_d, g_thr, g_alive, g_acc) = cots
        g_dww = None
    (go_in, gd_in, gthr_in, galive_in, ggeom, gmat, gconsts) = _bwd_call_cs(
        params, o3, d3, thr, alive, idx, hit, clear, cand_b, cnt_b, cnt_bf,
        geom, mat, consts, g_o, g_d, g_thr, g_alive, g_acc, g_dww, xi3=xi3,
    )
    return (go_in, gd_in, gthr_in, galive_in, g_acc,
            _int_zero(idx), jnp.zeros_like(hit),
            _int_zero(cand_b), _int_zero(cnt_b), _int_zero(cnt_bf),
            jnp.zeros_like(xi3), ggeom, gmat, gconsts)


_bounce_cs_stoch.defvjp(_bounce_cs_stoch_vjp_fwd, _bounce_cs_stoch_vjp_bwd)


# ---------------------------------------------------------------------------
# Differentiable group permutation (the reflected-bounce re-sort).
# ---------------------------------------------------------------------------


def _gather_groups(state: jax.Array, perm: jax.Array) -> jax.Array:
    """Permute whole _SORT_G-ray groups of a (C, N_pad) flat state.

    One interleaved (ng, C*G) row take — TPU gathers are row-count-bound,
    so moving C channels per row beats C separate channel takes
    (docs/PERF.md, the hard culled path's measurement)."""
    c, n_pad = state.shape
    ng = n_pad // _SORT_G
    st = state.reshape(c, ng, _SORT_G).transpose(1, 0, 2).reshape(ng, c * _SORT_G)
    st = jnp.take(st, perm, axis=0)
    return st.reshape(ng, c, _SORT_G).transpose(1, 0, 2).reshape(c, n_pad)


@jax.custom_vjp
def _permute_groups(state, perm, inv):
    """Differentiable group permutation: ``y = P x``; the VJP gathers by
    the (precomputed) inverse permutation — ``x_bar = P^T y_bar`` — so
    the backward pass never pays a scatter."""
    return _gather_groups(state, perm)


def _permute_groups_fwd(state, perm, inv):
    return _gather_groups(state, perm), (perm, inv)


def _permute_groups_bwd(res, g):
    perm, inv = res
    return _gather_groups(g, inv), _int_zero(perm), _int_zero(inv)


_permute_groups.defvjp(_permute_groups_fwd, _permute_groups_bwd)


# ---------------------------------------------------------------------------
# Driver.
# ---------------------------------------------------------------------------


def trace_culled_smooth(
    origin: jax.Array,
    direction: jax.Array,  # (N, 3) unit — or (3, N) with transposed=True
    scene: Scene,
    cfg,  # RenderConfig
    vma: frozenset | None = None,
    transposed: bool = False,
    key: jax.Array | None = None,  # PRNG key: stochastic glossy roughness
) -> jax.Array:
    """Differentiable smooth trace with per-tile candidate culling."""
    from .pallas_bounce import _ray_state_t

    dtype = cfg.dtype
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

    # Tile-contiguous packing (pack_tiles): each (8, b_cols) tile is a run
    # of consecutive rays — a narrow direction cone the interval tests can
    # cull against.  (The plain blocked kernels use a flat reshape; the
    # kernels themselves are per-lane, so only packing/unpacking differs.)
    o3 = pack_tiles(o_t, b_cols)
    d3 = pack_tiles(d_t, b_cols)

    s_total = scene.spheres.count
    s_cheap = s_total - scene.spheres.n_exact
    geom = _geometry_table(scene, dtype)  # (S, 4)
    geomT = geom.T  # (4, S) SMEM scalar reads
    s_pad = _round_up(s_total, 128)
    # (4, S_pad) VMEM transpose for kernel A's winner-geometry gather
    # (pad radius 1 keeps any stray read finite; idx < S always).
    geomT_pad = jnp.zeros((4, s_pad), dtype).at[3, :].set(1.0).at[:, :s_total].set(geomT)
    tbl = _material_table(scene, dtype)
    if tbl.shape[0] < s_pad:
        padrows = jnp.zeros((s_pad - tbl.shape[0], _COLS), dtype).at[:, _RAD].set(1.0)
        tbl = jnp.concatenate([tbl, padrows], axis=0)
    mat = tbl[:s_pad].T  # (C, S_pad)
    consts = _consts_row(scene, dtype)

    atlas = scene.texture_atlas
    textured = atlas.shape[1] > 1 or atlas.shape[2] > 1
    tex_hw = (int(atlas.shape[1]), int(atlas.shape[2])) if textured else None
    texels = jnp.asarray(atlas, dtype).reshape(-1, 3) if textured else None

    center_cheap = jax.lax.stop_gradient(jnp.asarray(scene.spheres.center[:s_cheap], dtype))
    radius_cheap = jax.lax.stop_gradient(jnp.asarray(scene.spheres.radius[:s_cheap], dtype))
    light = jax.lax.stop_gradient(jnp.asarray(scene.lights.point_position, dtype))

    # Exact smooth-culling margins (module docstring): radius inflated for
    # the disc sigmoid, behind-clauses widened for the sol sigmoid.
    m_e = _SIG_UNDERFLOW / float(cfg.edge_sharpness)
    m_s = _SIG_UNDERFLOW / float(cfg.shadow_sharpness)
    r_eff_e = jnp.sqrt(radius_cheap**2 + m_e / 4.0)
    r_eff_s = jnp.sqrt(radius_cheap**2 + m_s / 4.0)

    stochastic = key is not None and cfg.stochastic_roughness
    params = (
        cfg.faraway, s_cheap, s_total,
        float(cfg.edge_sharpness), float(cfg.shadow_sharpness),
        tex_hw, stochastic, True,
        block, cfg.pallas_interpret,
        frozenset(vma) if vma else None,
    )

    if vma:
        def to_varying(x):
            missing = tuple(a for a in vma if a not in getattr(jax.typeof(x), "vma", frozenset()))
            return jax.lax.pcast(x, missing, to="varying") if missing else x

        o3, d3, geom, geomT, geomT_pad, mat, consts = (
            to_varying(x) for x in (o3, d3, geom, geomT, geomT_pad, mat, consts)
        )

    thr = jnp.ones((_SUBLANES, m_cols), dtype)
    alive = jnp.ones((_SUBLANES, m_cols), dtype)
    acc = jnp.zeros((3, _SUBLANES, m_cols), dtype)
    if vma:
        thr, alive, acc = (to_varying(x) for x in (thr, alive, acc))

    sg = jax.lax.stop_gradient

    def compose_tex(out):
        if not textured:
            return out
        o3n, d3n, thr_n, alive_n, acc_n, flat, dww = out
        tex_c = jnp.moveaxis(jnp.take(texels, flat, axis=0), -1, 0)
        return (o3n, d3n, thr_n, alive_n, acc_n + tex_c * dww[None])

    # Cheap-tier scene bbox for the reflected-ray sort keys (the huge
    # exact-tier ground would flatten the origin grid to one cell).
    bb_lo = jnp.min(center_cheap - radius_cheap[:, None], axis=0)
    bb_hi = jnp.max(center_cheap + radius_cheap[:, None], axis=0)
    ng = n_pad // _SORT_G
    gid = jnp.arange(ng, dtype=jnp.int32)  # undo-permutation carry
    sorted_any = False
    k_seed = key

    for b in range(cfg.max_depth):
        if 0 < b < SMOOTH_CULL_BOUNCES:
            # Re-sort whole _SORT_G-ray groups into (origin cell,
            # direction bin) coherence so the reflected tiles cull again
            # — semantically a pure permutation (per-lane results are
            # grouping-independent; candidate lists are conservative for
            # ANY grouping), differentiable via _permute_groups.
            state = jnp.concatenate(
                [
                    unpack_tiles(o3, b_cols),
                    unpack_tiles(d3, b_cols),
                    unpack_tiles(jnp.stack([thr, alive]), b_cols),
                    unpack_tiles(acc, b_cols),
                ],
                axis=0,
            )  # (11, N_pad) flat ray order
            st_sg = sg(state)
            live_f = ((st_sg[6] * st_sg[7]) > 0).astype(dtype)
            lg = live_f.reshape(ng, _SORT_G)
            wsum = jnp.maximum(lg.sum(axis=1), 1.0)
            cg = st_sg[:6].reshape(6, ng, _SORT_G)
            cent = (cg * lg).sum(axis=2) / wsum  # (6, ng) live-ray centroid
            keys = ray_sort_keys(cent[0:3], cent[3:6], lg.any(axis=1), bb_lo, bb_hi)
            perm = jnp.argsort(keys, stable=True).astype(jnp.int32)
            inv = jnp.argsort(perm).astype(jnp.int32)
            state = _permute_groups(state, perm, inv)
            gid = jnp.take(gid, perm)
            sorted_any = True
            s3 = pack_tiles(state, b_cols)
            o3, d3 = s3[0:3], s3[3:6]
            thr, alive = s3[6], s3[7]
            acc = s3[8:11]
        xi3 = None
        if stochastic:
            # EXACT seed schedule of the scan/XLA stochastic paths: fold
            # per bounce, uniforms over the UNPADDED ray count in FLAT
            # ray order — then follow the rays through the accumulated
            # group sorts (xi is a constant sample: plain gather).
            from .rng import fold_seed, uniform2

            k_seed, k_bounce = fold_seed(k_seed, 1), fold_seed(k_seed, 2)
            xi = uniform2(k_bounce, n, dtype)
            if n_pad != n:
                xi = jnp.concatenate([xi, jnp.full((n_pad - n, 2), 0.5, dtype)], axis=0)
            xi_t = xi.T  # (2, N_pad) flat ray order
            if sorted_any:
                xi_t = _gather_groups(xi_t, gid)
            xi3 = pack_tiles(xi_t, b_cols)
        if b < SMOOTH_CULL_BOUNCES:
            o_sg, d_sg = sg(o3), sg(d3)
            thr_sg, alive_sg = sg(thr), sg(alive)
            # Lanes with exactly zero throughput/aliveness never contribute
            # — excluding them from the candidate bounds is exact.
            valid = None if b == 0 else ((thr_sg > 0) & (alive_sg > 0))
            # both_nappes: the miss-lane fallback is argmax disc over ALL
            # spheres, so any line-piercing sphere (either nappe, any t)
            # can decide the winner — the list must be a pure line test
            # (pallas_culled.interval_hit_mask, both_nappes note; fixed
            # after the r5 480x270 hardware parity bisect).
            cand_a, cnt_a, cnt_af = candidate_lists(
                o_sg, d_sg, center_cheap, r_eff_e, b_cols, valid=valid,
                t_margin=m_e, both_nappes=True,
            )
            if vma:
                cand_a, cnt_a, cnt_af = (to_varying(x) for x in (cand_a, cnt_a, cnt_af))
            # Every kernel-A operand is stop_gradient: its outputs are
            # selectors/bounds only, so AD never needs a VJP rule for it.
            idx, hitf, p, nrm, sval = _near_call_cs(
                params, o_sg, d_sg, thr_sg, alive_sg,
                cand_a[:, None, :], cnt_a, cnt_af, sg(geomT), sg(geomT_pad),
            )
            p_n = p + nrm * NUDGE
            lv = light[:, None, None] - p
            to_light = lv / jnp.sqrt(jnp.sum(lv * lv, axis=0, keepdims=True))
            cand_b, cnt_b, cnt_bf = candidate_lists(
                p_n, to_light, center_cheap, r_eff_s, b_cols,
                valid=sval > 0, light=light, t_margin=m_s,
            )
            if vma:
                cand_b, cnt_b, cnt_bf = (to_varying(x) for x in (cand_b, cnt_b, cnt_bf))
            if stochastic:
                out = compose_tex(_bounce_cs_stoch(
                    params, o3, d3, thr, alive, acc, idx, hitf,
                    cand_b[:, None, :], cnt_b, cnt_bf, xi3, geom, mat, consts,
                ))
            else:
                out = compose_tex(_bounce_cs(
                    params, o3, d3, thr, alive, acc, idx, hitf,
                    cand_b[:, None, :], cnt_b, cnt_bf, geom, mat, consts,
                ))
        else:
            # Reflected tiles are direction-incoherent (no re-sort here);
            # the plain blocked bounce is the measured winner there.
            if stochastic:
                from .pallas_bounce_smooth_sub import _bounce_sub_stoch

                out = compose_tex(
                    _bounce_sub_stoch(params, o3, d3, thr, alive, acc, xi3, geom, mat, consts)
                )
            else:
                out = compose_tex(_bounce_sub(params, o3, d3, thr, alive, acc, geom, mat, consts))
        o3, d3, thr, alive, acc = out

    acc_f = unpack_tiles(acc, b_cols)  # (3, N_pad), sorted ray order
    if sorted_any:
        # Undo the bounce sorts at group granularity.  For a permutation
        # p, argsort(p) is its inverse: un-sorting gathers by argsort(gid)
        # and its VJP gathers by gid itself.
        perm_u = jnp.argsort(gid).astype(jnp.int32)
        acc_f = _permute_groups(acc_f, perm_u, gid)
    return acc_f.T[:n]

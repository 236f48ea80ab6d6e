"""Sublane-packed fused smooth bounce: forward AND handwritten adjoint.

The round-2 layout rewrite of :mod:`.pallas_bounce_smooth`: rays packed
into full ``(8, B)`` VPU tiles (8 sublanes x 128 lanes all busy) with
spheres iterated as SMEM scalars — the attribution experiments
(``benchmarks/attrib_bench.py``) measured the lane-major ``(1, B)`` layout
at 1/8 VPU width; the hard-forward port of this layout ran 3.4x faster.

Semantics are identical to the lane kernels (which replicate
:func:`..render.trace`'s smooth bounce — sigmoid coverage of the winning
sphere, shadow = product over other spheres of ``1 - sigmoid occlusion``,
the full reference BRDF of
``/root/reference/ray_tracer/infrastructure/numpy/shader.py:63-112``, and
the mirror continuation), up to float reduction order: sphere reductions
run sequentially over real (unpadded) spheres instead of blocked
sublane/tree reductions.

The backward kernel recomputes the forward per ray tile from saved
(idx, hit, clear), then runs the manual adjoint: the per-lane chain rule
phases are verbatim from the lane kernel (shape-agnostic); the shadow
product adjoint is a scalar sphere loop; sphere-side gradients reduce the
full tile to scalars accumulated in SMEM outputs.  Gradients match
``jax.grad`` of the XLA path (tests/test_fused_smooth.py).

Scope: const/checker/image textures, deterministic mirror AND stochastic
glossy (GGX-perturbed, host-fed xi) continuations — both with handwritten
adjoints — single shard or inside shard_map.  ``S <=
MAX_SUB_SPHERES_SMOOTH`` unrolls the sphere loops per sphere; bigger
tables (up to ``MAX_BLK_SPHERES_SMOOTH``) switch to the BLOCKED mode
(``lax.fori_loop`` sweeps + piecewise material gathers + one-hot matmul
gradient scatter) with identical semantics; beyond that the blocked lane
kernel (deterministic, const/checker only) remains the fallback.
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
    _TFW, _TFT, _TFI, _KIND, _TID, _TEXH, _TEXW, _COLS, _NCONST,
    _asin_poly, _atan2_poly, _material_table,
)
from .pallas_bounce_smooth import (
    _block_sol_disc_exact,
    _block_sol_disc_plain,
    _dot3,
    _norm3,
    _quad_sol_disc,
    _sig,
    _sol_disc_adjoint,
    _EPS_DEN,
)
from .pallas_bounce_sub import _SUBLANES, _consts_row, _geometry_table
from .pallas_intersect import _round_up
from .shading import AMBIENT, GLINT_EXPONENT, NUDGE, SHADING_EPS

# The sphere loops unroll per sphere (scalar SMEM reads); past this count
# compile size and the O(S * C) material select stop scaling and the
# BLOCKED sublane mode below takes over.
MAX_SUB_SPHERES_SMOOTH = 16

# Blocked-mode ray-tile floor: the per-sphere fori_loop carries fixed
# scalar-core overhead (loop bookkeeping + 4 dynamic SMEM reads) per
# iteration, amortized over the tile's rays.  At unroll 1 (r3) the
# overhead forced 8192 (2048/4096/8192/36864 = 1.84/1.29/1.20/1.22 ms);
# the round-4 8-wide unroll cut it ~8x, and the optimum moved to 4096 —
# which also divides 256x144 exactly (no padding waste).  Re-swept
# 2026-08-20 (config-5 Adam step): floor 1024/2048/4096/8192 =
# 0.970/0.942/0.908/0.958 ms at 64 spheres; 10.01/9.43/10.30 ms at 1024
# (2048/4096/8192).
_BLK_MIN_BLOCK_RAYS = 4096

# Blocked sublane mode (``blocked=True`` in params): the same (8, B)
# full-width ray tiles and per-lane adjoint, but spheres iterate via
# ``lax.fori_loop`` over the SMEM geometry table (winner + shadow sweeps,
# shadow adjoint), winner materials come from piecewise per-vreg lane
# gathers against a (C, S_pad) VMEM table transpose (the culled kernel's
# proven MAT_GATHER_MODE="piecewise" form), and the material-gradient
# scatter is one one-hot MXU matmul per sublane row.  Compile size is
# O(1) in S, so 64..4096-sphere scenes train through the fused fwd+bwd
# pair at full VPU width (VERDICT r2 item 1) — the cap is the SMEM
# geometry table, not the kernel structure.
MAX_BLK_SPHERES_SMOOTH = 4096

# Material columns the smooth kernel consumes; atlas scenes additionally
# select the texture id + native extents.
_MCOLS = (_CX, _CY, _CZ, _RAD, _DG, _DCR, _DCG, _DCB, _SG, _ROUGH, _IG, _IOR, _TFW, _TFT, _TFI, _KIND)
_MCOLS_TEX = _MCOLS + (_TID, _TEXH, _TEXW)


def _scalar_sphere(geom_ref, k):
    """(cx, cy, cz, r) scalars of sphere k from the SMEM geometry table."""
    return geom_ref[k, 0], geom_ref[k, 1], geom_ref[k, 2], geom_ref[k, 3]


def _scalar_sphere_t(geom_ref, k):
    """Sphere k from the TRANSPOSED (4, S) SMEM table (blocked mode).

    SMEM rows pad to 512 B each, so an (S, 4) layout costs S x 512 B —
    the whole ~1 MB SMEM at S = 2048 (measured compile OOM).  Four (S,)
    rows cost 4 x max(512 B, 4S).
    """
    return geom_ref[0, k], geom_ref[1, k], geom_ref[2, k], geom_ref[3, k]


def _sphere_fn(k, s_cheap):
    """Tier-correct (sol, disc, t, b, ct) evaluator for sphere k."""
    return _block_sol_disc_plain if k < s_cheap else _block_sol_disc_exact


# Blocked-mode sphere-loop unroll width: one-sphere-per-iteration scalar
# loops hide only one vreg of vector work behind each iteration's serial
# SMEM loads + loop control (the culled kernels measured 4x from the same
# structure, pallas_culled._UNROLL); grouping U spheres per fori_loop
# iteration overlaps their scalar loads with vector work.  On-chip
# config-5 A/B (benchmarks/config5_bench.py, 2026-08-20, full Adam step
# 256x144 depth 3): unroll 1 / 4 / 8 = 1.141 / 0.986 / 0.958 ms at 64
# spheres, 12.41 / 10.56 / 10.30 ms at 1024 — same float sequence per
# sphere, so results are identical to the rolled loop.
_BLK_UNROLL = 8

# Phase C row-flush batching: candidates per batched cross-lane pass in
# the shadow-adjoint loop (see _adjoint_bounce).  Kept a separate knob
# from _BLK_UNROLL (flushing joins its candidates' live ranges).
_PHASEC_FLUSH = 8

# Batched Phase C rows (r5): stage-1 sublane partials per candidate, ONE
# cross-lane tree per flush group, masked-diagonal row extraction (no
# cross-sublane slicing — Mosaic rejects "offset mismatch on non-concat
# dimension").  CPU-interpret parity is pinned by the suite either way
# (tests/test_fused_smooth.py gradient parity runs both settings across
# the suite), but the new lowering is NOT yet compiled on real hardware:
# the tunnel went down mid-validation (2026-08-21, ~4 h outage).  Default
# OFF = the round-4 per-candidate form, hardware-proven.  Flip after a
# successful `verify` culled/blocked train smoke on the chip.
_PHASEC_BATCHED = False


def _blk_unroll(s_total):
    """Unroll width for a given table size: the 8-wide bodies' live
    temporaries add to the kernel's scoped-VMEM stack, which the deep
    BWD kernel overran by 676 KB at 4096 spheres (hardware probe,
    2026-08-20) — halve the unroll past 2048."""
    return _BLK_UNROLL if s_total <= 2048 else max(1, _BLK_UNROLL // 2)


def _fori_unrolled(lo, hi, body, carry, unroll=None):
    """fori_loop over [lo, hi) with the body unrolled `unroll` wide.

    `lo`/`hi` are static Python ints (sphere-tier bounds); the tail
    (< unroll iterations) unrolls in Python.  `unroll` defaults to the
    module's _BLK_UNROLL at CALL time (A/B harnesses monkeypatch it).
    """
    if unroll is None:
        unroll = _BLK_UNROLL
    n = hi - lo
    main = n // unroll

    def gbody(g, c):
        k = lo + g * unroll
        for u in range(unroll):
            c = body(k + u, c)
        return c

    if main:
        carry = jax.lax.fori_loop(0, main, gbody, carry)
    for k in range(lo + main * unroll, hi):
        carry = body(k, carry)
    return carry


def _cheap_tier_loops(body, carry, s_cheap, uw, cand):
    """Drive `body(k, carry)` over the cheap sphere tier: either the full
    ``[0, s_cheap)`` range (``cand=None``) or this tile's candidate list
    + per-tile full-sweep fallback count (``cand = (cand_ref, cnt_ref,
    cnt_full_ref)`` — the culled kernels' id-indirection pattern).  The
    exact tier is NOT driven here (callers always sweep it in full)."""
    if cand is None:
        return _fori_unrolled(0, s_cheap, body, carry, uw)
    from .pallas_culled import _unrolled_loop

    cand_ref, cnt_ref, cntf_ref = cand
    it = pl.program_id(0)
    carry = _unrolled_loop(
        cnt_ref[0, it], lambda j, c: body(cand_ref[0, 0, j], c), carry, uw
    )
    return _unrolled_loop(cntf_ref[0, it], body, carry, uw)


def _gather_cols_blk(matT_ref, cols, idx, dtype):
    """Per-lane winner materials from the (C, S_pad) VMEM table transpose.

    Piecewise per-vreg gather (``pallas_culled.MAT_GATHER_MODE ==
    "piecewise"``, the form measured to lower under Mosaic and beat both
    the XLA pre-gather and the in-kernel select loop): within each
    128-sphere piece a lane gather on the low index bits, then a hi-bit
    select — O(S_pad/128) selects per column instead of O(S) selects.
    """
    s_pad = matT_ref.shape[1]
    b = idx.shape[1]
    hi_i, lo_i = idx // 128, idx % 128
    out = {}
    for c in cols:
        row = matT_ref[c, :]  # (s_pad,)
        acc = jnp.zeros(idx.shape, dtype)
        for kk in range(s_pad // 128):
            piece = jax.lax.broadcast_in_dim(
                row[kk * 128 : (kk + 1) * 128], (idx.shape[0], 128), (1,)
            )
            pieces = [
                jnp.take_along_axis(piece, lo_i[:, c0 : c0 + 128], axis=1)
                for c0 in range(0, b, 128)
            ]
            g_full = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
            acc = jnp.where(hi_i == kk, g_full, acc)
        out[c] = acc
    return out


class _FwdSub:
    """Forward chain per ray tile; per-lane values are full (8, B) tiles.

    Mirrors :class:`.pallas_bounce_smooth._Fwd` attribute-for-attribute so
    the adjoint phases transfer verbatim; only the sphere reductions and
    the material gather differ (scalar loops instead of blocked sweeps /
    one-hot matmuls).
    """

    def __init__(self, o, d, thr, alive, refs, params, saved=None, xi=None,
                 known=None, cand_sh=None):
        (geom_ref, mat_ref, const_ref) = refs
        (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw) = params[:6]
        self.blocked = bool(params[7]) if len(params) > 7 else False
        # Loop-unroll width for blocked sweeps (1 in interpret mode: the
        # 8-wide bodies only inflate the traced program on CPU CI).
        self.unroll = params[8] if len(params) > 8 else None
        self.tex_hw = tex_hw  # (padded TH, TW) of the atlas, or None
        dtype = o[0].dtype
        shape = o[0].shape
        self.dtype, self.shape = dtype, shape
        self.o, self.d, self.thr, self.alive = o, d, thr, alive
        self.faraway, self.sharp_e, self.sharp_s = faraway, sharp_e, sharp_s
        self.geom_ref, self.s_cheap, self.s_total = geom_ref, s_cheap, s_total
        # Culled-smooth mode (blocked only): `known` = (idx, hit) from the
        # forward-only culled nearest kernel (skips the in-kernel nearest
        # sweep, like `saved` but with the shadow product still computed);
        # `cand_sh` = (cand_ref, cnt_ref, cnt_full_ref) per-tile SHADOW
        # candidate lists — the shadow loops (and the Phase C adjoint
        # loop) iterate candidates instead of the whole cheap tier.
        # Exactness: every excluded sphere's occlusion sigmoids underflow
        # (the candidate build's margin contract), so its product factor
        # is exactly 1 and its gradient exactly 0.
        self.cand_sh = cand_sh

        saved_clear = None
        if saved is not None:
            self.idx, self.hit, saved_clear = saved
        elif known is not None:
            self.idx, self.hit = known
        else:
            far = jnp.asarray(faraway, dtype)
            tmin = jnp.full(shape, far)
            imin = jnp.zeros(shape, jnp.int32)
            dmax = jnp.full(shape, -jnp.asarray(3.0e38, dtype))
            idmax = jnp.zeros(shape, jnp.int32)
            if self.blocked:
                # fori_loop over SMEM geometry scalars: identical
                # per-sphere math + sequential tie semantics, O(1) compile.
                def near_body(k, carry, fn):
                    tmin, imin, dmax, idmax = carry
                    c = _scalar_sphere_t(geom_ref, k)
                    sol, disc, t, _, _ = fn(o, d, (c[0], c[1], c[2]), c[3], faraway)
                    take = t < tmin  # strict: lowest index wins exact ties
                    tmin = jnp.where(take, t, tmin)
                    imin = jnp.where(take, k, imin)
                    taked = disc > dmax  # strict: lowest index on disc ties
                    dmax = jnp.where(taked, disc, dmax)
                    idmax = jnp.where(taked, k, idmax)
                    return tmin, imin, dmax, idmax

                carry = (tmin, imin, dmax, idmax)
                uw = self.unroll or _blk_unroll(s_total)
                carry = _fori_unrolled(
                    0, s_cheap, functools.partial(near_body, fn=_block_sol_disc_plain), carry, uw
                )
                tmin, imin, dmax, idmax = _fori_unrolled(
                    s_cheap, s_total, functools.partial(near_body, fn=_block_sol_disc_exact), carry, uw
                )
            else:
                for k in range(s_total):
                    c = _scalar_sphere(geom_ref, k)
                    sol, disc, t, _, _ = _sphere_fn(k, s_cheap)(
                        o, d, (c[0], c[1], c[2]), c[3], faraway
                    )
                    take = t < tmin  # strict: lowest index wins exact ties
                    tmin = jnp.where(take, t, tmin)
                    imin = jnp.where(take, k, imin)
                    taked = disc > dmax  # strict: lowest index on disc ties
                    dmax = jnp.where(taked, disc, dmax)
                    idmax = jnp.where(taked, k, idmax)
            self.hit = tmin != far
            self.idx = jnp.where(self.hit, imin, idmax)

        # Per-lane material values: broadcast-select per sphere (unrolled)
        # or piecewise gathers from the VMEM table transpose (blocked).
        mcols = _MCOLS_TEX if tex_hw is not None else _MCOLS
        if self.blocked:
            mat = _gather_cols_blk(mat_ref, mcols, self.idx, dtype)
        else:
            mat = {c: jnp.full(shape, mat_ref[0, c], dtype) for c in mcols}
            for k in range(1, s_total):
                sel = self.idx == k
                for c in mcols:
                    mat[c] = jnp.where(sel, mat_ref[k, c], mat[c])
        self.mat = mat
        m = self.m
        self.c_w = (m(_CX), m(_CY), m(_CZ))
        self.r_w = m(_RAD)

        # Winner-only per-lane quadratic, tier-matched to the loop above.
        from .pallas_bounce_smooth import _compensated_b_cterm

        is_exact = (self.idx >= s_cheap).astype(dtype)
        oc = tuple(o[i] - self.c_w[i] for i in range(3))
        b_p = 2.0 * _dot3(d, oc)
        ct_p = _dot3(oc, oc) - self.r_w * self.r_w
        if s_cheap == s_total:
            self.b_w, self.ct_w = b_p, ct_p
        elif s_cheap == 0:
            self.b_w, self.ct_w = _compensated_b_cterm(o, d, self.c_w, self.r_w, dtype)
        else:
            b_e, ct_e = _compensated_b_cterm(o, d, self.c_w, self.r_w, dtype)
            self.b_w = jnp.where(is_exact > 0, b_e, b_p)
            self.ct_w = jnp.where(is_exact > 0, ct_e, ct_p)
        self.sol_w, self.disc_w, self.t_w = _quad_sol_disc(self.b_w, self.ct_w, faraway, dtype)

        self.sig_de = _sig(sharp_e * self.disc_w)
        self.sig_se = _sig(sharp_e * self.sol_w)
        self.cov_w = self.sig_de * self.sig_se
        self.coverage = self.cov_w * alive

        self.t_safe = jnp.where(self.hit, self.sol_w, jnp.ones_like(self.sol_w))
        self.p = tuple(o[i] + d[i] * self.t_safe for i in range(3))
        self.inv_r = 1.0 / self.r_w
        self.normal = tuple((self.p[i] - self.c_w[i]) * self.inv_r for i in range(3))

        def const(i):
            return const_ref[0, i]  # SMEM scalar

        self.cam = (const(0), const(1), const(2))
        self.light = (const(3), const(4), const(5))
        self.dome_c = (const(6), const(7), const(8))
        self.dome_t = const(9)

        self.lv_raw = tuple(self.light[i] - self.p[i] for i in range(3))
        self.L, self.l_mag = _norm3(self.lv_raw)
        self.vv_raw = tuple(self.cam[i] - self.p[i] for i in range(3))
        self.V, self.v_mag = _norm3(self.vv_raw)
        self.p_n = tuple(self.p[i] + self.normal[i] * NUDGE for i in range(3))

        if saved_clear is not None:
            clear = saved_clear
        elif self.blocked:
            def sh_body(k, clear, fn):
                c = _scalar_sphere_t(geom_ref, k)
                sol, disc, _, _, _ = fn(self.p_n, self.L, (c[0], c[1], c[2]), c[3], faraway)
                occl = _sig(sharp_s * disc) * _sig(sharp_s * sol)
                return clear * jnp.where(self.idx == k, jnp.ones_like(occl), 1.0 - occl)

            uw = self.unroll or _blk_unroll(s_total)
            clear = jnp.ones(shape, dtype)
            clear = _cheap_tier_loops(
                functools.partial(sh_body, fn=_block_sol_disc_plain), clear, s_cheap, uw, cand_sh
            )
            if cand_sh is None:
                clear = _fori_unrolled(
                    s_cheap, s_total, functools.partial(sh_body, fn=_block_sol_disc_exact), clear, uw
                )
            else:
                for k in range(s_cheap, s_total):  # exact tier: always swept
                    clear = sh_body(k, clear, fn=_block_sol_disc_exact)
        else:
            clear = jnp.ones(shape, dtype)
            for k in range(s_total):
                c = _scalar_sphere(geom_ref, k)
                sol, disc, _, _, _ = _sphere_fn(k, s_cheap)(
                    self.p_n, self.L, (c[0], c[1], c[2]), c[3], faraway
                )
                occl = _sig(sharp_s * disc) * _sig(sharp_s * sol)
                clear = clear * jnp.where(self.idx == k, jnp.ones_like(occl), 1.0 - occl)
        self.clear = clear

        # shading — verbatim from the lane _Fwd (provenance: ops/shading.py)
        self.n_dot_l = jnp.maximum(_dot3(self.normal, self.L), 0.0)
        cx = jnp.trunc(self.p[0] * 2.0).astype(jnp.int32) % 2
        cz = jnp.trunc(self.p[2] * 2.0).astype(jnp.int32) % 2
        self.checker = (cx == cz).astype(dtype)
        self.is_checker = m(_KIND) == 1.0
        self.tex = tuple(jnp.where(self.is_checker, self.checker, m(c)) for c in (_DCR, _DCG, _DCB))
        if tex_hw is not None:
            # Equirectangular image texture (ref shape.py:68-81): the
            # in-kernel work is ONLY the flat texel index (polynomial
            # atan2/asin over native extents); the nearest-texel color is
            # gathered OUTSIDE the kernel by XLA — exact, any atlas size,
            # and gradient-free exactly like jax.grad of the XLA sampler
            # (integer indexing has zero tangent).  The kernel zeroes the
            # in-kernel diffuse texture for image lanes and exports
            # dww = diffuse_weight * path_weight so the external gather
            # composes (and differentiates) the diffuse term.
            th_pad, tw_pad = tex_hw
            self.is_image = m(_KIND) == 2.0
            u = 0.5 + _atan2_poly(self.normal[2], self.normal[0]) / (2.0 * jnp.pi)
            v = 0.5 - _asin_poly(self.normal[1]) / jnp.pi
            u = u - jnp.floor(u)
            v = v - jnp.floor(v)
            th_l = m(_TEXH)
            tw_l = m(_TEXW)
            ti = jnp.clip((u * (tw_l - 1.0)).astype(jnp.int32), 0, (tw_l - 1.0).astype(jnp.int32))
            tj = jnp.clip((v * (th_l - 1.0)).astype(jnp.int32), 0, (th_l - 1.0).astype(jnp.int32))
            flat = m(_TID).astype(jnp.int32) * (th_pad * tw_pad) + tj * tw_pad + ti
            self.flat = jnp.where(self.is_image, flat, 0)
            self.tex = tuple(jnp.where(self.is_image, jnp.zeros_like(t), t) for t in self.tex)
        self.dw = self.n_dot_l * self.clear * m(_DG)

        self.relu_ny = jnp.maximum(self.normal[1], 0.0)
        self.dome_up = self.relu_ny * self.dome_t
        self.dome = tuple(self.dome_c[i] * self.dome_up for i in range(3))

        self.H, self.h_mag = _norm3(tuple(self.L[i] + self.V[i] for i in range(3)))
        self.nv_raw = _dot3(self.normal, self.V)
        self.nh_raw = _dot3(self.normal, self.H)
        self.vh_raw = _dot3(self.V, self.H)
        self.nl_raw = _dot3(self.normal, self.L)
        self.n_dot_v = jnp.clip(self.nv_raw, 0.0, 1.0)
        self.n_dot_h = jnp.clip(self.nh_raw, 0.0, 1.0)
        self.v_dot_h = jnp.clip(self.vh_raw, 0.0, 1.0)
        self.n_dot_l_c = jnp.clip(self.nl_raw, 0.0, 1.0)
        ior = m(_IOR)
        self.f0 = ((ior - 1.0) / (ior + 1.0)) ** 2
        self.one_m_vdh5 = (1.0 - self.v_dot_h) ** 5
        self.fresnel = self.f0 + (1.0 - self.f0) * self.one_m_vdh5
        self.alpha = m(_ROUGH) ** 2
        self.ggx_den = self.n_dot_h**2 * (self.alpha**2 - 1.0) + 1.0
        self.dist = (self.alpha**2) / (jnp.pi * (self.ggx_den**2 + SHADING_EPS))

        def g1(x):
            root = jnp.sqrt(self.alpha**2 + (1.0 - self.alpha**2) * (x**2))
            return 2.0 * x / (x + root + SHADING_EPS), root

        self.g1l, self.g1l_root = g1(self.n_dot_l_c)
        self.g1v, self.g1v_root = g1(self.n_dot_v)
        self.geom = self.g1l * self.g1v
        self.spec_den = 4.0 * self.n_dot_v + SHADING_EPS
        self.spec_base = (self.fresnel * self.dist * self.geom) / self.spec_den
        self.one_m_ndv = 1.0 - self.n_dot_v
        self.glint = self.one_m_ndv**GLINT_EXPONENT * self.n_dot_l_c
        self.spec_gate = self.n_dot_v > 0
        self.spec = jnp.where(self.spec_gate, self.spec_base + m(_SG) * self.glint, 0.0)
        self.spec_term = self.spec * m(_SG) * self.clear

        self.view_angle = jnp.clip(self.nv_raw, 0.0, 1.0)
        self.angle_factor = jnp.abs(self.view_angle - 0.5) * 2.0
        self.phase = self.angle_factor * jnp.pi * m(_TFT) * 10.0
        self.ip = jnp.sin(self.phase)
        self.hue = (m(_TFI) - 1.0) / 2.0
        self.irid_w = m(_TFW) * m(_IG)
        self.irid_base = (
            self.ip * self.hue + (1.0 - self.hue) * (1.0 - self.ip),
            self.ip * (1.0 - self.hue) + self.hue * (1.0 - self.ip),
            0.5 + 0.5 * self.ip,
        )
        self.irid = tuple(self.irid_base[i] * self.irid_w for i in range(3))

        amb = jnp.asarray(AMBIENT, dtype)
        self.color = tuple(
            amb + self.tex[i] * self.dw + self.dome[i] + self.spec_term + self.irid[i] for i in range(3)
        )

        self.w = thr * self.coverage
        if tex_hw is not None:
            self.dww = jnp.where(self.is_image, self.dw * self.w, jnp.zeros_like(self.w))
        self.refl_coeff = 0.5 * m(_SG) * self.clear
        self.thr_out = self.w * self.refl_coeff
        self.alive_out = self.coverage

        self.ddn = 2.0 * _dot3(d, self.normal)
        self.u = tuple(d[i] - self.normal[i] * self.ddn for i in range(3))
        self.refl, self.u_mag = _norm3(self.u)

        # Stochastic glossy continuation (ops/vecmath.ggx_perturb_reflect
        # term-for-term, like the hard sublane kernel): reflect about a
        # GGX-sampled microfacet half-vector.  Every intermediate is kept
        # as an attribute so the handwritten adjoint can chain through it.
        self.xi = xi
        if xi is not None:
            xi1, xi2 = xi
            self.t2q = (self.alpha**2) * xi1 / jnp.maximum(1.0 - xi1, 1e-8)
            self.cos_t = 1.0 / jnp.sqrt(1.0 + self.t2q)
            self.sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - self.cos_t**2))
            phi = (2.0 * jnp.pi) * xi2
            self.cphi = jnp.cos(phi)
            self.sphi = jnp.sin(phi)
            nrm = self.normal
            self.s_sign = jnp.where(nrm[2] >= 0, 1.0, -1.0)
            self.a_b = -1.0 / (self.s_sign + nrm[2])
            self.b_b = nrm[0] * nrm[1] * self.a_b
            self.t1v = (
                1.0 + self.s_sign * nrm[0] * nrm[0] * self.a_b,
                self.s_sign * self.b_b,
                -self.s_sign * nrm[0],
            )
            self.t2v = (self.b_b, self.s_sign + nrm[1] * nrm[1] * self.a_b, -nrm[1])
            self.sc = self.sin_t * self.cphi
            self.ss = self.sin_t * self.sphi
            hw = tuple(
                self.t1v[i] * self.sc + self.t2v[i] * self.ss + nrm[i] * self.cos_t
                for i in range(3)
            )
            self.hvec, self.hw_mag = _norm3(hw)
            self.dhn = 2.0 * _dot3(d, self.hvec)
            ur = tuple(d[i] - self.hvec[i] * self.dhn for i in range(3))
            self.r_pert, self.r_mag = _norm3(ur)
            # Below-surface samples fall back to the mirror (vecmath's
            # `above` guard); the gate is piecewise-constant, recomputed in
            # the backward pass like spec_gate.
            self.pert = _dot3(self.r_pert, nrm) > 0
            self.dout = tuple(
                jnp.where(self.pert, self.r_pert[i], self.refl[i]) for i in range(3)
            )
        else:
            self.dout = self.refl

    def m(self, col):
        return self.mat[col]


def _fwd_kernel_sub(
    o_ref, d_ref, thr_ref, alive_ref, acc_ref,
    geom_ref, mat_ref, const_ref,
    *rest,
    params,
):
    stoch = params[6]
    if stoch:
        xi_ref, *rest = rest
        xi = (xi_ref[0], xi_ref[1])
    else:
        xi = None
        rest = list(rest)
    (o_out, d_out, thr_out, alive_out, acc_out, idx_out, hit_out, clear_out, *tex_outs) = rest
    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    f = _FwdSub(
        o, d, thr_ref[:, :], alive_ref[:, :], (geom_ref, mat_ref, const_ref), params, xi=xi
    )
    for i in range(3):
        acc_out[i] = acc_ref[i] + f.color[i] * f.w
        o_out[i] = f.p_n[i]
        d_out[i] = f.dout[i]
    thr_out[:, :] = f.thr_out
    alive_out[:, :] = f.alive_out
    idx_out[:, :] = f.idx
    hit_out[:, :] = f.hit.astype(f.dtype)
    clear_out[:, :] = f.clear
    if tex_outs:
        flat_out, dww_out = tex_outs
        flat_out[:, :] = f.flat
        dww_out[:, :] = f.dww


def _adjoint_bounce(f, o, d, cots, geom_ref, ggeom_ref, gmat_ref, gconst_ref, params):
    """One bounce's handwritten adjoint (Phases A-G).

    ``cots`` = (g_o_out, g_dout, g_thr_o, g_alive_o, g_acc, g_dww_raw) —
    the cotangents of this bounce's outputs.  Returns the cotangents of
    its INPUTS ``(g_o_in, g_d_in, g_thr_in, g_alive_in)`` (g_acc passes
    through unchanged: acc is a pure accumulator).  Table/const gradients
    accumulate (+=) into the g*_ref accumulator outputs — shared verbatim
    by the per-bounce backward kernel and the depth-fused one (which
    calls this ``depth`` times in reverse, keeping the lane cotangent
    chain in registers instead of HBM).
    """
    (faraway, s_cheap, s_total, _, _, tex_hw, stoch, blocked, *_rest) = params
    (g_o_out, g_dout, g_thr_o, g_alive_o, g_acc, g_dww_raw) = cots
    dtype = f.dtype
    m = f.m

    # --- Phase A: top-level + shading adjoints (verbatim lane kernel) ---
    g_color = tuple(g_acc[i] * f.w for i in range(3))
    g_w = sum(g_acc[i] * f.color[i] for i in range(3))
    g_w = g_w + g_thr_o * f.refl_coeff
    if tex_hw is not None:
        # External diffuse-texture term: acc += texel * dww with
        # dww = where(is_image, dw * w, 0); texel is gradient-free.
        g_dww = jnp.where(f.is_image, g_dww_raw, 0.0)
        g_w = g_w + g_dww * f.dw
    g_rc = g_thr_o * f.w
    g_sg = 0.5 * f.clear * g_rc
    g_clear = 0.5 * m(_SG) * g_rc
    g_coverage = g_alive_o + g_w * f.thr
    g_thr_in = g_w * f.coverage

    # --- continuation-direction adjoint -------------------------------
    # Deterministic: dout = refl = u/|u|.  Stochastic: dout =
    # where(pert, r_pert, refl); split the cotangent by the (recomputed,
    # piecewise-constant) pert gate and chain each branch.
    g_A_pert = None
    if stoch:
        pertf = f.pert
        g_refl = tuple(jnp.where(pertf, 0.0, g_dout[i]) for i in range(3))
        g_r = tuple(jnp.where(pertf, g_dout[i], 0.0) for i in range(3))
        # r_pert = ur/|ur|, ur = d - hvec*dhn, dhn = 2 d.hvec
        rdotp = sum(f.r_pert[i] * g_r[i] for i in range(3))
        inv_rmag = 1.0 / jnp.maximum(f.r_mag, _EPS_DEN)
        g_ur = tuple((g_r[i] - f.r_pert[i] * rdotp) * inv_rmag for i in range(3))
        g_d_p = [g_ur[i] for i in range(3)]
        g_dhn = -sum(f.hvec[i] * g_ur[i] for i in range(3))
        g_h = [-f.dhn * g_ur[i] for i in range(3)]
        for i in range(3):
            g_d_p[i] = g_d_p[i] + 2.0 * f.hvec[i] * g_dhn
            g_h[i] = g_h[i] + 2.0 * d[i] * g_dhn
        # hvec = hw/|hw|, hw = t1v*sc + t2v*ss + normal*cos_t
        hdotp = sum(f.hvec[i] * g_h[i] for i in range(3))
        inv_wmag = 1.0 / jnp.maximum(f.hw_mag, _EPS_DEN)
        g_wv = tuple((g_h[i] - f.hvec[i] * hdotp) * inv_wmag for i in range(3))
        g_sc = sum(f.t1v[i] * g_wv[i] for i in range(3))
        g_ss = sum(f.t2v[i] * g_wv[i] for i in range(3))
        g_cos = sum(f.normal[i] * g_wv[i] for i in range(3))
        g_t1 = tuple(f.sc * g_wv[i] for i in range(3))
        g_t2 = tuple(f.ss * g_wv[i] for i in range(3))
        g_n_p = [f.cos_t * g_wv[i] for i in range(3)]
        # Branchless tangent frame (s piecewise-constant; a = -1/(s+nz),
        # da/dnz = a^2; b = nx*ny*a).
        sgn, ab = f.s_sign, f.a_b
        nrm = f.normal
        g_bb = sgn * g_t1[1] + g_t2[0]
        g_ab = sgn * nrm[0] * nrm[0] * g_t1[0] + nrm[1] * nrm[1] * g_t2[1] + nrm[0] * nrm[1] * g_bb
        g_n_p[0] = g_n_p[0] + 2.0 * sgn * nrm[0] * ab * g_t1[0] - sgn * g_t1[2] + nrm[1] * ab * g_bb
        g_n_p[1] = g_n_p[1] + nrm[0] * ab * g_bb + 2.0 * nrm[1] * ab * g_t2[1] - g_t2[2]
        g_n_p[2] = g_n_p[2] + ab * ab * g_ab
        # sc/ss -> sin_t; sin_t = sqrt(max(0, 1-cos^2)) (gated: at
        # roughness -> 0 the slope is infinite but the sample is the
        # mirror; zeroing matches the piecewise-constant gate treatment)
        g_sin = f.cphi * g_sc + f.sphi * g_ss
        sin_pos = f.sin_t > 1e-6
        g_cos = g_cos + jnp.where(sin_pos, -f.cos_t / jnp.maximum(f.sin_t, 1e-6), 0.0) * g_sin
        # cos_t = (1+t2q)^(-1/2); t2q = alpha^2 xi1/max(1-xi1, 1e-8)
        g_t2q = -0.5 * f.cos_t**3 * g_cos
        xi1 = f.xi[0]
        g_A_pert = 2.0 * f.alpha * xi1 / jnp.maximum(1.0 - xi1, 1e-8) * g_t2q
    else:
        g_refl = g_dout
    rdot = sum(f.refl[i] * g_refl[i] for i in range(3))
    inv_umag = 1.0 / jnp.maximum(f.u_mag, _EPS_DEN)
    g_u = tuple((g_refl[i] - f.refl[i] * rdot) * inv_umag for i in range(3))
    g_d_acc = [g_u[i] for i in range(3)]
    g_ddn = -sum(f.normal[i] * g_u[i] for i in range(3))
    g_n_acc = [-f.ddn * g_u[i] for i in range(3)]
    for i in range(3):
        g_d_acc[i] = g_d_acc[i] + 2.0 * f.normal[i] * g_ddn
        g_n_acc[i] = g_n_acc[i] + 2.0 * d[i] * g_ddn
    if stoch:
        for i in range(3):
            g_d_acc[i] = g_d_acc[i] + g_d_p[i]
            g_n_acc[i] = g_n_acc[i] + g_n_p[i]

    g_tex = tuple(g_color[i] * f.dw for i in range(3))
    g_dw = sum(g_color[i] * f.tex[i] for i in range(3))
    if tex_hw is not None:
        g_dw = g_dw + g_dww * f.w
    g_spec_term = sum(g_color)
    g_irid_w = sum(g_color[i] * f.irid_base[i] for i in range(3))
    g_ip = f.irid_w * (
        g_color[0] * (2.0 * f.hue - 1.0) + g_color[1] * (1.0 - 2.0 * f.hue) + g_color[2] * 0.5
    )
    g_hue = f.irid_w * (g_color[0] * (2.0 * f.ip - 1.0) + g_color[1] * (1.0 - 2.0 * f.ip))
    g_tfw = g_irid_w * m(_IG)
    g_ig = g_irid_w * m(_TFW)
    g_tfi = g_hue * 0.5
    g_phase = jnp.cos(f.phase) * g_ip
    g_af = jnp.pi * 10.0 * m(_TFT) * g_phase
    g_tft = f.angle_factor * jnp.pi * 10.0 * g_phase
    g_va = 2.0 * jnp.sign(f.view_angle - 0.5) * g_af
    gate_nv = ((f.nv_raw > 0) & (f.nv_raw < 1)).astype(dtype)
    g_nv_raw = g_va * gate_nv
    g_spec = g_spec_term * m(_SG) * f.clear
    g_sg = g_sg + g_spec_term * f.spec * f.clear
    g_clear = g_clear + g_spec_term * f.spec * m(_SG)
    g_spec = jnp.where(f.spec_gate, g_spec, 0.0)
    g_spec_base = g_spec
    g_sg = g_sg + g_spec * f.glint
    g_glint = g_spec * m(_SG)
    g_one_m_ndv = g_glint * GLINT_EXPONENT * f.one_m_ndv ** (GLINT_EXPONENT - 1.0) * f.n_dot_l_c
    g_ndv = -g_one_m_ndv
    g_nlc = g_glint * f.one_m_ndv**GLINT_EXPONENT
    inv_sden = 1.0 / f.spec_den
    g_fres = g_spec_base * f.dist * f.geom * inv_sden
    g_dist = g_spec_base * f.fresnel * f.geom * inv_sden
    g_geom = g_spec_base * f.fresnel * f.dist * inv_sden
    g_sden = -g_spec_base * f.spec_base * inv_sden
    g_ndv = g_ndv + 4.0 * g_sden
    A = f.alpha
    g_g1l = g_geom * f.g1v
    g_g1v = g_geom * f.g1l
    g_A = jnp.zeros_like(A) if g_A_pert is None else g_A_pert

    def g1_adj(x, R, g1, g_g1):
        Rs = jnp.maximum(R, _EPS_DEN)
        den = x + R + SHADING_EPS
        Rp = (1.0 - A**2) * x / Rs
        gx = g_g1 * 2.0 * (R + SHADING_EPS - x * Rp) / (den * den)
        dRdA = A * (1.0 - x * x) / Rs
        gA = g_g1 * (-2.0 * x / (den * den)) * dRdA
        return gx, gA

    gx_l, gA_l = g1_adj(f.n_dot_l_c, f.g1l_root, f.g1l, g_g1l)
    gx_v, gA_v = g1_adj(f.n_dot_v, f.g1v_root, f.g1v, g_g1v)
    g_nlc = g_nlc + gx_l
    g_ndv = g_ndv + gx_v
    g_A = g_A + gA_l + gA_v
    Dq = f.ggx_den
    denD = jnp.pi * (Dq * Dq + SHADING_EPS)
    g_A = g_A + g_dist * 2.0 * A / denD
    g_Dq = g_dist * (-(A * A) * 2.0 * Dq * jnp.pi) / (denD * denD)
    g_ndh = g_Dq * 2.0 * f.n_dot_h * (A * A - 1.0)
    g_A = g_A + g_Dq * f.n_dot_h**2 * 2.0 * A
    g_f0 = g_fres * (1.0 - f.one_m_vdh5)
    g_vdh = -g_fres * (1.0 - f.f0) * 5.0 * (1.0 - f.v_dot_h) ** 4
    ior = m(_IOR)
    ratio = (ior - 1.0) / (ior + 1.0)
    g_ior = g_f0 * 2.0 * ratio * (2.0 / ((ior + 1.0) ** 2))
    g_rough = 2.0 * m(_ROUGH) * g_A
    g_ndv_raw = (g_ndv) * gate_nv + g_nv_raw
    g_ndh_raw = g_ndh * ((f.nh_raw > 0) & (f.nh_raw < 1)).astype(dtype)
    g_vdh_raw = g_vdh * ((f.vh_raw > 0) & (f.vh_raw < 1)).astype(dtype)
    g_nlc_raw = g_nlc * ((f.nl_raw > 0) & (f.nl_raw < 1)).astype(dtype)
    g_dome_c = tuple(g_color[i] * f.dome_up for i in range(3))
    g_dome_up = sum(g_color[i] * f.dome_c[i] for i in range(3))
    g_relu_ny = g_dome_up * f.dome_t
    g_dome_t = g_dome_up * f.relu_ny
    g_n_acc[1] = g_n_acc[1] + g_relu_ny * (f.normal[1] > 0).astype(dtype)
    g_ndl = g_dw * f.clear * m(_DG)
    g_clear = g_clear + g_dw * f.n_dot_l * m(_DG)
    g_dg = g_dw * f.n_dot_l * f.clear
    g_nl_relu = g_ndl * (f.nl_raw > 0).astype(dtype)
    # Const-color branch only: checker is piecewise-constant; image lanes'
    # tex is zeroed in-kernel (the external gather owns their diffuse).
    is_const = ~f.is_checker if tex_hw is None else (~f.is_checker & ~f.is_image)
    g_dcc = tuple(g_tex[i] * is_const.astype(dtype) for i in range(3))
    g_cov_w = g_coverage * f.alive
    g_alive_in = g_coverage * f.cov_w
    g_disc_w = g_cov_w * f.sig_se * f.sig_de * (1.0 - f.sig_de) * f.sharp_e
    g_sol_w = g_cov_w * f.sig_de * f.sig_se * (1.0 - f.sig_se) * f.sharp_e

    g_L_acc = [f.normal[i] * (g_nlc_raw + g_nl_relu) for i in range(3)]
    g_V_acc = [f.normal[i] * g_ndv_raw + f.H[i] * g_vdh_raw for i in range(3)]
    g_H_acc = [f.normal[i] * g_ndh_raw + f.V[i] * g_vdh_raw for i in range(3)]
    for i in range(3):
        g_n_acc[i] = (
            g_n_acc[i]
            + f.V[i] * g_ndv_raw
            + f.H[i] * g_ndh_raw
            + f.L[i] * (g_nlc_raw + g_nl_relu)
        )
    # --- Phase B: H = (L + V)/|L + V| ----------------------------------
    hdot = sum(f.H[i] * g_H_acc[i] for i in range(3))
    inv_hmag = 1.0 / jnp.maximum(f.h_mag, _EPS_DEN)
    for i in range(3):
        g_lv = (g_H_acc[i] - f.H[i] * hdot) * inv_hmag
        g_L_acc[i] = g_L_acc[i] + g_lv
        g_V_acc[i] = g_V_acc[i] + g_lv

    # --- Phase C: shadow-product adjoint (scalar sphere loop) ----------
    g_pn_s = [jnp.zeros_like(g_clear) for _ in range(3)]
    if blocked:
        # fori_loop twin of the unrolled loop below: lane-side adjoints
        # ride the carry; sphere-side gradients reduce the tile to a
        # (1, 4) row accumulated into the VMEM table at dynamic index k.
        #
        # The row reductions are TWO-STAGE and batched per unroll group
        # (r5, the culled-smooth attribution's named lever): each
        # candidate's core emits only cheap SUBLANE partials ((4, B) — a
        # 3-add tree over 8 rows); the expensive cross-LANE tree then
        # runs ONCE per group over the stacked (4*U, B) partials instead
        # of 4 times per candidate (~6x less Phase C reduction work at
        # unroll 8; summation tree order changes, values to float
        # roundoff).
        def c_core(k, carry, fn):
            p0, p1, p2, l0, l1, l2 = carry
            c = _scalar_sphere_t(geom_ref, k)
            sol, disc, _, b, ct = fn(f.p_n, f.L, (c[0], c[1], c[2]), c[3], faraway)
            sd = _sig(f.sharp_s * disc)
            ss = _sig(f.sharp_s * sol)
            occl = sd * ss
            is_self = f.idx == k
            fac = jnp.where(is_self, jnp.ones_like(occl), 1.0 - occl)
            g_fac = g_clear * f.clear / jnp.maximum(fac, _EPS_DEN)
            g_occl = jnp.where(is_self, 0.0, -g_fac)
            g_disc_j = g_occl * ss * sd * (1.0 - sd) * f.sharp_s
            g_sol_j = g_occl * sd * ss * (1.0 - ss) * f.sharp_s
            g_b, g_ct = _sol_disc_adjoint(b, ct, g_sol_j, g_disc_j)
            oc = tuple(f.p_n[i] - c[i] for i in range(3))
            p0 = p0 + 2.0 * f.L[0] * g_b + 2.0 * oc[0] * g_ct
            p1 = p1 + 2.0 * f.L[1] * g_b + 2.0 * oc[1] * g_ct
            p2 = p2 + 2.0 * f.L[2] * g_b + 2.0 * oc[2] * g_ct
            l0 = l0 + 2.0 * oc[0] * g_b
            l1 = l1 + 2.0 * oc[1] * g_b
            l2 = l2 + 2.0 * oc[2] * g_b
            comps = [-2.0 * f.L[i] * g_b - 2.0 * oc[i] * g_ct for i in range(3)]
            comps.append(-2.0 * c[3] * g_ct)
            if _PHASEC_BATCHED:
                # Stage 1 only: cheap sublane partials; the cross-lane
                # tree runs once per flush group.
                parts = jnp.concatenate(
                    [jnp.sum(x, axis=0, keepdims=True) for x in comps], axis=0
                )  # (4, B)
            else:
                # Hardware-proven r4 form: finished (1, 4) row per
                # candidate (full (0,1)-reduces, concat of offset-(0,0)
                # scalars).
                parts = jnp.concatenate(
                    [jnp.sum(x, axis=(0, 1), keepdims=True) for x in comps], axis=1
                )  # (1, 4)
            return (p0, p1, p2, l0, l1, l2), parts

        def c_flush(ks, parts_list):
            if not _PHASEC_BATCHED:
                for k, row in zip(ks, parts_list):
                    ggeom_ref[pl.ds(k, 1), :] += row
                return
            # ONE cross-lane pass for the whole group's rows.
            scal = jnp.sum(jnp.concatenate(parts_list, axis=0), axis=1, keepdims=True)
            # Extract each candidate's (1, 4) row WITHOUT sublane-offset
            # slicing (Mosaic: "offset mismatch on non-concat dimension"):
            # broadcast the (4F, 1) column along lanes, mask the diagonal
            # of this candidate's 4-row band, sublane-reduce to offset 0.
            nf = scal.shape[0]
            sb = jax.lax.broadcast_in_dim(scal, (nf, 4), (0, 1))
            sub_i = jax.lax.broadcasted_iota(jnp.int32, (nf, 4), 0)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (nf, 4), 1)
            for u, k in enumerate(ks):
                mask = sub_i == (4 * u + lane_i)
                row = jnp.sum(jnp.where(mask, sb, 0.0), axis=0, keepdims=True)  # (1, 4)
                ggeom_ref[pl.ds(k, 1), :] += row

        def c_grouped(cnt, get_k, carry, fn, uw):
            """Loop `cnt` candidates (dynamic bound) in batched groups;
            rows flush every _PHASEC_FLUSH candidates."""
            groups = cnt // uw

            def gbody(g, c):
                j0 = g * uw
                ks, parts = [], []
                for u in range(uw):
                    k = get_k(j0 + u)
                    c, pr = c_core(k, c, fn)
                    ks.append(k)
                    parts.append(pr)
                    if len(ks) == _PHASEC_FLUSH:
                        c_flush(ks, parts)
                        ks, parts = [], []
                if ks:
                    c_flush(ks, parts)
                return c

            carry = jax.lax.fori_loop(0, groups, gbody, carry)

            def tbody(j, c):
                k = get_k(j)
                c, pr = c_core(k, c, fn)
                c_flush([k], [pr])
                return c

            return jax.lax.fori_loop(groups * uw, cnt, tbody, carry)

        zero = jnp.zeros_like(g_clear)
        carry = (zero, zero, zero, zero, zero, zero)
        uw = (_rest[0] if _rest else None) or _blk_unroll(s_total)
        cand_sh = getattr(f, "cand_sh", None)
        if cand_sh is None:
            carry = c_grouped(s_cheap, lambda j: j, carry, _block_sol_disc_plain, uw)
            out = c_grouped(
                s_total - s_cheap, lambda j: s_cheap + j, carry, _block_sol_disc_exact, uw
            )
        else:
            cand_ref, cnt_ref, cntf_ref = cand_sh
            it = pl.program_id(0)
            carry = c_grouped(
                cnt_ref[0, it], lambda j: cand_ref[0, 0, j], carry, _block_sol_disc_plain, uw
            )
            carry = c_grouped(cntf_ref[0, it], lambda j: j, carry, _block_sol_disc_plain, uw)
            out = carry
            for k in range(s_cheap, s_total):  # exact tier: always swept
                out, pr = c_core(k, out, _block_sol_disc_exact)
                c_flush([k], [pr])
        g_pn_s = [out[0], out[1], out[2]]
        for i in range(3):
            g_L_acc[i] = g_L_acc[i] + out[3 + i]
    else:
        for k in range(s_total):
            c = _scalar_sphere(geom_ref, k)
            sol, disc, _, b, ct = _sphere_fn(k, s_cheap)(
                f.p_n, f.L, (c[0], c[1], c[2]), c[3], faraway
            )
            sd = _sig(f.sharp_s * disc)
            ss = _sig(f.sharp_s * sol)
            occl = sd * ss
            is_self = f.idx == k
            fac = jnp.where(is_self, jnp.ones_like(occl), 1.0 - occl)
            g_fac = g_clear * f.clear / jnp.maximum(fac, _EPS_DEN)
            g_occl = jnp.where(is_self, 0.0, -g_fac)
            g_disc_j = g_occl * ss * sd * (1.0 - sd) * f.sharp_s
            g_sol_j = g_occl * sd * ss * (1.0 - ss) * f.sharp_s
            g_b, g_ct = _sol_disc_adjoint(b, ct, g_sol_j, g_disc_j)
            oc = tuple(f.p_n[i] - c[i] for i in range(3))
            for i in range(3):
                g_pn_s[i] = g_pn_s[i] + 2.0 * f.L[i] * g_b + 2.0 * oc[i] * g_ct
                g_L_acc[i] = g_L_acc[i] + 2.0 * oc[i] * g_b
                ggeom_ref[k, i] = ggeom_ref[k, i] + jnp.sum(-2.0 * f.L[i] * g_b - 2.0 * oc[i] * g_ct)
            ggeom_ref[k, 3] = ggeom_ref[k, 3] + jnp.sum(-2.0 * c[3] * g_ct)

    # --- Phase D: p_n, L, V unit-vector transposes ---------------------
    g_pn = [g_o_out[i] + g_pn_s[i] for i in range(3)]
    g_p = [g_pn[i] for i in range(3)]
    for i in range(3):
        g_n_acc[i] = g_n_acc[i] + NUDGE * g_pn[i]
    ldot = sum(f.L[i] * g_L_acc[i] for i in range(3))
    inv_lmag = 1.0 / jnp.maximum(f.l_mag, _EPS_DEN)
    g_light = []
    for i in range(3):
        g_lv = (g_L_acc[i] - f.L[i] * ldot) * inv_lmag
        g_light.append(g_lv)
        g_p[i] = g_p[i] - g_lv
    vdot = sum(f.V[i] * g_V_acc[i] for i in range(3))
    inv_vmag = 1.0 / jnp.maximum(f.v_mag, _EPS_DEN)
    g_cam = []
    for i in range(3):
        g_vv = (g_V_acc[i] - f.V[i] * vdot) * inv_vmag
        g_cam.append(g_vv)
        g_p[i] = g_p[i] - g_vv

    # --- Phase E: normal, p, winner quadratic --------------------------
    g_cw = [jnp.zeros_like(g_clear) for _ in range(3)]
    g_rw = -sum(f.normal[i] * g_n_acc[i] for i in range(3)) * f.inv_r
    for i in range(3):
        g_p[i] = g_p[i] + g_n_acc[i] * f.inv_r
        g_cw[i] = g_cw[i] - g_n_acc[i] * f.inv_r
    g_o_in = [g_p[i] for i in range(3)]
    g_t = sum(d[i] * g_p[i] for i in range(3))
    for i in range(3):
        g_d_acc[i] = g_d_acc[i] + g_p[i] * f.t_safe
    g_sol_w = g_sol_w + jnp.where(f.hit, g_t, 0.0)
    g_bw, g_ctw = _sol_disc_adjoint(f.b_w, f.ct_w, g_sol_w, g_disc_w)
    oc_w = tuple(o[i] - f.c_w[i] for i in range(3))
    for i in range(3):
        g_o_in[i] = g_o_in[i] + 2.0 * d[i] * g_bw + 2.0 * oc_w[i] * g_ctw
        g_d_acc[i] = g_d_acc[i] + 2.0 * oc_w[i] * g_bw
        g_cw[i] = g_cw[i] - 2.0 * d[i] * g_bw - 2.0 * oc_w[i] * g_ctw
    g_rw = g_rw - 2.0 * f.r_w * g_ctw

    # --- Phase F: scatter per-lane material grads into the table -------
    rows = {
        _CX: g_cw[0], _CY: g_cw[1], _CZ: g_cw[2],
        _RAD: g_rw,
        _DG: g_dg,
        _DCR: g_dcc[0], _DCG: g_dcc[1], _DCB: g_dcc[2],
        _SG: g_sg,
        _ROUGH: g_rough,
        _IG: g_ig,
        _IOR: g_ior,
        _TFW: g_tfw,
        _TFT: g_tft,
        _TFI: g_tfi,
    }
    if blocked:
        # One-hot MXU matmul per sublane row into the (C, S_pad) gradient
        # of the table transpose — the lane kernel's Phase F, applied per
        # sublane (the (8, B) tile can't reshape to one (1, 8B) row).
        zero_row = jnp.zeros_like(g_clear)
        cols_all = [zero_row] * _COLS
        for col, val in rows.items():
            cols_all[col] = val
        s_pad = gmat_ref.shape[1]
        for r in range(_SUBLANES):
            rows_r = jnp.concatenate([v[r : r + 1, :] for v in cols_all], axis=0)  # (C, B)
            onehot_r = (
                jax.lax.broadcasted_iota(jnp.int32, (s_pad, rows_r.shape[1]), 0)
                == f.idx[r : r + 1, :]
            ).astype(dtype)  # (S_pad, B)
            gmat_ref[:, :] += jax.lax.dot_general(
                rows_r, onehot_r,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # exact one-hot product
            )  # (C, S_pad)
    else:
        for k in range(s_total):
            sel = (f.idx == k).astype(dtype)
            for col, val in rows.items():
                gmat_ref[k, col] = gmat_ref[k, col] + jnp.sum(sel * val)

    # --- Phase G: consts grads -----------------------------------------
    const_vals = (
        g_cam[0], g_cam[1], g_cam[2],
        g_light[0], g_light[1], g_light[2],
        g_dome_c[0], g_dome_c[1], g_dome_c[2],
        g_dome_t,
    )
    for i, v in enumerate(const_vals):
        gconst_ref[0, i] = gconst_ref[0, i] + jnp.sum(v)

    return tuple(g_o_in), tuple(g_d_acc), g_thr_in, g_alive_in


def _zero_table_grads(ggeom_ref, gmat_ref, gconst_ref, blocked, s_total):
    """Zero the gradient accumulators (once, on the first grid step).

    Unrolled mode: SMEM scalars; blocked mode: VMEM arrays.
    """
    if blocked:
        ggeom_ref[:, :] = jnp.zeros_like(ggeom_ref)
        gmat_ref[:, :] = jnp.zeros_like(gmat_ref)
    else:
        for kk in range(s_total):
            for cc in range(4):
                ggeom_ref[kk, cc] = 0.0
            for cc in range(_COLS):
                gmat_ref[kk, cc] = 0.0
    for cc in range(_NCONST):
        gconst_ref[0, cc] = 0.0


def _bwd_kernel_sub(
    # saved inputs + output cotangents (g_dww present only for atlas runs)
    *refs,
    params,
):
    (faraway, s_cheap, s_total, _, _, tex_hw, stoch, blocked, *_rest) = params
    (
        o_ref, d_ref, thr_ref, alive_ref, idx_ref, hit_ref, clear_ref,
        geom_ref, mat_ref, const_ref,
    ) = refs[:10]
    rest = refs[10:]
    if stoch:
        xi_ref, *rest = rest
        xi = (xi_ref[0], xi_ref[1])
    else:
        xi = None
    (go_ref, gd_ref, gthr_ref, galive_ref, gacc_ref) = rest[:5]
    rest = rest[5:]
    gdww_raw = None
    if tex_hw is not None:
        gdww_raw = rest[0][:, :]
        rest = rest[1:]
    (
        go_in_ref, gd_in_ref, gthr_in_ref, galive_in_ref,
        ggeom_ref, gmat_ref, gconst_ref,
    ) = rest
    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    saved = (idx_ref[:, :], hit_ref[:, :] != 0, clear_ref[:, :])
    f = _FwdSub(
        o, d, thr_ref[:, :], alive_ref[:, :], (geom_ref, mat_ref, const_ref), params,
        saved=saved, xi=xi,
    )
    step = pl.program_id(0)

    # Table gradient accumulators persist across grid steps; zero on the
    # first step.
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

    # --- per-lane outputs ----------------------------------------------
    for i in range(3):
        go_in_ref[i] = g_o_in[i]
        gd_in_ref[i] = g_d_in[i]
    gthr_in_ref[:, :] = g_thr_in
    galive_in_ref[:, :] = g_alive_in


# ---------------------------------------------------------------------------
# custom_vjp wrapper + scan-based trace (mirrors the lane module; tables
# built outside with plain jnp so JAX transposes them onto scene arrays).
# ---------------------------------------------------------------------------


def _specs_sub(block_rays):
    b_cols = block_rays // _SUBLANES
    lane = pl.BlockSpec((_SUBLANES, b_cols), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((3, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return lane, vec, smem


def _smem_acc_spec(shape):
    """Whole-array SMEM output revisited (accumulated) by every grid step."""
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)


def _vmem_acc_spec(shape):
    """Whole-array VMEM output revisited (accumulated) by every grid step."""
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)


def _sds(shape, dtype, vma):
    if vma is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))


def _fwd_call_sub(params, o3, d3, thr, alive, acc, geom, mat, consts, xi3=None):
    (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked, block_rays, interpret, vma) = params
    m_cols = d3.shape[2]
    lane, vec, smem = _specs_sub(block_rays)
    # Blocked mode: mat is the (C, S_pad) table transpose in VMEM (lane
    # gathers need vector memory); unrolled mode reads (S, C) SMEM scalars.
    # The geometry table goes in TRANSPOSED, (4, S): see _scalar_sphere_t.
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM) if blocked else smem
    if blocked:
        geom = geom.T
    kernel = functools.partial(
        _fwd_kernel_sub, params=(faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked,
                1 if interpret else _blk_unroll(s_total))
    )
    dtype = d3.dtype
    b_cols = block_rays // _SUBLANES
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
        grid=(m_cols // (block_rays // _SUBLANES),),
        in_specs=[vec, vec, lane, lane, vec, smem, mat_spec, smem] + xi_spec,
        out_specs=(vec, vec, lane, lane, vec, lane, lane, lane) + tex_specs,
        out_shape=(
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((_SUBLANES, m_cols), jnp.int32, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
            _sds((_SUBLANES, m_cols), dtype, vma),
        )
        + tex_shapes,
        interpret=interpret,
    )(o3, d3, thr, alive, acc, geom, mat, consts, *xi_in)


def _bwd_call_sub(params, o3, d3, thr, alive, idx, hit, clear, geom, mat, consts, g_o, g_d, g_thr, g_alive, g_acc, g_dww=None, xi3=None):
    (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked, block_rays, interpret, vma) = params
    m_cols = d3.shape[2]
    lane, vec, smem = _specs_sub(block_rays)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM) if blocked else smem
    # Blocked mode accumulates the geometry/material-table gradients in
    # VMEM (dynamic row writes + one-hot matmuls); unrolled uses SMEM.
    # The gradient keeps the (S, 4) shape (row writes at dynamic index);
    # only the INPUT table transposes to (4, S) for SMEM row economy.
    geom_acc = _vmem_acc_spec(geom.shape) if blocked else _smem_acc_spec(geom.shape)
    mat_acc = _vmem_acc_spec(mat.shape) if blocked else _smem_acc_spec(mat.shape)
    geom_in = geom.T if blocked else geom
    kernel = functools.partial(
        _bwd_kernel_sub, params=(faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked,
                1 if interpret else _blk_unroll(s_total))
    )
    dtype = d3.dtype
    b_cols = block_rays // _SUBLANES
    xi_spec = (
        [pl.BlockSpec((2, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)]
        if stoch
        else []
    )
    xi_in = (xi3,) if stoch else ()
    tex_in = (g_dww,) if tex_hw is not None else ()
    return pl.pallas_call(
        kernel,
        grid=(m_cols // (block_rays // _SUBLANES),),
        in_specs=[
            vec, vec, lane, lane, lane, lane, lane,  # saved (+idx, hit, clear)
            smem, mat_spec, smem,  # tables
        ]
        + xi_spec
        + [
            vec, vec, lane, lane, vec,  # cotangents
        ]
        + ([lane] if tex_hw is not None else []),
        out_specs=(
            vec, vec, lane, lane,
            geom_acc,
            mat_acc,
            _smem_acc_spec(consts.shape),
        ),
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
    )(o3, d3, thr, alive, idx, hit, clear, geom_in, mat, consts, *xi_in, g_o, g_d, g_thr, g_alive, g_acc, *tex_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bounce_sub(params, o3, d3, thr, alive, acc, geom, mat, consts):
    outs = _fwd_call_sub(params, o3, d3, thr, alive, acc, geom, mat, consts)
    tex_hw = params[5]
    # With an atlas: also return (flat texel ids, dww) so the caller can
    # gather the texel colors and add the image-diffuse term outside.
    return outs[:5] + (outs[8:] if tex_hw is not None else ())


def _bounce_sub_vjp_fwd(params, o3, d3, thr, alive, acc, geom, mat, consts):
    outs = _fwd_call_sub(params, o3, d3, thr, alive, acc, geom, mat, consts)
    idx, hit, clear = outs[5], outs[6], outs[7]
    primal = outs[:5] + (outs[8:] if params[5] is not None else ())
    return primal, (o3, d3, thr, alive, idx, hit, clear, geom, mat, consts)


def _bounce_sub_vjp_bwd(params, res, cots):
    (o3, d3, thr, alive, idx, hit, clear, geom, mat, consts) = res
    if params[5] is not None:
        (g_o, g_d, g_thr, g_alive, g_acc, _g_flat, g_dww) = cots  # flat is int: float0
        g_dww = jnp.asarray(g_dww, d3.dtype)
    else:
        (g_o, g_d, g_thr, g_alive, g_acc) = cots
        g_dww = None
    (go_in, gd_in, gthr_in, galive_in, ggeom, gmat, gconsts) = _bwd_call_sub(
        params, o3, d3, thr, alive, idx, hit, clear, geom, mat, consts,
        g_o, g_d, g_thr, g_alive, g_acc, g_dww,
    )
    # acc is a pure passthrough accumulator: g_acc_in = g_acc_out.
    return (go_in, gd_in, gthr_in, galive_in, g_acc, ggeom, gmat, gconsts)


_bounce_sub.defvjp(_bounce_sub_vjp_fwd, _bounce_sub_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bounce_sub_stoch(params, o3, d3, thr, alive, acc, xi3, geom, mat, consts):
    """Stochastic-roughness bounce: xi (2, 8, M) uniforms drive the GGX
    microfacet perturbation of the mirror continuation; its adjoint chains
    through the perturbation (xi itself is a constant sample)."""
    outs = _fwd_call_sub(params, o3, d3, thr, alive, acc, geom, mat, consts, xi3=xi3)
    tex_hw = params[5]
    return outs[:5] + (outs[8:] if tex_hw is not None else ())


def _bounce_sub_stoch_vjp_fwd(params, o3, d3, thr, alive, acc, xi3, geom, mat, consts):
    outs = _fwd_call_sub(params, o3, d3, thr, alive, acc, geom, mat, consts, xi3=xi3)
    idx, hit, clear = outs[5], outs[6], outs[7]
    primal = outs[:5] + (outs[8:] if params[5] is not None else ())
    return primal, (o3, d3, thr, alive, idx, hit, clear, xi3, geom, mat, consts)


def _bounce_sub_stoch_vjp_bwd(params, res, cots):
    (o3, d3, thr, alive, idx, hit, clear, xi3, geom, mat, consts) = res
    if params[5] is not None:
        (g_o, g_d, g_thr, g_alive, g_acc, _g_flat, g_dww) = cots
        g_dww = jnp.asarray(g_dww, d3.dtype)
    else:
        (g_o, g_d, g_thr, g_alive, g_acc) = cots
        g_dww = None
    (go_in, gd_in, gthr_in, galive_in, ggeom, gmat, gconsts) = _bwd_call_sub(
        params, o3, d3, thr, alive, idx, hit, clear, geom, mat, consts,
        g_o, g_d, g_thr, g_alive, g_acc, g_dww, xi3=xi3,
    )
    # xi is a (gradient-free) random sample: zero cotangent.
    return (go_in, gd_in, gthr_in, galive_in, g_acc, jnp.zeros_like(xi3), ggeom, gmat, gconsts)


_bounce_sub_stoch.defvjp(_bounce_sub_stoch_vjp_fwd, _bounce_sub_stoch_vjp_bwd)


# ---------------------------------------------------------------------------
# Depth-fused kernels: ONE forward launch runs ALL bounces with the ray
# state resident in VMEM (per-depth residuals written to stacked rank-3
# outputs), ONE backward launch runs the adjoint chain in reverse with the
# lane cotangents in registers.  Removes the per-bounce HBM round trips of
# the scan formulation (state in/out per bounce boundary) and 2(depth-1)
# kernel launches per training step.  The scan path below remains for
# depth 1, depth > MAX_FUSE_DEPTH, and A/B measurement.
# ---------------------------------------------------------------------------

# Depth is Python-unrolled inside the kernels (static, small); past this
# the compile-size tradeoff is unmeasured and the scan path takes over.
MAX_FUSE_DEPTH = 6

# Table-size ceiling for the DEPTH-FUSED launches: the whole-chain bwd
# kernel's scoped-VMEM stack grows with the (4, S)+(C, S) tables times
# the unrolled depth, overrunning the 16 MB limit by 676 KB at 4096
# spheres (hardware probe 2026-08-20, unroll-width-independent).  Bigger
# tables keep the per-bounce scan formulation, which r3 verified to
# MAX_BLK_SPHERES_SMOOTH (24 s / 55 s cold at 2048/4096).
MAX_DEEP_SPHERES = 2048


def _fwd_kernel_sub_deep(*refs, params, depth):
    (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked, *_rest) = params
    (o_ref, d_ref, geom_ref, mat_ref, const_ref, *rest) = refs
    if stoch:
        xi_ref, *rest = rest  # (2*depth, 8, B)
    (
        acc_out, osave_out, dsave_out, thrsave_out, alivesave_out,
        idx_out, hit_out, clear_out, *tex_outs,
    ) = rest
    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    dtype = o[0].dtype
    shape = o[0].shape
    thr = jnp.ones(shape, dtype)
    alive = jnp.ones(shape, dtype)
    acc = [jnp.zeros(shape, dtype) for _ in range(3)]
    for dep in range(depth):
        if dep > 0:
            # Residuals: the state ENTERING bounce `dep` (bounce 0's state
            # is the kernel's own input, already in HBM).
            for i in range(3):
                osave_out[(dep - 1) * 3 + i] = o[i]
                dsave_out[(dep - 1) * 3 + i] = d[i]
            thrsave_out[dep - 1] = thr
            alivesave_out[dep - 1] = alive
        xi = (xi_ref[2 * dep], xi_ref[2 * dep + 1]) if stoch else None
        f = _FwdSub(o, d, thr, alive, (geom_ref, mat_ref, const_ref), params, xi=xi)
        for i in range(3):
            acc[i] = acc[i] + f.color[i] * f.w
        idx_out[dep] = f.idx
        hit_out[dep] = f.hit.astype(dtype)
        clear_out[dep] = f.clear
        if tex_outs:
            flat_out, dww_out = tex_outs
            flat_out[dep] = f.flat
            dww_out[dep] = f.dww
        o, d, thr, alive = f.p_n, f.dout, f.thr_out, f.alive_out
    for i in range(3):
        acc_out[i] = acc[i]


def _bwd_kernel_sub_deep(*refs, params, depth):
    (faraway, s_cheap, s_total, _, _, tex_hw, stoch, blocked, *_rest) = params
    (
        o_ref, d_ref, osave_ref, dsave_ref, thrsave_ref, alivesave_ref,
        idx_ref, hit_ref, clear_ref, geom_ref, mat_ref, const_ref, *rest,
    ) = refs
    if stoch:
        xi_ref, *rest = rest
    gacc_ref, *rest = rest
    gdww_ref = None
    if tex_hw is not None:
        gdww_ref, *rest = rest
    (go_in_ref, gd_in_ref, ggeom_ref, gmat_ref, gconst_ref) = rest
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        _zero_table_grads(ggeom_ref, gmat_ref, gconst_ref, blocked, s_total)

    g_acc = (gacc_ref[0], gacc_ref[1], gacc_ref[2])
    dtype = gacc_ref[0].dtype
    shape = gacc_ref[0].shape
    zero = jnp.zeros(shape, dtype)
    # The trace discards the final bounce's (o, d, thr, alive) outputs:
    # their cotangents start at zero; g_acc is constant across bounces
    # (acc is a pure accumulator).
    g_o = (zero, zero, zero)
    g_d = (zero, zero, zero)
    g_thr = zero
    g_alive = zero
    for dep in reversed(range(depth)):
        if dep == 0:
            o = (o_ref[0], o_ref[1], o_ref[2])
            d = (d_ref[0], d_ref[1], d_ref[2])
            thr = jnp.ones(shape, dtype)
            alive = jnp.ones(shape, dtype)
        else:
            o = tuple(osave_ref[(dep - 1) * 3 + i] for i in range(3))
            d = tuple(dsave_ref[(dep - 1) * 3 + i] for i in range(3))
            thr = thrsave_ref[dep - 1]
            alive = alivesave_ref[dep - 1]
        saved = (idx_ref[dep], hit_ref[dep] != 0, clear_ref[dep])
        xi = (xi_ref[2 * dep], xi_ref[2 * dep + 1]) if stoch else None
        f = _FwdSub(
            o, d, thr, alive, (geom_ref, mat_ref, const_ref), params,
            saved=saved, xi=xi,
        )
        cots = (g_o, g_d, g_thr, g_alive, g_acc, gdww_ref[dep] if gdww_ref is not None else None)
        g_o, g_d, g_thr, g_alive = _adjoint_bounce(
            f, o, d, cots, geom_ref, ggeom_ref, gmat_ref, gconst_ref, params
        )
    for i in range(3):
        go_in_ref[i] = g_o[i]
        gd_in_ref[i] = g_d[i]


def _fwd_call_sub_deep(params, o3, d3, geom, mat, consts, xi_all=None):
    (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked, block_rays, interpret, vma, depth) = params
    m_cols = d3.shape[2]
    lane, vec, smem = _specs_sub(block_rays)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM) if blocked else smem
    if blocked:
        geom = geom.T
    kernel = functools.partial(
        _fwd_kernel_sub_deep,
        params=(faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked,
                1 if interpret else _blk_unroll(s_total)),
        depth=depth,
    )
    dtype = d3.dtype
    b_cols = block_rays // _SUBLANES

    def stk(rows):  # stacked per-depth rank-3 block over the ray grid
        return pl.BlockSpec((rows, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    xi_spec = [stk(2 * depth)] if stoch else []
    xi_in = (xi_all,) if stoch else ()
    tex_specs = (stk(depth), stk(depth)) if tex_hw is not None else ()
    tex_shapes = (
        (_sds((depth, _SUBLANES, m_cols), jnp.int32, vma), _sds((depth, _SUBLANES, m_cols), dtype, vma))
        if tex_hw is not None
        else ()
    )
    ds = depth - 1
    return pl.pallas_call(
        kernel,
        grid=(m_cols // b_cols,),
        in_specs=[vec, vec, smem, mat_spec, smem] + xi_spec,
        out_specs=(vec, stk(3 * ds), stk(3 * ds), stk(ds), stk(ds), stk(depth), stk(depth), stk(depth)) + tex_specs,
        out_shape=(
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((3 * ds, _SUBLANES, m_cols), dtype, vma),
            _sds((3 * ds, _SUBLANES, m_cols), dtype, vma),
            _sds((ds, _SUBLANES, m_cols), dtype, vma),
            _sds((ds, _SUBLANES, m_cols), dtype, vma),
            _sds((depth, _SUBLANES, m_cols), jnp.int32, vma),
            _sds((depth, _SUBLANES, m_cols), dtype, vma),
            _sds((depth, _SUBLANES, m_cols), dtype, vma),
        )
        + tex_shapes,
        interpret=interpret,
    )(o3, d3, geom, mat, consts, *xi_in)


def _bwd_call_sub_deep(params, o3, d3, osave, dsave, thrsave, alivesave, idx, hit, clear, geom, mat, consts, g_acc, g_dww=None, xi_all=None):
    (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked, block_rays, interpret, vma, depth) = params
    m_cols = d3.shape[2]
    lane, vec, smem = _specs_sub(block_rays)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM) if blocked else smem
    geom_acc = _vmem_acc_spec(geom.shape) if blocked else _smem_acc_spec(geom.shape)
    mat_acc = _vmem_acc_spec(mat.shape) if blocked else _smem_acc_spec(mat.shape)
    geom_in = geom.T if blocked else geom
    kernel = functools.partial(
        _bwd_kernel_sub_deep,
        params=(faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked,
                1 if interpret else _blk_unroll(s_total)),
        depth=depth,
    )
    dtype = d3.dtype
    b_cols = block_rays // _SUBLANES

    def stk(rows):
        return pl.BlockSpec((rows, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    xi_spec = [stk(2 * depth)] if stoch else []
    xi_in = (xi_all,) if stoch else ()
    tex_in = (g_dww,) if tex_hw is not None else ()
    ds = depth - 1
    return pl.pallas_call(
        kernel,
        grid=(m_cols // b_cols,),
        in_specs=[
            vec, vec, stk(3 * ds), stk(3 * ds), stk(ds), stk(ds),
            stk(depth), stk(depth), stk(depth),
            smem, mat_spec, smem,
        ]
        + xi_spec
        + [vec]
        + ([stk(depth)] if tex_hw is not None else []),
        out_specs=(vec, vec, geom_acc, mat_acc, _smem_acc_spec(consts.shape)),
        out_shape=(
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds(geom.shape, dtype, vma),
            _sds(mat.shape, dtype, vma),
            _sds(consts.shape, dtype, vma),
        ),
        interpret=interpret,
    )(o3, d3, osave, dsave, thrsave, alivesave, idx, hit, clear, geom_in, mat, consts, *xi_in, g_acc, *tex_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _trace_sub_deep(params, o3, d3, geom, mat, consts):
    outs = _fwd_call_sub_deep(params, o3, d3, geom, mat, consts)
    tex_hw = params[5]
    return (outs[0],) + (outs[8:] if tex_hw is not None else ())


def _trace_sub_deep_vjp_fwd(params, o3, d3, geom, mat, consts):
    outs = _fwd_call_sub_deep(params, o3, d3, geom, mat, consts)
    primal = (outs[0],) + (outs[8:] if params[5] is not None else ())
    return primal, (o3, d3) + outs[1:8] + (geom, mat, consts)


def _trace_sub_deep_vjp_bwd(params, res, cots):
    (o3, d3, osave, dsave, thrsave, alivesave, idx, hit, clear, geom, mat, consts) = res
    if params[5] is not None:
        (g_acc, _g_flat, g_dww) = cots  # flat is int: float0
        g_dww = jnp.asarray(g_dww, d3.dtype)
    else:
        (g_acc,) = cots
        g_dww = None
    (go_in, gd_in, ggeom, gmat, gconsts) = _bwd_call_sub_deep(
        params, o3, d3, osave, dsave, thrsave, alivesave, idx, hit, clear,
        geom, mat, consts, g_acc, g_dww,
    )
    return (go_in, gd_in, ggeom, gmat, gconsts)


_trace_sub_deep.defvjp(_trace_sub_deep_vjp_fwd, _trace_sub_deep_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _trace_sub_deep_stoch(params, o3, d3, xi_all, geom, mat, consts):
    outs = _fwd_call_sub_deep(params, o3, d3, geom, mat, consts, xi_all=xi_all)
    tex_hw = params[5]
    return (outs[0],) + (outs[8:] if tex_hw is not None else ())


def _trace_sub_deep_stoch_vjp_fwd(params, o3, d3, xi_all, geom, mat, consts):
    outs = _fwd_call_sub_deep(params, o3, d3, geom, mat, consts, xi_all=xi_all)
    primal = (outs[0],) + (outs[8:] if params[5] is not None else ())
    return primal, (o3, d3) + outs[1:8] + (xi_all, geom, mat, consts)


def _trace_sub_deep_stoch_vjp_bwd(params, res, cots):
    (o3, d3, osave, dsave, thrsave, alivesave, idx, hit, clear, xi_all, geom, mat, consts) = res
    if params[5] is not None:
        (g_acc, _g_flat, g_dww) = cots
        g_dww = jnp.asarray(g_dww, d3.dtype)
    else:
        (g_acc,) = cots
        g_dww = None
    (go_in, gd_in, ggeom, gmat, gconsts) = _bwd_call_sub_deep(
        params, o3, d3, osave, dsave, thrsave, alivesave, idx, hit, clear,
        geom, mat, consts, g_acc, g_dww, xi_all=xi_all,
    )
    return (go_in, gd_in, jnp.zeros_like(xi_all), ggeom, gmat, gconsts)


_trace_sub_deep_stoch.defvjp(_trace_sub_deep_stoch_vjp_fwd, _trace_sub_deep_stoch_vjp_bwd)


def trace_fused_smooth_sub(
    origin: jax.Array,  # (N, 3) or (3,)
    direction: jax.Array,  # (N, 3) unit — or (3, N) with transposed=True
    scene: Scene,
    cfg,  # RenderConfig
    vma: frozenset | None = None,  # varying mesh axes when inside shard_map
    transposed: bool = False,
    key: jax.Array | None = None,  # PRNG key: stochastic glossy roughness
) -> jax.Array:
    """Smooth-visibility trace via the sublane-packed fwd/bwd kernels."""
    from .pallas_bounce import _ray_state_t

    dtype = cfg.dtype
    # Mosaic requires the trailing block dim divisible by 128: with 8
    # sublane rows the tile must cover >= 1024 rays.  Smaller requested
    # blocks round up (more padding, same semantics).
    block = max(cfg.block_rays, _SUBLANES * 128)
    if block % _SUBLANES:
        raise ValueError(f"block_rays must be a multiple of {_SUBLANES}")
    o_t, d_t, n = _ray_state_t(origin, direction, cfg, transposed)
    if scene.spheres.count > MAX_SUB_SPHERES_SMOOTH:
        # Blocked mode: raise the tile floor (see _BLK_MIN_BLOCK_RAYS),
        # capped at the frame so small scenes don't pad 6x.
        block = max(block, min(_BLK_MIN_BLOCK_RAYS, _round_up(n, _SUBLANES * 128)))
    n_pad = _round_up(d_t.shape[1], block)
    if n_pad != d_t.shape[1]:
        extra = n_pad - d_t.shape[1]
        o_t = jnp.concatenate([o_t, jnp.broadcast_to(o_t[:, :1], (3, extra))], axis=1)
        d_t = jnp.concatenate([d_t, jnp.broadcast_to(d_t[:, :1], (3, extra))], axis=1)
    m_cols = n_pad // _SUBLANES

    o_arr = jnp.asarray(origin, dtype)
    if o_arr.size == 3:
        # Uniform origin (the camera): broadcast straight to tile shape.
        # Going through the (3, N) intermediate makes the origin-cotangent
        # reduce a (3, N)-major-axis reduction that XLA lays out 3-minor —
        # a 12 MB relayout copy + a 0.35 ms reduce per training step
        # (device trace 2026-08-19).  Broadcasting (3,1,1) -> (3,8,M)
        # transposes to a minor-axes reduce instead.
        o3 = jnp.broadcast_to(o_arr.reshape(3, 1, 1), (3, _SUBLANES, m_cols))
    else:
        o3 = o_t.reshape(3, _SUBLANES, m_cols)
    d3 = d_t.reshape(3, _SUBLANES, m_cols)

    s_total = scene.spheres.count
    s_cheap = s_total - scene.spheres.n_exact
    blocked = s_total > MAX_SUB_SPHERES_SMOOTH
    geom = _geometry_table(scene, dtype)
    if blocked:
        # (C, S_pad) table transpose for the in-kernel piecewise gathers;
        # built with plain jnp so JAX transposes gradients back onto the
        # scene arrays.  Pad rows can never win (idx < s_total always);
        # radius 1 keeps any stray read finite.
        tbl = _material_table(scene, dtype)  # padded to 8 rows
        s_pad = _round_up(s_total, 128)
        if tbl.shape[0] < s_pad:
            pad = jnp.zeros((s_pad - tbl.shape[0], _COLS), dtype).at[:, _RAD].set(1.0)
            tbl = jnp.concatenate([tbl, pad], axis=0)
        mat = tbl[:s_pad].T  # (C, S_pad)
    else:
        mat = _material_table(scene, dtype)[:s_total]  # unpadded (S, C)
    consts = _consts_row(scene, dtype)

    atlas = scene.texture_atlas
    textured = atlas.shape[1] > 1 or atlas.shape[2] > 1
    tex_hw = (int(atlas.shape[1]), int(atlas.shape[2])) if textured else None
    texels = jnp.asarray(atlas, dtype).reshape(-1, 3) if textured else None

    stochastic = key is not None and cfg.stochastic_roughness
    params = (
        cfg.faraway, s_cheap, s_total,
        float(cfg.edge_sharpness), float(cfg.shadow_sharpness),
        tex_hw, stochastic, blocked,
        block, cfg.pallas_interpret,
        frozenset(vma) if vma else None,
    )

    if vma:
        def to_varying(x):
            missing = tuple(a for a in vma if a not in getattr(jax.typeof(x), "vma", frozenset()))
            return jax.lax.pcast(x, missing, to="varying") if missing else x

        o3, d3, geom, mat, consts = (to_varying(x) for x in (o3, d3, geom, mat, consts))

    if 2 <= cfg.max_depth <= MAX_FUSE_DEPTH and s_total <= MAX_DEEP_SPHERES:
        # Depth-fused route: one fwd launch for the whole bounce chain
        # (state in VMEM, per-depth residuals out), one bwd launch for
        # the reverse adjoint chain.  Scan route below for depth 1 /
        # beyond the unroll or table-size caps.
        params_deep = params + (cfg.max_depth,)
        if stochastic:
            # EXACT seed schedule of the scan path: fold per bounce,
            # uniforms over the UNPADDED ray count, drawn up front.
            from .rng import fold_seed, uniform2

            k = key
            xis = []
            for _ in range(cfg.max_depth):
                k, k_bounce = fold_seed(k, 1), fold_seed(k, 2)
                xi = uniform2(k_bounce, n, dtype)
                if n_pad != n:
                    xi = jnp.concatenate([xi, jnp.full((n_pad - n, 2), 0.5, dtype)], axis=0)
                xis.append(xi.T.reshape(2, _SUBLANES, m_cols))
            xi_all = jnp.concatenate(xis, axis=0)  # (2*depth, 8, M)
            out = _trace_sub_deep_stoch(params_deep, o3, d3, xi_all, geom, mat, consts)
        else:
            out = _trace_sub_deep(params_deep, o3, d3, geom, mat, consts)
        acc = out[0]
        if textured:
            flats, dwws = out[1], out[2]
            for dep in range(cfg.max_depth):
                tex_c = jnp.moveaxis(jnp.take(texels, flats[dep], axis=0), -1, 0)
                acc = acc + tex_c * dwws[dep][None]
        return acc.reshape(3, n_pad).T[:n]

    def compose_tex(out):
        if not textured:
            return out
        o3n, d3n, thr_n, alive_n, acc_n, flat, dww = out
        # Image-diffuse term composed OUTSIDE the kernel: nearest-texel
        # gather (zero gradient, like jax.grad of the XLA sampler)
        # times the differentiable dww exported by the kernel.
        tex_c = jnp.moveaxis(jnp.take(texels, flat, axis=0), -1, 0)  # (3, 8, M)
        return (o3n, d3n, thr_n, alive_n, acc_n + tex_c * dww[None])

    def bounce(carry, _):
        if stochastic:
            o3, d3, thr, alive, acc, k = carry
            # EXACT seed schedule of the XLA stochastic path (render.trace):
            # stateless fold per bounce (ops/rng.py), uniforms over the
            # UNPADDED ray count.
            from .rng import fold_seed, uniform2

            k, k_bounce = fold_seed(k, 1), fold_seed(k, 2)
            xi = uniform2(k_bounce, n, dtype)
            if n_pad != n:
                xi = jnp.concatenate([xi, jnp.full((n_pad - n, 2), 0.5, dtype)], axis=0)
            xi3 = xi.T.reshape(2, _SUBLANES, m_cols)
            out = compose_tex(
                _bounce_sub_stoch(params, o3, d3, thr, alive, acc, xi3, geom, mat, consts)
            )
            return out + (k,), None
        o3, d3, thr, alive, acc = carry
        return compose_tex(_bounce_sub(params, o3, d3, thr, alive, acc, geom, mat, consts)), None

    init = (
        o3,
        d3,
        jnp.ones((_SUBLANES, m_cols), dtype),
        jnp.ones((_SUBLANES, m_cols), dtype),
        jnp.zeros((3, _SUBLANES, m_cols), dtype),
    )
    if stochastic:
        init = init + (key,)
    if vma:
        def to_varying(x):
            missing = tuple(a for a in vma if a not in getattr(jax.typeof(x), "vma", frozenset()))
            return jax.lax.pcast(x, missing, to="varying") if missing else x

        # The PRNG key (stochastic carry tail) stays replicated: each shard
        # draws the full xi array and slices its rays implicitly via the
        # ray packing, so no pcast on the uint key.
        init = tuple(jax.tree_util.tree_map(to_varying, x) for x in init[:5]) + init[5:]
        geom, mat, consts = (to_varying(x) for x in (geom, mat, consts))
    final, _ = jax.lax.scan(bounce, init, None, length=cfg.max_depth)
    acc = final[4]
    return acc.reshape(3, n_pad).T[:n]


# ---------------------------------------------------------------------------
# Fused TRAIN-STEP kernel: loss + ALL gradients in ONE launch.
#
# The deep fwd/bwd pair still pays (a) the per-depth residual round trip
# through HBM (~28 tile channels written by fwd, re-read by bwd), (b) a
# full forward REPLAY inside the backward kernel, and (c) ~0.2 ms of
# loss/launch glue between the two launches (docs/PERF.md attribution,
# 2026-08-19).  But the training loss is ELEMENTWISE in the image (L2 on
# the clipped pixels, optim/train.py:l2_image_loss) — so its cotangent is
# computable per ray lane *inside* the kernel.  This kernel runs the whole
# forward chain, forms the loss cotangent against the packed target, and
# runs the adjoint chain in reverse — per-bounce intermediates never leave
# the core (TRAIN_SAVE_MODE="live": every _FwdSub stays live across the
# fwd->bwd boundary, Mosaic spills to VMEM as needed; "replay" keeps only
# (o, d, thr, alive, idx, hit, clear) per bounce and re-derives the rest,
# bounding the live set).  The SSE reduces into one SMEM scalar.
#
# The wrapper is a custom_vjp whose PRIMAL already computed every
# gradient: the backward pass is a scalar multiply of the stashed tables —
# zero additional kernel launches per training step.
# ---------------------------------------------------------------------------

# "live" keeps all forward intermediates live across the fwd->bwd
# boundary (no replay ops; Mosaic spills to VMEM); "replay" re-derives
# them from (idx, hit, clear) like the two-launch pair (smaller live set).
TRAIN_SAVE_MODE = "live"

# Sphere-count ceiling for the single-launch train kernel: the combined
# fwd+adjoint program's scoped-VMEM stack scales with the (4, S)+(C, S)
# tables plus the depth-unrolled spill arena.  Hardware-probed 2026-08-20
# (256x144 depth 3): 2048 compiles + trains (live, 87 s cold), 4096 OOMs
# the 16 MB scoped VMEM in BOTH save modes (live needs 22.7 MB at 8192).
# Bigger tables keep the two-launch deep pair, which is verified to
# MAX_BLK_SPHERES_SMOOTH.
MAX_FUSED_TRAIN_SPHERES = 2048


def _clip_gate(x, lo, hi):
    """d/dx of jnp.clip(x, lo, hi), matching JAX's tie convention exactly:
    min/max gradients split 0.5 at exact boundary hits."""
    dt = x.dtype
    g_lo = 0.5 * ((x >= lo).astype(dt) + (x > lo).astype(dt))
    y = jnp.maximum(x, lo)
    g_hi = 0.5 * ((y <= hi).astype(dt) + (y < hi).astype(dt))
    return g_lo * g_hi


def _train_kernel_sub_deep(*refs, params, depth, live):
    (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked, *_rest) = params
    (o_ref, d_ref, tgt_ref, mask_ref, geom_ref, mat_ref, const_ref, *rest) = refs
    if stoch:
        xi_ref, *rest = rest
    (loss_ref, go_ref, gd_ref, ggeom_ref, gmat_ref, gconst_ref) = rest

    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    dtype = o[0].dtype
    shape = o[0].shape
    thr = jnp.ones(shape, dtype)
    alive = jnp.ones(shape, dtype)
    acc = [jnp.zeros(shape, dtype) for _ in range(3)]
    saved = []
    for dep in range(depth):
        xi = (xi_ref[2 * dep], xi_ref[2 * dep + 1]) if stoch else None
        f = _FwdSub(o, d, thr, alive, (geom_ref, mat_ref, const_ref), params, xi=xi)
        for i in range(3):
            acc[i] = acc[i] + f.color[i] * f.w
        if live:
            saved.append((f, o, d))
        else:
            saved.append((o, d, thr, alive, (f.idx, f.hit, f.clear), xi))
        o, d, thr, alive = f.p_n, f.dout, f.thr_out, f.alive_out

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        _zero_table_grads(ggeom_ref, gmat_ref, gconst_ref, blocked, s_total)
        loss_ref[0, 0] = jnp.zeros((), dtype)

    # Loss cotangent in-kernel: sse = sum(mask * (clip(acc) - tgt)^2);
    # g_acc = 2 * mask * (clip(acc) - tgt) * clip'(acc).  The 1/(N*3) mean
    # scale (and the upstream loss cotangent) applies OUTSIDE via the
    # custom_vjp's scalar multiply.
    mask = mask_ref[:, :]
    sse = jnp.zeros(shape, dtype)
    g_acc_l = []
    for i in range(3):
        e = (jnp.clip(acc[i], 0.0, 1.0) - tgt_ref[i]) * mask
        sse = sse + e * e
        g_acc_l.append(2.0 * e * _clip_gate(acc[i], 0.0, 1.0))
    loss_ref[0, 0] += jnp.sum(sse)
    g_acc = tuple(g_acc_l)

    # Reverse adjoint chain, lane cotangents staying in registers.  The
    # final bounce's (o, d, thr, alive) outputs are discarded by the loss:
    # their cotangents start at zero.
    zero = jnp.zeros(shape, dtype)
    g_o = (zero, zero, zero)
    g_d = (zero, zero, zero)
    g_thr = zero
    g_alive = zero
    for dep in reversed(range(depth)):
        if live:
            f, o, d = saved[dep]
        else:
            o, d, thr, alive, svd, xi = saved[dep]
            f = _FwdSub(
                o, d, thr, alive, (geom_ref, mat_ref, const_ref), params,
                saved=svd, xi=xi,
            )
        cots = (g_o, g_d, g_thr, g_alive, g_acc, None)
        g_o, g_d, g_thr, g_alive = _adjoint_bounce(
            f, o, d, cots, geom_ref, ggeom_ref, gmat_ref, gconst_ref, params
        )
    for i in range(3):
        go_ref[i] = g_o[i]
        gd_ref[i] = g_d[i]


def _train_call_sub_deep(params, o3, d3, tgt3, mask, geom, mat, consts, xi_all=None):
    (faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked,
     block_rays, interpret, vma, depth, live) = params
    m_cols = d3.shape[2]
    lane, vec, smem = _specs_sub(block_rays)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM) if blocked else smem
    geom_acc = _vmem_acc_spec(geom.shape) if blocked else _smem_acc_spec(geom.shape)
    mat_acc = _vmem_acc_spec(mat.shape) if blocked else _smem_acc_spec(mat.shape)
    geom_in = geom.T if blocked else geom
    kernel = functools.partial(
        _train_kernel_sub_deep,
        params=(faraway, s_cheap, s_total, sharp_e, sharp_s, tex_hw, stoch, blocked,
                1 if interpret else _blk_unroll(s_total)),
        depth=depth,
        live=live,
    )
    dtype = d3.dtype
    b_cols = block_rays // _SUBLANES

    def stk(rows):
        return pl.BlockSpec((rows, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    xi_spec = [stk(2 * depth)] if stoch else []
    xi_in = (xi_all,) if stoch else ()
    return pl.pallas_call(
        kernel,
        grid=(m_cols // b_cols,),
        in_specs=[vec, vec, vec, lane, smem, mat_spec, smem] + xi_spec,
        out_specs=(
            _smem_acc_spec((1, 1)),
            vec, vec,
            geom_acc, mat_acc, _smem_acc_spec(consts.shape),
        ),
        out_shape=(
            _sds((1, 1), dtype, vma),
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds((3, _SUBLANES, m_cols), dtype, vma),
            _sds(geom.shape, dtype, vma),
            _sds(mat.shape, dtype, vma),
            _sds(consts.shape, dtype, vma),
        ),
        interpret=interpret,
    )(o3, d3, tgt3, mask, geom_in, mat, consts, *xi_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _train_loss_sub_deep(params, o3, d3, tgt3, mask, geom, mat, consts):
    outs = _train_call_sub_deep(params, o3, d3, tgt3, mask, geom, mat, consts)
    return outs[0][0, 0]


def _train_loss_sub_deep_vjp_fwd(params, o3, d3, tgt3, mask, geom, mat, consts):
    outs = _train_call_sub_deep(params, o3, d3, tgt3, mask, geom, mat, consts)
    # The primal already computed every gradient: stash them; bwd is a
    # scalar multiply (zero extra kernel launches).
    return outs[0][0, 0], (outs[1:], tgt3, mask)


def _train_loss_sub_deep_vjp_bwd(params, res, g):
    (go, gd, ggeom, gmat, gconsts), tgt3, mask = res
    # tgt3/mask cotangents are hardwired to zero: the target is a loss
    # CONSTANT by contract (see fused_train_l2's docstring) — the true
    # d(sse)/d(tgt) = -2*mask*(clip(acc)-tgt) is not exported by the kernel.
    return (g * go, g * gd, jnp.zeros_like(tgt3), jnp.zeros_like(mask),
            g * ggeom, g * gmat, g * gconsts)


_train_loss_sub_deep.defvjp(_train_loss_sub_deep_vjp_fwd, _train_loss_sub_deep_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _train_loss_sub_deep_stoch(params, o3, d3, tgt3, mask, xi_all, geom, mat, consts):
    outs = _train_call_sub_deep(params, o3, d3, tgt3, mask, geom, mat, consts, xi_all=xi_all)
    return outs[0][0, 0]


def _train_loss_sub_deep_stoch_vjp_fwd(params, o3, d3, tgt3, mask, xi_all, geom, mat, consts):
    outs = _train_call_sub_deep(params, o3, d3, tgt3, mask, geom, mat, consts, xi_all=xi_all)
    return outs[0][0, 0], (outs[1:], tgt3, mask, xi_all)


def _train_loss_sub_deep_stoch_vjp_bwd(params, res, g):
    (go, gd, ggeom, gmat, gconsts), tgt3, mask, xi_all = res
    return (g * go, g * gd, jnp.zeros_like(tgt3), jnp.zeros_like(mask),
            jnp.zeros_like(xi_all), g * ggeom, g * gmat, g * gconsts)


_train_loss_sub_deep_stoch.defvjp(_train_loss_sub_deep_stoch_vjp_fwd, _train_loss_sub_deep_stoch_vjp_bwd)


def fused_train_l2(
    origin: jax.Array,  # camera position (3,)
    direction: jax.Array,  # (N, 3) unit — or (3, N) with transposed=True
    target: jax.Array,  # (N, 3) clipped target colors
    scene: Scene,
    cfg,  # RenderConfig
    transposed: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """L2 pixel loss (mean over N*3 values of the CLIPPED render vs target)
    through the single-launch fused train kernel.

    Equals ``l2_image_loss(render(scene, cfg), target)`` up to float
    reduction order, with gradients identical to ``jax.grad`` of the
    two-launch route (tests/test_fused_smooth.py) — but the whole
    value-and-grad is ONE kernel launch.

    Gradient scope: the loss differentiates w.r.t. the SCENE (rays, sphere
    geometry/materials, lights, camera) only.  The ``target`` (and the
    padding mask) is treated as a constant: its cotangent is hardwired to
    zero in the custom_vjp (the true value would be
    ``-2*mask*(clip(acc)-tgt)/(N*3)``, which the kernel does not export).
    ``optim.train.make_loss_fn`` honors this by closing over the target;
    do not ``jax.grad`` this function w.r.t. ``target``.
    """
    from .pallas_bounce import _ray_state_t

    dtype = cfg.dtype
    block = max(cfg.block_rays, _SUBLANES * 128)
    if block % _SUBLANES:
        raise ValueError(f"block_rays must be a multiple of {_SUBLANES}")
    o_t, d_t, n = _ray_state_t(origin, direction, cfg, transposed)
    if scene.spheres.count > MAX_SUB_SPHERES_SMOOTH:
        block = max(block, min(_BLK_MIN_BLOCK_RAYS, _round_up(n, _SUBLANES * 128)))
    n_pad = _round_up(d_t.shape[1], block)
    if n_pad != d_t.shape[1]:
        extra = n_pad - d_t.shape[1]
        o_t = jnp.concatenate([o_t, jnp.broadcast_to(o_t[:, :1], (3, extra))], axis=1)
        d_t = jnp.concatenate([d_t, jnp.broadcast_to(d_t[:, :1], (3, extra))], axis=1)
    m_cols = n_pad // _SUBLANES

    o_arr = jnp.asarray(origin, dtype)
    if o_arr.size == 3:
        # Tile-shaped origin broadcast (docs/PERF.md: keeps the
        # origin-cotangent reduce on the minor axes).
        o3 = jnp.broadcast_to(o_arr.reshape(3, 1, 1), (3, _SUBLANES, m_cols))
    else:
        o3 = o_t.reshape(3, _SUBLANES, m_cols)
    d3 = d_t.reshape(3, _SUBLANES, m_cols)

    # Target + padding mask in the same (3, 8, M) packing as the rays.
    tgt_t = jnp.asarray(target, dtype).reshape(n, 3).T
    if n_pad != n:
        tgt_t = jnp.concatenate([tgt_t, jnp.zeros((3, n_pad - n), dtype)], axis=1)
    tgt3 = tgt_t.reshape(3, _SUBLANES, m_cols)
    mask = (jnp.arange(n_pad, dtype=jnp.int32) < n).astype(dtype).reshape(_SUBLANES, m_cols)

    s_total = scene.spheres.count
    s_cheap = s_total - scene.spheres.n_exact
    blocked = s_total > MAX_SUB_SPHERES_SMOOTH
    geom = _geometry_table(scene, dtype)
    if blocked:
        tbl = _material_table(scene, dtype)
        s_pad = _round_up(s_total, 128)
        if tbl.shape[0] < s_pad:
            pad = jnp.zeros((s_pad - tbl.shape[0], _COLS), dtype).at[:, _RAD].set(1.0)
            tbl = jnp.concatenate([tbl, pad], axis=0)
        mat = tbl[:s_pad].T
    else:
        mat = _material_table(scene, dtype)[:s_total]
    consts = _consts_row(scene, dtype)

    stochastic = key is not None and cfg.stochastic_roughness
    if not (2 <= cfg.max_depth <= MAX_FUSE_DEPTH):
        raise ValueError("fused_train_l2 requires 2 <= max_depth <= MAX_FUSE_DEPTH")
    # Mirror the caller-side fused_train_l2_ok gates so a direct call fails
    # loudly instead of silently dropping the texture term (params hardwire
    # tex_hw=None) or compiling toward the probed 16 MB scoped-VMEM overrun.
    if scene.texture_atlas.shape[1] > 1 or scene.texture_atlas.shape[2] > 1:
        raise ValueError(
            "fused_train_l2 does not sample image atlases; textured scenes "
            "keep the two-launch pair (see render.fused_train_l2_ok)"
        )
    if scene.spheres.count > MAX_FUSED_TRAIN_SPHERES:
        raise ValueError(
            f"fused_train_l2 caps at {MAX_FUSED_TRAIN_SPHERES} spheres "
            "(scoped-VMEM ceiling, hardware-probed); bigger tables keep the "
            "two-launch pair"
        )
    params = (
        cfg.faraway, s_cheap, s_total,
        float(cfg.edge_sharpness), float(cfg.shadow_sharpness),
        None, stochastic, blocked,
        block, cfg.pallas_interpret, None,
        cfg.max_depth, TRAIN_SAVE_MODE == "live",
    )
    if stochastic:
        # EXACT seed schedule of the scan/deep paths.
        from .rng import fold_seed, uniform2

        k = key
        xis = []
        for _ in range(cfg.max_depth):
            k, k_bounce = fold_seed(k, 1), fold_seed(k, 2)
            xi = uniform2(k_bounce, n, dtype)
            if n_pad != n:
                xi = jnp.concatenate([xi, jnp.full((n_pad - n, 2), 0.5, dtype)], axis=0)
            xis.append(xi.T.reshape(2, _SUBLANES, m_cols))
        xi_all = jnp.concatenate(xis, axis=0)
        sse = _train_loss_sub_deep_stoch(params, o3, d3, tgt3, mask, xi_all, geom, mat, consts)
    else:
        sse = _train_loss_sub_deep(params, o3, d3, tgt3, mask, geom, mat, consts)
    return sse / (n * 3)

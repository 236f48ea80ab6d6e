"""Fused smooth-visibility bounce: forward AND handwritten adjoint kernels.

The training path (smooth sigmoid visibility, BASELINE config 3/5) spends
its time in hundreds of small XLA fusions per bounce; this module fuses
each bounce into ONE forward Pallas kernel and ONE backward Pallas kernel
wrapped in ``jax.custom_vjp``, so a full Adam step is a handful of kernel
launches.

Semantics replicate :func:`..render.trace`'s smooth bounce exactly
(single-shard): sigmoid coverage of the winning sphere (nearest hit, or
the max-discriminant sphere on miss), shadow = product over other spheres
of ``1 - sigmoid occlusion``, the full reference BRDF
(``/root/reference/ray_tracer/infrastructure/numpy/shader.py:63-112``),
and the mirror continuation.

The backward kernel recomputes the forward per ray tile (nothing but the
bounce inputs is saved — rematerialization in VMEM), then runs the manual
adjoint: per-lane chain rule through shading/geometry, one O(N*S) block
loop for the shadow-product adjoint, and one-hot MXU matmuls to scatter
per-lane material gradients into the (S, C) table.  Gradients match
``jax.grad`` of the XLA path (see tests/test_fused_smooth.py).

Scope: const/checker textures, deterministic mirror bounces, single shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene
from .pallas_bounce import _COLS, _NCONST, _material_table
from .pallas_bounce import (
    _CX, _CY, _CZ, _RAD, _DG, _DCR, _DCG, _DCB, _SG, _ROUGH, _IG, _IOR, _TFW, _TFT, _TFI, _KIND,
)
from .pallas_intersect import _pad_rays, _round_up, _split_tiers, _two_prod, _two_sum
from .shading import AMBIENT, GLINT_EXPONENT, NUDGE, SHADING_EPS


def _sig(x):
    return jax.nn.sigmoid(x)


def _prod_rows(x):
    """Product over the sublane axis as a log2 multiply tree.

    Mosaic has no reduce_prod lowering; a pairwise tree is pure elementwise
    multiplies.  Pads to a power of two with ones (static shapes).
    """
    n = x.shape[0]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        x = jnp.concatenate([x, jnp.ones((p - n, x.shape[1]), x.dtype)], axis=0)
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = x[0:h, :] * x[h : 2 * h, :]
    return x  # (1, B)


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm3(v, eps_guard=True):
    mag = jnp.sqrt(_dot3(v, v))
    inv = 1.0 / jnp.where(mag == 0, jnp.ones_like(mag), mag)
    return tuple(c * inv for c in v), mag


def _quad_sol_disc(b, c_term, faraway, dtype):
    """Root selection + validity (shape.py:41-51); returns (sol, disc, t)."""
    disc = b * b - 4.0 * c_term
    pos = disc > 0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    qroot = -0.5 * (b + jnp.where(b < 0, -sq, sq))
    safe_q = jnp.where(qroot == 0, jnp.ones_like(qroot), qroot)
    other = jnp.where(qroot == 0, jnp.zeros_like(qroot), c_term / safe_q)
    t0 = jnp.minimum(qroot, other)
    t1 = jnp.maximum(qroot, other)
    sol = jnp.where((t0 > 0) & (t0 < t1), t0, t1)
    t = jnp.where(pos & (sol > 0), sol, jnp.asarray(faraway, dtype))
    return sol, disc, t


def _block_sol_disc_plain(o, d, c, r, faraway):
    dtype = r.dtype
    oc = tuple(o[i] - c[i] for i in range(3))
    b = 2.0 * _dot3(d, oc)
    c_term = _dot3(oc, oc) - r * r
    return _quad_sol_disc(b, c_term, faraway, dtype) + (b, c_term)


def _compensated_b_cterm(o, d, c, r, dtype):
    h, lo = [], []
    for i in range(3):
        hi_i, lo_i = _two_sum(o[i], -c[i])
        h.append(hi_i)
        lo.append(lo_i)
    b = 2.0 * ((d[0] * h[0] + d[1] * h[1] + d[2] * h[2]) + (d[0] * lo[0] + d[1] * lo[1] + d[2] * lo[2]))
    p0, e0 = _two_prod(h[0], h[0], dtype)
    p1, e1 = _two_prod(h[1], h[1], dtype)
    p2, e2 = _two_prod(h[2], h[2], dtype)
    pr, er = _two_prod(r, r, dtype)
    s1, t1 = _two_sum(p0, p1)
    s2, t2 = _two_sum(s1, p2)
    s3, t3 = _two_sum(s2, -pr)
    corr = (
        (t1 + t2 + t3) + (e0 + e1 + e2 - er)
        + 2.0 * (h[0] * lo[0] + h[1] * lo[1] + h[2] * lo[2])
        + (lo[0] * lo[0] + lo[1] * lo[1] + lo[2] * lo[2])
    )
    return b, s3 + corr


def _block_sol_disc_exact(o, d, c, r, faraway):
    dtype = r.dtype
    b, c_term = _compensated_b_cterm(o, d, c, r, dtype)
    return _quad_sol_disc(b, c_term, faraway, dtype) + (b, c_term)


def _sphere_block(c_ref, r_ref, k0, block):
    cb = c_ref[pl.ds(k0, block), :]
    return (cb[:, 0:1], cb[:, 1:2], cb[:, 2:3]), r_ref[pl.ds(k0, block), :]


def _select_loop(o, d, regions, faraway, width, dtype):
    """(tmin, idx_min, dmax, idx_dmax) over all sphere blocks.

    regions: list of (c_ref, r_ref, bs, base, block_fn).
    """
    int_max = jnp.iinfo(jnp.int32).max
    tmin = jnp.full((1, width), jnp.asarray(faraway, dtype))
    imin = jnp.zeros((1, width), jnp.int32)
    dmax = jnp.full((1, width), -jnp.asarray(3.0e38, dtype))
    idmax = jnp.zeros((1, width), jnp.int32)

    for c_ref, r_ref, bs, base, block_fn in regions:
        def body(k, carry, c_ref=c_ref, r_ref=r_ref, bs=bs, base=base, block_fn=block_fn):
            tmin, imin, dmax, idmax = carry
            c, r = _sphere_block(c_ref, r_ref, k * bs, bs)
            sol, disc, t, _, _ = block_fn(o, d, c, r, faraway)
            sidx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + (k * bs + base)
            tb = jnp.min(t, axis=0, keepdims=True)
            ib = jnp.min(jnp.where(t == tb, sidx, int_max), axis=0, keepdims=True)
            take = tb < tmin
            tmin = jnp.where(take, tb, tmin)
            imin = jnp.where(take, ib, imin)
            db = jnp.max(disc, axis=0, keepdims=True)
            idb = jnp.min(jnp.where(disc == db, sidx, int_max), axis=0, keepdims=True)
            taked = db > dmax
            dmax = jnp.where(taked, db, dmax)
            idmax = jnp.where(taked, idb, idmax)
            return tmin, imin, dmax, idmax

        tmin, imin, dmax, idmax = jax.lax.fori_loop(
            0, c_ref.shape[0] // bs, body, (tmin, imin, dmax, idmax)
        )
    return tmin, imin, dmax, idmax


def _gather_mat(mat_ref, idx, width, dtype):
    s_mat = mat_ref.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (s_mat, width), 0) == idx).astype(dtype)
    mat = jax.lax.dot_general(
        mat_ref[:, :], onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return mat, onehot  # (C, B), (S, B)


class _Fwd:
    """Forward chain per ray tile; all values lane-major (1, B).

    Every intermediate is kept as an attribute so the adjoint can reuse it.
    """

    def __init__(self, o, d, thr, alive, refs, params, saved=None):
        (cc_ref, rc_ref, ce_ref, re_ref, mat_ref, const_ref) = refs
        (faraway, bs_cheap, bs_exact, exact_base, sharp_e, sharp_s) = params
        dtype = rc_ref.dtype
        width = o[0].shape[1]
        self.dtype, self.width = dtype, width
        self.o, self.d, self.thr, self.alive = o, d, thr, alive
        self.faraway, self.sharp_e, self.sharp_s = faraway, sharp_e, sharp_s
        self.exact_base = exact_base

        regions = [
            (cc_ref, rc_ref, bs_cheap, 0, _block_sol_disc_plain),
            (ce_ref, re_ref, bs_exact, exact_base, _block_sol_disc_exact),
        ]
        self.regions = regions
        saved_clear = None
        if saved is not None:
            # The backward kernel replays the winner selection and shadow
            # product from values the forward kernel saved — skips two of
            # the three O(N*S) sweeps.
            self.idx, self.hit, saved_clear = saved
        else:
            tmin, imin, dmax, idmax = _select_loop(o, d, regions, faraway, width, dtype)
            self.hit = tmin != jnp.asarray(faraway, dtype)
            self.idx = jnp.where(self.hit, imin, idmax)
        self._saved_clear = saved_clear

        mat, onehot = _gather_mat(mat_ref, self.idx, width, dtype)
        self.mat, self.onehot = mat, onehot
        m = self.m
        self.c_w = (m(_CX), m(_CY), m(_CZ))
        self.r_w = m(_RAD)

        # Winner-only per-lane sweep quantities (recomputed at O(N)); the
        # exact tier re-runs the compensated form so values match the loop.
        is_exact = (self.idx >= exact_base).astype(dtype)
        b_p = 2.0 * _dot3(d, tuple(o[i] - self.c_w[i] for i in range(3)))
        oc = tuple(o[i] - self.c_w[i] for i in range(3))
        ct_p = _dot3(oc, oc) - self.r_w * self.r_w
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
            return const_ref[0:1, i : i + 1]

        self.cam = (const(0), const(1), const(2))
        self.light = (const(3), const(4), const(5))
        self.dome_c = (const(6), const(7), const(8))
        self.dome_t = const(9)

        self.lv_raw = tuple(self.light[i] - self.p[i] for i in range(3))
        self.L, self.l_mag = _norm3(self.lv_raw)
        self.vv_raw = tuple(self.cam[i] - self.p[i] for i in range(3))
        self.V, self.v_mag = _norm3(self.vv_raw)
        self.p_n = tuple(self.p[i] + self.normal[i] * NUDGE for i in range(3))

        # shadow: running product over all spheres != winner
        if self._saved_clear is not None:
            clear = self._saved_clear
        else:
            clear = jnp.ones((1, width), dtype)
            for c_ref, r_ref, bs, base, block_fn in regions:
                def sbody(k, clear, c_ref=c_ref, r_ref=r_ref, bs=bs, base=base, block_fn=block_fn):
                    c, r = _sphere_block(c_ref, r_ref, k * bs, bs)
                    sol, disc, _, _, _ = block_fn(self.p_n, self.L, c, r, faraway)
                    occl = _sig(sharp_s * disc) * _sig(sharp_s * sol)
                    sidx = jax.lax.broadcasted_iota(jnp.int32, sol.shape, 0) + (k * bs + base)
                    fac = jnp.where(sidx == self.idx, jnp.ones_like(occl), 1.0 - occl)
                    return clear * _prod_rows(fac)

                clear = jax.lax.fori_loop(0, c_ref.shape[0] // bs, sbody, clear)
        self.clear = clear

        # shading
        self.n_dot_l = jnp.maximum(_dot3(self.normal, self.L), 0.0)
        cx = jnp.trunc(self.p[0] * 2.0).astype(jnp.int32) % 2
        cz = jnp.trunc(self.p[2] * 2.0).astype(jnp.int32) % 2
        self.checker = (cx == cz).astype(dtype)
        self.is_checker = m(_KIND) == 1.0
        self.tex = tuple(jnp.where(self.is_checker, self.checker, m(c)) for c in (_DCR, _DCG, _DCB))
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
        self.refl_coeff = 0.5 * m(_SG) * self.clear
        self.thr_out = self.w * self.refl_coeff
        self.alive_out = self.coverage

        self.ddn = 2.0 * _dot3(d, self.normal)
        self.u = tuple(d[i] - self.normal[i] * self.ddn for i in range(3))
        self.refl, self.u_mag = _norm3(self.u)

    def m(self, col):
        return self.mat[col : col + 1, :]


def _fwd_kernel(
    o_ref, d_ref, thr_ref, alive_ref, acc_ref,
    cc_ref, rc_ref, ce_ref, re_ref, mat_ref, const_ref,
    o_out, d_out, thr_out, alive_out, acc_out, idx_out, hit_out, clear_out,
    *, params,
):
    o = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :])
    d = (d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])
    f = _Fwd(o, d, thr_ref[:, :], alive_ref[:, :], (cc_ref, rc_ref, ce_ref, re_ref, mat_ref, const_ref), params)
    for i in range(3):
        acc_out[i : i + 1, :] = acc_ref[i : i + 1, :] + f.color[i] * f.w
        o_out[i : i + 1, :] = f.p_n[i]
        d_out[i : i + 1, :] = f.refl[i]
    thr_out[:, :] = f.thr_out
    alive_out[:, :] = f.alive_out
    # Winner selection, saved for the backward kernel (skips its sweep).
    idx_out[:, :] = f.idx
    hit_out[:, :] = f.hit.astype(f.dtype)
    clear_out[:, :] = f.clear


# ---------------------------------------------------------------------------
# Backward kernel: recompute the forward per ray tile, then run the manual
# adjoint.  Per-lane chain rule for shading/geometry; one O(N*S) block loop
# for the shadow-product adjoint; one-hot MXU matmuls scatter per-lane
# material gradients into the table.
# ---------------------------------------------------------------------------

_EPS_DEN = 1e-6


def _sol_disc_adjoint(b, ct, g_sol, g_disc):
    """(g_b, g_ct) for the AS-COMPUTED ``_quad_sol_disc`` outputs.

    The implicit-root rule ``dsol = -(sol db + dct)/(2 sol + b)`` is only
    valid where disc > 0; the smooth relaxation uses ``sol`` as a signed
    proximity signal on disc <= 0 lanes too (where sol = select(-b/2,
    ct/qroot) is NOT a root), so the adjoint must follow the computed
    expression branch-for-branch — recomputed here, matching the forward's
    where-decisions exactly.
    """
    disc = b * b - 4.0 * ct
    pos = disc > 0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    sgn = jnp.where(b < 0, -1.0, 1.0)
    qroot = -0.5 * (b + sgn * sq)
    q_zero = qroot == 0
    safe_q = jnp.where(q_zero, jnp.ones_like(qroot), qroot)
    other = jnp.where(q_zero, jnp.zeros_like(qroot), ct / safe_q)

    # which computed value was selected as sol
    t0 = jnp.minimum(qroot, other)
    t1 = jnp.maximum(qroot, other)
    sol = jnp.where((t0 > 0) & (t0 < t1), t0, t1)
    chose_q = sol == qroot

    g_b_out = 2.0 * b * g_disc
    g_ct_out = -4.0 * g_disc

    g_qroot = jnp.where(chose_q, g_sol, 0.0)
    g_other = jnp.where(chose_q, 0.0, g_sol)
    # other = ct / qroot (0 when qroot == 0)
    g_ct_out = g_ct_out + jnp.where(q_zero, 0.0, g_other / safe_q)
    g_qroot = g_qroot + jnp.where(q_zero, 0.0, -g_other * ct / (safe_q * safe_q))
    # qroot = -0.5 (b + sgn * sq)
    g_b_out = g_b_out - 0.5 * g_qroot
    g_sq = -0.5 * sgn * g_qroot
    # sq = sqrt(disc) where pos else 0
    g_disc_sq = jnp.where(pos, g_sq / (2.0 * jnp.maximum(sq, _EPS_DEN)), 0.0)
    g_b_out = g_b_out + 2.0 * b * g_disc_sq
    g_ct_out = g_ct_out - 4.0 * g_disc_sq
    return g_b_out, g_ct_out


def _bwd_kernel(
    # saved inputs
    o_ref, d_ref, thr_ref, alive_ref, idx_ref, hit_ref, clear_ref,
    cc_ref, rc_ref, ce_ref, re_ref, mat_ref, const_ref,
    # output cotangents
    go_ref, gd_ref, gthr_ref, galive_ref, gacc_ref,
    # gradients out
    go_in_ref, gd_in_ref, gthr_in_ref, galive_in_ref,
    gcc_ref, grc_ref, gce_ref, gre_ref, gmat_ref, gconst_ref,
    *, params,
):
    o = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :])
    d = (d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])
    saved = (idx_ref[:, :], hit_ref[:, :] != 0, clear_ref[:, :])
    f = _Fwd(
        o, d, thr_ref[:, :], alive_ref[:, :],
        (cc_ref, rc_ref, ce_ref, re_ref, mat_ref, const_ref), params, saved=saved,
    )
    dtype = f.dtype
    m = f.m
    step = pl.program_id(0)

    g_refl = (gd_ref[0:1, :], gd_ref[1:2, :], gd_ref[2:3, :])
    g_o_out = (go_ref[0:1, :], go_ref[1:2, :], go_ref[2:3, :])
    g_acc = (gacc_ref[0:1, :], gacc_ref[1:2, :], gacc_ref[2:3, :])
    g_thr_o = gthr_ref[:, :]
    g_alive_o = galive_ref[:, :]

    # Table-gradient accumulators persist across grid steps; zero them on
    # the first step (output buffers start undefined).
    @pl.when(step == 0)
    def _init():
        gcc_ref[:, :] = jnp.zeros_like(gcc_ref)
        grc_ref[:, :] = jnp.zeros_like(grc_ref)
        gce_ref[:, :] = jnp.zeros_like(gce_ref)
        gre_ref[:, :] = jnp.zeros_like(gre_ref)
        gmat_ref[:, :] = jnp.zeros_like(gmat_ref)
        gconst_ref[:, :] = jnp.zeros_like(gconst_ref)

    # --- Phase A: top-level + shading adjoints -------------------------
    # acc' = acc + color * w
    g_color = tuple(g_acc[i] * f.w for i in range(3))
    g_w = sum(g_acc[i] * f.color[i] for i in range(3))
    # thr' = w * refl_coeff ; refl_coeff = 0.5 * sg * clear
    g_w = g_w + g_thr_o * f.refl_coeff
    g_rc = g_thr_o * f.w
    g_sg = 0.5 * f.clear * g_rc
    g_clear = 0.5 * m(_SG) * g_rc
    # alive' = coverage ; w = thr * coverage
    g_coverage = g_alive_o + g_w * f.thr
    g_thr_in = g_w * f.coverage
    # d' = u / |u| ; u = d - n * ddn ; ddn = 2 d.n
    rdot = sum(f.refl[i] * g_refl[i] for i in range(3))
    inv_umag = 1.0 / jnp.maximum(f.u_mag, _EPS_DEN)
    g_u = tuple((g_refl[i] - f.refl[i] * rdot) * inv_umag for i in range(3))
    g_d_acc = [g_u[i] for i in range(3)]
    g_ddn = -sum(f.normal[i] * g_u[i] for i in range(3))
    g_n_acc = [-f.ddn * g_u[i] for i in range(3)]
    for i in range(3):
        g_d_acc[i] = g_d_acc[i] + 2.0 * f.normal[i] * g_ddn
        g_n_acc[i] = g_n_acc[i] + 2.0 * d[i] * g_ddn

    # color channels
    g_tex = tuple(g_color[i] * f.dw for i in range(3))
    g_dw = sum(g_color[i] * f.tex[i] for i in range(3))
    g_spec_term = sum(g_color)
    # irid
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
    g_nv_raw = g_va * gate_nv  # clip gate (irid's view_angle)
    # spec_term = spec * sg * clear
    g_spec = g_spec_term * m(_SG) * f.clear
    g_sg = g_sg + g_spec_term * f.spec * f.clear
    g_clear = g_clear + g_spec_term * f.spec * m(_SG)
    g_spec = jnp.where(f.spec_gate, g_spec, 0.0)
    g_spec_base = g_spec
    g_sg = g_sg + g_spec * f.glint
    g_glint = g_spec * m(_SG)
    # glint = (1 - ndv)^2.5 * nlc
    g_one_m_ndv = g_glint * GLINT_EXPONENT * f.one_m_ndv ** (GLINT_EXPONENT - 1.0) * f.n_dot_l_c
    g_ndv = -g_one_m_ndv
    g_nlc = g_glint * f.one_m_ndv**GLINT_EXPONENT
    # spec_base = F * D * G / den
    inv_sden = 1.0 / f.spec_den
    g_fres = g_spec_base * f.dist * f.geom * inv_sden
    g_dist = g_spec_base * f.fresnel * f.geom * inv_sden
    g_geom = g_spec_base * f.fresnel * f.dist * inv_sden
    g_sden = -g_spec_base * f.spec_base * inv_sden
    g_ndv = g_ndv + 4.0 * g_sden
    # geom = g1l * g1v ; g1(x) = 2x / (x + R + eps), R = sqrt(A^2 + (1-A^2) x^2)
    A = f.alpha
    g_g1l = g_geom * f.g1v
    g_g1v = g_geom * f.g1l
    g_A = jnp.zeros_like(A)

    def g1_adj(x, R, g1, g_g1):
        Rs = jnp.maximum(R, _EPS_DEN)
        den = x + R + SHADING_EPS
        Rp = (1.0 - A**2) * x / Rs
        gx = g_g1 * 2.0 * (R + SHADING_EPS - x * Rp + x * 0.0) / (den * den)
        # note: d g1/dx = 2*(den) - 2x(1+R') over den^2 = 2*(R + eps - x R')/den^2
        dRdA = A * (1.0 - x * x) / Rs
        gA = g_g1 * (-2.0 * x / (den * den)) * dRdA
        return gx, gA

    gx_l, gA_l = g1_adj(f.n_dot_l_c, f.g1l_root, f.g1l, g_g1l)
    gx_v, gA_v = g1_adj(f.n_dot_v, f.g1v_root, f.g1v, g_g1v)
    g_nlc = g_nlc + gx_l
    g_ndv = g_ndv + gx_v
    g_A = g_A + gA_l + gA_v
    # dist = A^2 / (pi (D^2 + eps)), D = ndh^2 (A^2 - 1) + 1
    Dq = f.ggx_den
    denD = jnp.pi * (Dq * Dq + SHADING_EPS)
    g_A = g_A + g_dist * 2.0 * A / denD
    g_Dq = g_dist * (-(A * A) * 2.0 * Dq * jnp.pi) / (denD * denD)
    g_ndh = g_Dq * 2.0 * f.n_dot_h * (A * A - 1.0)
    g_A = g_A + g_Dq * f.n_dot_h**2 * 2.0 * A
    # fresnel = f0 + (1 - f0)(1 - vdh)^5
    g_f0 = g_fres * (1.0 - f.one_m_vdh5)
    g_vdh = -g_fres * (1.0 - f.f0) * 5.0 * (1.0 - f.v_dot_h) ** 4
    ior = m(_IOR)
    ratio = (ior - 1.0) / (ior + 1.0)
    g_ior = g_f0 * 2.0 * ratio * (2.0 / ((ior + 1.0) ** 2))
    # alpha = rough^2
    g_rough = 2.0 * m(_ROUGH) * g_A
    # clip gates
    g_ndv_raw = (g_ndv) * gate_nv + g_nv_raw
    g_ndh_raw = g_ndh * ((f.nh_raw > 0) & (f.nh_raw < 1)).astype(dtype)
    g_vdh_raw = g_vdh * ((f.vh_raw > 0) & (f.vh_raw < 1)).astype(dtype)
    g_nlc_raw = g_nlc * ((f.nl_raw > 0) & (f.nl_raw < 1)).astype(dtype)
    # dome
    g_dome_c = tuple(g_color[i] * f.dome_up for i in range(3))
    g_dome_up = sum(g_color[i] * f.dome_c[i] for i in range(3))
    g_relu_ny = g_dome_up * f.dome_t
    g_dome_t = g_dome_up * f.relu_ny
    g_n_acc[1] = g_n_acc[1] + g_relu_ny * (f.normal[1] > 0).astype(dtype)
    # dw = ndl * clear * dg ; ndl = max(nl_raw, 0)
    g_ndl = g_dw * f.clear * m(_DG)
    g_clear = g_clear + g_dw * f.n_dot_l * m(_DG)
    g_dg = g_dw * f.n_dot_l * f.clear
    g_nl_relu = g_ndl * (f.nl_raw > 0).astype(dtype)
    # tex: const-color branch only (checker is piecewise-constant)
    not_checker = (~f.is_checker).astype(dtype)
    g_dcc = tuple(g_tex[i] * not_checker for i in range(3))
    # coverage = cov_w * alive
    g_cov_w = g_coverage * f.alive
    g_alive_in = g_coverage * f.cov_w
    g_disc_w = g_cov_w * f.sig_se * f.sig_de * (1.0 - f.sig_de) * f.sharp_e
    g_sol_w = g_cov_w * f.sig_de * f.sig_se * (1.0 - f.sig_se) * f.sharp_e

    # dot-product adjoints into n / L / V / H
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

    # --- Phase C: shadow-product adjoint (block loop) ------------------
    g_pn_s = [jnp.zeros_like(g_clear) for _ in range(3)]
    g_Ls = [jnp.zeros_like(g_clear) for _ in range(3)]
    for (c_ref, r_ref, bs, base, block_fn), (gc_ref, gr_ref) in zip(
        f.regions, ((gcc_ref, grc_ref), (gce_ref, gre_ref))
    ):
        nblocks = c_ref.shape[0] // bs

        def sadj(k, carry, c_ref=c_ref, r_ref=r_ref, bs=bs, base=base, block_fn=block_fn,
                 gc_ref=gc_ref, gr_ref=gr_ref):
            g_pn0, g_pn1, g_pn2, g_L0, g_L1, g_L2 = carry
            c, r = _sphere_block(c_ref, r_ref, k * bs, bs)
            sol, disc, _, b, ct = block_fn(f.p_n, f.L, c, r, f.faraway)
            sd = _sig(f.sharp_s * disc)
            ss = _sig(f.sharp_s * sol)
            occl = sd * ss
            sidx = jax.lax.broadcasted_iota(jnp.int32, sol.shape, 0) + (k * bs + base)
            is_self = sidx == f.idx
            fac = jnp.where(is_self, jnp.ones_like(occl), 1.0 - occl)
            g_fac = g_clear * f.clear / jnp.maximum(fac, _EPS_DEN)
            g_occl = jnp.where(is_self, 0.0, -g_fac)
            g_disc_j = g_occl * ss * sd * (1.0 - sd) * f.sharp_s
            g_sol_j = g_occl * sd * ss * (1.0 - ss) * f.sharp_s
            g_b, g_ct = _sol_disc_adjoint(b, ct, g_sol_j, g_disc_j)
            oc = tuple(f.p_n[i] - c[i] for i in range(3))
            # lane-side accumulations (sum over the block's sublane rows)
            g_pn0 = g_pn0 + jnp.sum(2.0 * f.L[0] * g_b + 2.0 * oc[0] * g_ct, axis=0, keepdims=True)
            g_pn1 = g_pn1 + jnp.sum(2.0 * f.L[1] * g_b + 2.0 * oc[1] * g_ct, axis=0, keepdims=True)
            g_pn2 = g_pn2 + jnp.sum(2.0 * f.L[2] * g_b + 2.0 * oc[2] * g_ct, axis=0, keepdims=True)
            g_L0 = g_L0 + jnp.sum(2.0 * oc[0] * g_b, axis=0, keepdims=True)
            g_L1 = g_L1 + jnp.sum(2.0 * oc[1] * g_b, axis=0, keepdims=True)
            g_L2 = g_L2 + jnp.sum(2.0 * oc[2] * g_b, axis=0, keepdims=True)
            # sphere-side accumulations (sum over lanes) -> grad refs
            gc_block = jnp.concatenate(
                [
                    jnp.sum(-2.0 * f.L[i] * g_b - 2.0 * oc[i] * g_ct, axis=1, keepdims=True)
                    for i in range(3)
                ],
                axis=1,
            )  # (K, 3)
            gr_block = jnp.sum(-2.0 * r * g_ct, axis=1, keepdims=True)  # (K, 1)
            gc_ref[pl.ds(k * bs, bs), :] += gc_block
            gr_ref[pl.ds(k * bs, bs), :] += gr_block
            return g_pn0, g_pn1, g_pn2, g_L0, g_L1, g_L2

        out = jax.lax.fori_loop(
            0, nblocks, sadj, (g_pn_s[0], g_pn_s[1], g_pn_s[2], g_Ls[0], g_Ls[1], g_Ls[2])
        )
        g_pn_s = [out[0], out[1], out[2]]
        g_Ls = [out[3], out[4], out[5]]
    for i in range(3):
        g_L_acc[i] = g_L_acc[i] + g_Ls[i]

    # --- Phase D: p_n, L, V unit-vector transposes ---------------------
    g_pn = [g_o_out[i] + g_pn_s[i] for i in range(3)]
    g_p = [g_pn[i] for i in range(3)]
    for i in range(3):
        g_n_acc[i] = g_n_acc[i] + NUDGE * g_pn[i]
    # L = lv_raw/|lv_raw|
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
    # normal = (p - c_w) / r_w
    g_cw = [jnp.zeros_like(g_clear) for _ in range(3)]
    g_rw = -sum(f.normal[i] * g_n_acc[i] for i in range(3)) * f.inv_r
    for i in range(3):
        g_p[i] = g_p[i] + g_n_acc[i] * f.inv_r
        g_cw[i] = g_cw[i] - g_n_acc[i] * f.inv_r
    # p = o + d * t_safe
    g_o_in = [g_p[i] for i in range(3)]
    g_t = sum(d[i] * g_p[i] for i in range(3))
    for i in range(3):
        g_d_acc[i] = g_d_acc[i] + g_p[i] * f.t_safe
    g_sol_w = g_sol_w + jnp.where(f.hit, g_t, 0.0)
    # winner quadratic: exact as-computed adjoint (valid on disc <= 0 too)
    g_bw, g_ctw = _sol_disc_adjoint(f.b_w, f.ct_w, g_sol_w, g_disc_w)
    oc_w = tuple(o[i] - f.c_w[i] for i in range(3))
    for i in range(3):
        g_o_in[i] = g_o_in[i] + 2.0 * d[i] * g_bw + 2.0 * oc_w[i] * g_ctw
        g_d_acc[i] = g_d_acc[i] + 2.0 * oc_w[i] * g_bw
        g_cw[i] = g_cw[i] - 2.0 * d[i] * g_bw - 2.0 * oc_w[i] * g_ctw
    g_rw = g_rw - 2.0 * f.r_w * g_ctw

    # --- Phase F: scatter per-lane material grads into the table -------
    zero = jnp.zeros_like(g_clear)
    rows = [zero] * _COLS
    rows[_CX], rows[_CY], rows[_CZ] = g_cw[0], g_cw[1], g_cw[2]
    rows[_RAD] = g_rw
    rows[_DG] = g_dg
    rows[_DCR], rows[_DCG], rows[_DCB] = g_dcc[0], g_dcc[1], g_dcc[2]
    rows[_SG] = g_sg
    rows[_ROUGH] = g_rough
    rows[_IG] = g_ig
    rows[_IOR] = g_ior
    rows[_TFW] = g_tfw
    rows[_TFT] = g_tft
    rows[_TFI] = g_tfi
    grad_rows = jnp.concatenate(rows, axis=0)  # (C, B)
    gmat_ref[:, :] += jax.lax.dot_general(
        f.onehot, grad_rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (S, C)

    # --- Phase G: consts grads -----------------------------------------
    vals = [
        g_cam[0], g_cam[1], g_cam[2],
        g_light[0], g_light[1], g_light[2],
        g_dome_c[0], g_dome_c[1], g_dome_c[2],
        g_dome_t,
    ] + [jnp.zeros_like(g_dome_t)] * (_NCONST - 10)
    gconst_row = jnp.concatenate(
        [jnp.sum(v, axis=1, keepdims=True) for v in vals], axis=1
    )  # (1, 16)
    gconst_ref[:, :] += gconst_row

    # --- per-lane outputs ----------------------------------------------
    for i in range(3):
        go_in_ref[i : i + 1, :] = g_o_in[i]
        gd_in_ref[i : i + 1, :] = g_d_acc[i]
    gthr_in_ref[:, :] = g_thr_in
    galive_in_ref[:, :] = g_alive_in


# ---------------------------------------------------------------------------
# custom_vjp wrapper + scan-based trace.  Everything OUTSIDE the kernels
# (tier splitting, material-table construction, consts packing) is plain
# jnp, so JAX autodiff transposes it back onto the scene arrays — only the
# bounce itself needs the handwritten adjoint.
# ---------------------------------------------------------------------------


def _specs(block_rays):
    lane = pl.BlockSpec((1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return lane, vec, full


def _acc_spec(shape):
    """Whole-array output revisited (accumulated) by every grid step."""
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)


def _sds(shape, dtype, vma):
    if vma is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))


def _bounce_fwd_call(params, o_t, d_t, thr, alive, acc, cc, rc, ce, re, mat, consts):
    (faraway, bs_cheap, bs_exact, exact_base, sharp_e, sharp_s, block_rays, interpret, vma) = params
    n_pad = d_t.shape[1]
    lane, vec, full = _specs(block_rays)
    kernel = functools.partial(
        _fwd_kernel,
        params=(faraway, bs_cheap, bs_exact, exact_base, sharp_e, sharp_s),
    )
    dtype = d_t.dtype
    return pl.pallas_call(
        kernel,
        grid=(n_pad // block_rays,),
        in_specs=[vec, vec, lane, lane, vec, full, full, full, full, full, full],
        out_specs=(vec, vec, lane, lane, vec, lane, lane, lane),
        out_shape=(
            _sds((3, n_pad), dtype, vma),
            _sds((3, n_pad), dtype, vma),
            _sds((1, n_pad), dtype, vma),
            _sds((1, n_pad), dtype, vma),
            _sds((3, n_pad), dtype, vma),
            _sds((1, n_pad), jnp.int32, vma),
            _sds((1, n_pad), dtype, vma),
            _sds((1, n_pad), dtype, vma),
        ),
        interpret=interpret,
    )(o_t, d_t, thr, alive, acc, cc, rc, ce, re, mat, consts)


def _bounce_bwd_call(params, o_t, d_t, thr, alive, idx, hit, clear, cc, rc, ce, re, mat, consts, g_o, g_d, g_thr, g_alive, g_acc):
    (faraway, bs_cheap, bs_exact, exact_base, sharp_e, sharp_s, block_rays, interpret, vma) = params
    n_pad = d_t.shape[1]
    lane, vec, full = _specs(block_rays)
    kernel = functools.partial(
        _bwd_kernel,
        params=(faraway, bs_cheap, bs_exact, exact_base, sharp_e, sharp_s),
    )
    dtype = d_t.dtype
    return pl.pallas_call(
        kernel,
        grid=(n_pad // block_rays,),
        in_specs=[
            vec, vec, lane, lane, lane, lane, lane,  # saved inputs (+idx, hit, clear)
            full, full, full, full, full, full,  # tables
            vec, vec, lane, lane, vec,  # cotangents
        ],
        out_specs=(
            vec, vec, lane, lane,  # per-lane grads
            _acc_spec(cc.shape), _acc_spec(rc.shape),
            _acc_spec(ce.shape), _acc_spec(re.shape),
            _acc_spec(mat.shape), _acc_spec(consts.shape),
        ),
        out_shape=(
            _sds((3, n_pad), dtype, vma),
            _sds((3, n_pad), dtype, vma),
            _sds((1, n_pad), dtype, vma),
            _sds((1, n_pad), dtype, vma),
            _sds(cc.shape, dtype, vma),
            _sds(rc.shape, dtype, vma),
            _sds(ce.shape, dtype, vma),
            _sds(re.shape, dtype, vma),
            _sds(mat.shape, dtype, vma),
            _sds(consts.shape, dtype, vma),
        ),
        interpret=interpret,
    )(o_t, d_t, thr, alive, idx, hit, clear, cc, rc, ce, re, mat, consts, g_o, g_d, g_thr, g_alive, g_acc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bounce(params, o_t, d_t, thr, alive, acc, cc, rc, ce, re, mat, consts):
    return _bounce_fwd_call(params, o_t, d_t, thr, alive, acc, cc, rc, ce, re, mat, consts)[:5]


def _bounce_vjp_fwd(params, o_t, d_t, thr, alive, acc, cc, rc, ce, re, mat, consts):
    *outs, idx, hit, clear = _bounce_fwd_call(params, o_t, d_t, thr, alive, acc, cc, rc, ce, re, mat, consts)
    return tuple(outs), (o_t, d_t, thr, alive, idx, hit, clear, cc, rc, ce, re, mat, consts)


def _bounce_vjp_bwd(params, res, cots):
    (o_t, d_t, thr, alive, idx, hit, clear, cc, rc, ce, re, mat, consts) = res
    (g_o, g_d, g_thr, g_alive, g_acc) = cots
    (go_in, gd_in, gthr_in, galive_in, gcc, grc, gce, gre, gmat, gconsts) = _bounce_bwd_call(
        params, o_t, d_t, thr, alive, idx, hit, clear, cc, rc, ce, re, mat, consts, g_o, g_d, g_thr, g_alive, g_acc
    )
    # acc is a pure passthrough accumulator: g_acc_in = g_acc_out.
    return (go_in, gd_in, gthr_in, galive_in, g_acc, gcc, grc, gce, gre, gmat, gconsts)


_bounce.defvjp(_bounce_vjp_fwd, _bounce_vjp_bwd)


def trace_fused_smooth(
    origin: jax.Array,  # (N, 3) or (3,)
    direction: jax.Array,  # (N, 3) unit — or (3, N) with transposed=True
    scene: Scene,
    cfg,  # RenderConfig
    vma: frozenset | None = None,  # varying mesh axes when inside shard_map
    transposed: bool = False,
) -> jax.Array:
    """Smooth-visibility trace via the fused fwd/bwd bounce kernels."""
    from .pallas_bounce import _ray_state_t

    dtype = cfg.dtype
    o_t, d_t, n = _ray_state_t(origin, direction, cfg, transposed)
    n_pad = d_t.shape[1]

    cc, rc, ce, re, bs_cheap, bs_exact, s_cheap = _split_tiers(
        scene.spheres.center.astype(dtype), scene.spheres.radius.astype(dtype),
        scene.spheres.n_exact, cfg.block_spheres,
    )
    mat = _material_table(scene, dtype)
    consts = jnp.zeros((1, _NCONST), dtype)
    consts = consts.at[0, 0:3].set(jnp.asarray(scene.camera.position, dtype))
    consts = consts.at[0, 3:6].set(jnp.asarray(scene.lights.point_position, dtype))
    consts = consts.at[0, 6:9].set(jnp.asarray(scene.lights.dome_color[-1], dtype))
    consts = consts.at[0, 9].set(jnp.sum(jnp.asarray(scene.lights.dome_intensity, dtype)))

    params = (
        cfg.faraway, bs_cheap, bs_exact, s_cheap,
        float(cfg.edge_sharpness), float(cfg.shadow_sharpness),
        cfg.block_rays, cfg.pallas_interpret,
        frozenset(vma) if vma else None,
    )

    def bounce(carry, _):
        o_t, d_t, thr, alive, acc = carry
        return _bounce(params, o_t, d_t, thr, alive, acc, cc, rc, ce, re, mat, consts), None

    init = (
        o_t,
        d_t,
        jnp.ones((1, n_pad), dtype),
        jnp.ones((1, n_pad), dtype),
        jnp.zeros((3, n_pad), dtype),
    )
    if vma:
        # Inside shard_map the kernel outputs are varying over the ray
        # axis; mark the scan init AND the (replicated) tables likewise so
        # every kernel operand agrees.  The transpose of pcast-to-varying
        # is a psum over the axis — exactly the cross-shard reduction the
        # table gradients need.
        def to_varying(x):
            missing = tuple(a for a in vma if a not in getattr(jax.typeof(x), "vma", frozenset()))
            return jax.lax.pcast(x, missing, to="varying") if missing else x

        init = jax.tree_util.tree_map(to_varying, init)
        cc, rc, ce, re, mat, consts = (to_varying(x) for x in (cc, rc, ce, re, mat, consts))
    (_, _, _, _, acc), _ = jax.lax.scan(bounce, init, None, length=cfg.max_depth)
    return acc.T[:n]

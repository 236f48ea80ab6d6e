"""Sublane-packed fused bounce kernel (small-scene specialization).

Round-1 profiling showed the fused bounce kernels reach only ~73 GFLOP/s —
one to two orders below the VPU roofline.  Chief suspect: the lane-major
layout keeps every per-ray quantity as a ``(1, B)`` row vector, which
occupies one of eight sublanes of each vector register — 7/8 of VPU
throughput idles.  This module packs rays into FULL ``(8, B)`` tiles
(8 sublanes x 128 lanes all carrying rays) and iterates spheres as SMEM
*scalars* broadcast against the tile:

* no sphere-axis padding at all (the lane kernels pad 3 spheres to 8 rows
  — 62% wasted sweep work on the reference scene),
* every elementwise op in sweep, shadow and shading runs at full VPU
  width,
* the material "gather" is a per-sphere broadcast-select (S tiny), not a
  one-hot MXU matmul.

Scope: hard visibility, const/checker textures, deterministic mirrors,
single shard, sphere count small enough that an O(S) scalar loop per tile
beats the blocked sublane sweep (callers gate on ``MAX_SUB_SPHERES``).
The math is term-for-term the reference's ``NumpyShader.create``
(``/root/reference/ray_tracer/infrastructure/numpy/shader.py:63-112``) —
same provenance comments as :mod:`.pallas_bounce`.

The ``parts`` parameter carves the kernel down for cost attribution
("sweep" / "noshadow" / "shade") — the strip-down experiments VERDICT r1
asked for; production always runs "full".
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
from .pallas_intersect import _round_up
from .shading import AMBIENT, GLINT_EXPONENT, NUDGE, SHADING_EPS

# Above this sphere count the O(S) scalar loop loses to the blocked
# sublane sweep of pallas_bounce (which amortizes over (K, B) tiles).
MAX_SUB_SPHERES = 64

# Depth-fused route (one launch for the whole bounce chain, state in
# VMEM): depth is Python-unrolled in-kernel, so bound BOTH the depth and
# the unrolled sphere-eval count (spheres x depth) to keep compile size
# sane; beyond either, the per-bounce scan below takes over.
MAX_FUSE_DEPTH_HARD = 6
_MAX_FUSE_SPHERE_EVALS = 256

_SUBLANES = 8


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _normalize3(v):
    mag = jnp.sqrt(_dot3(v, v))
    inv = 1.0 / jnp.where(mag == 0, jnp.ones_like(mag), mag)
    return tuple(c * inv for c in v)


def _sphere_t(o, d, cx, cy, cz, r, faraway, dtype):
    """Hit distance of ONE sphere (scalars) against an (8, B) ray tile.

    Plain well-conditioned quadratic — strict ``disc > 0 & t > 0``
    semantics (shape.py:50-51), stable q-form root pairing.
    """
    ocx = o[0] - cx
    ocy = o[1] - cy
    ocz = o[2] - cz
    b = 2.0 * (d[0] * ocx + d[1] * ocy + d[2] * ocz)
    ct = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b * b - 4.0 * ct
    pos = disc > 0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    qroot = -0.5 * (b + jnp.where(b < 0, -sq, sq))
    safe_q = jnp.where(qroot == 0, jnp.ones_like(qroot), qroot)
    other = jnp.where(qroot == 0, jnp.zeros_like(qroot), ct / safe_q)
    t0 = jnp.minimum(qroot, other)
    t1 = jnp.maximum(qroot, other)
    sol = jnp.where((t0 > 0) & (t0 < t1), t0, t1)
    return jnp.where(pos & (sol > 0), sol, jnp.asarray(faraway, dtype))


def _sphere_t_exact(o, d, cx, cy, cz, r, faraway, dtype):
    """Exact-tier distance: compensated |o-c|^2 - r^2 for huge spheres.

    Same compensated forms as pallas_intersect._block_t_exact, but the
    center is a SCALAR so the (hi, lo) split of o - c runs on the tile.
    """
    h, lo = [], []
    for oi, ci in zip(o, (cx, cy, cz)):
        s = oi - ci
        bv = s - oi
        h.append(s)
        lo.append((oi - (s - bv)) + (-ci - bv))
    b = 2.0 * ((d[0] * h[0] + d[1] * h[1] + d[2] * h[2]) + (d[0] * lo[0] + d[1] * lo[1] + d[2] * lo[2]))

    def two_prod(a):
        p = a * a
        factor = 4097.0
        c = a * factor
        hi = c - (c - a)
        low = a - hi
        return p, ((hi * hi - p) + 2.0 * hi * low) + low * low

    p0, e0 = two_prod(h[0])
    p1, e1 = two_prod(h[1])
    p2, e2 = two_prod(h[2])
    r2 = r * r  # scalar; exact split unnecessary at tile width — r is a
    # host scalar, so compute its error term on host? The lane kernels use
    # Dekker on r too; keep parity by the scalar identity below.
    # Dekker twoProd of the scalar radius (exact in f32 host math too).
    rc = r * 4097.0
    rhi = rc - (rc - r)
    rlo = r - rhi
    er = ((rhi * rhi - r2) + 2.0 * rhi * rlo) + rlo * rlo

    def two_sum(a, b_):
        s = a + b_
        bv = s - a
        return s, (a - (s - bv)) + (b_ - bv)

    s1, t1 = two_sum(p0, p1)
    s2, t2 = two_sum(s1, p2)
    s3, t3 = two_sum(s2, -r2)
    corr = (
        (t1 + t2 + t3)
        + (e0 + e1 + e2 - er)
        + 2.0 * (h[0] * lo[0] + h[1] * lo[1] + h[2] * lo[2])
        + (lo[0] * lo[0] + lo[1] * lo[1] + lo[2] * lo[2])
    )
    ct = s3 + corr
    disc = b * b - 4.0 * ct
    pos = disc > 0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    qroot = -0.5 * (b + jnp.where(b < 0, -sq, sq))
    safe_q = jnp.where(qroot == 0, jnp.ones_like(qroot), qroot)
    other = jnp.where(qroot == 0, jnp.zeros_like(qroot), ct / safe_q)
    t0 = jnp.minimum(qroot, other)
    t1_ = jnp.maximum(qroot, other)
    sol = jnp.where((t0 > 0) & (t0 < t1_), t0, t1_)
    return jnp.where(pos & (sol > 0), sol, jnp.asarray(faraway, dtype))


def _sweep_loops(o, d, geom_ref, s_cheap, s_total, faraway, dtype, update):
    """Run ``update(k, t_k, carry)`` for every real sphere (no padding).

    Cheap tier [0, s_cheap): plain math; exact tier [s_cheap, s_total):
    compensated.  Unrolled in Python when small (callers gate on
    MAX_SUB_SPHERES) — scalar reads are static, loop overhead zero.
    """

    def t_of(k, fn):
        cx = geom_ref[k, 0]
        cy = geom_ref[k, 1]
        cz = geom_ref[k, 2]
        r = geom_ref[k, 3]
        return fn(o, d, cx, cy, cz, r, faraway, dtype)

    carry = None
    for k in range(s_cheap):
        carry = update(k, t_of(k, _sphere_t), carry)
    for k in range(s_cheap, s_total):
        carry = update(k, t_of(k, _sphere_t_exact), carry)
    return carry


def _bounce_math(
    o, d, thr, alive,
    geom_ref, mat_ref, const_ref,
    *,
    faraway: float, s_cheap: int, s_total: int, parts: str,
    tex_hw: tuple | None, xi,
):
    """One hard bounce on an (8, B) ray tile — pure tile math, no ref IO.

    Shared by the per-bounce kernel and the depth-fused kernel (which
    loops it with the state in VMEM).  Returns
    ``(acc_add, o_next, d_next, thr_next, alive_next, flat, dww)`` —
    flat/dww are None without an atlas.
    """
    dtype = o[0].dtype
    shape = o[0].shape

    # --- nearest-hit sweep: scalar sphere loop, lowest index wins ties ---
    def near_update(k, t_k, carry):
        if carry is None:
            return t_k, jnp.full(shape, k, jnp.int32)
        tmin, imin = carry
        take = t_k < tmin
        return jnp.where(take, t_k, tmin), jnp.where(take, k, imin)

    tmin, idx = _sweep_loops(o, d, geom_ref, s_cheap, s_total, faraway, dtype, near_update)
    far = jnp.asarray(faraway, dtype)
    hit = (tmin != far).astype(dtype)
    idx = jnp.where(tmin == far, 0, idx)
    coverage = hit * alive
    t_safe = jnp.where(hit > 0, tmin, jnp.ones_like(tmin))

    if parts == "sweep":
        flat = jnp.zeros(shape, jnp.int32) if tex_hw is not None else None
        dww = jnp.zeros(shape, dtype) if tex_hw is not None else None
        acc_add = tuple(tmin * coverage for _ in range(3))  # consume the sweep
        return acc_add, o, d, thr, alive * hit, flat, dww

    # --- material select: per-sphere broadcast select of needed columns ---
    mcols = (_CX, _CY, _CZ, _RAD, _DG, _DCR, _DCG, _DCB, _SG, _ROUGH, _IG, _IOR, _TFW, _TFT, _TFI, _KIND)
    if tex_hw is not None:
        mcols = mcols + (_TID, _TEXH, _TEXW)
    mat = {c: jnp.full(shape, mat_ref[0, c], dtype) for c in mcols}
    for k in range(1, s_total):
        sel = idx == k
        for c in mcols:
            mat[c] = jnp.where(sel, mat_ref[k, c], mat[c])

    def m(col):
        return mat[col]

    p = tuple(o[i] + d[i] * t_safe for i in range(3))  # shader.py:73
    inv_r = 1.0 / m(_RAD)
    center = (m(_CX), m(_CY), m(_CZ))
    normal = tuple((p[i] - center[i]) * inv_r for i in range(3))  # shader.py:74

    def const(i):
        return const_ref[0, i]  # scalar

    light = (const(3), const(4), const(5))
    cam = (const(0), const(1), const(2))
    to_light = _normalize3(tuple(light[i] - p[i] for i in range(3)))  # shader.py:75
    to_cam = _normalize3(tuple(cam[i] - p[i] for i in range(3)))  # shader.py:76
    p_n = tuple(p[i] + normal[i] * NUDGE for i in range(3))  # shader.py:77

    # --- hard shadow: lit iff own sphere nearest along the light ray ---
    if parts in ("full", "shade"):
        if parts == "shade":
            in_light = jnp.ones(shape, dtype)
        else:
            big = jnp.asarray(3.0e38, dtype)

            def shadow_update(k, t_k, carry):
                if carry is None:
                    carry = (jnp.full(shape, big), jnp.full(shape, big))
                t_others, t_self = carry
                is_self = idx == k
                return (
                    jnp.minimum(t_others, jnp.where(is_self, big, t_k)),
                    jnp.where(is_self, jnp.minimum(t_self, t_k), t_self),
                )

            t_others, t_self = _sweep_loops(
                p_n, to_light, geom_ref, s_cheap, s_total, faraway, dtype, shadow_update
            )
            in_light = (t_self <= t_others).astype(dtype)
    else:  # "noshadow"
        in_light = jnp.ones(shape, dtype)

    # --- shading (ops/shading.py term-for-term; provenance there) -------
    n_dot_l = jnp.maximum(_dot3(normal, to_light), 0.0)

    cx_i = jnp.trunc(p[0] * 2.0).astype(jnp.int32) % 2
    cz_i = jnp.trunc(p[2] * 2.0).astype(jnp.int32) % 2
    checker = (cx_i == cz_i).astype(dtype)
    is_checker = m(_KIND) == 1.0
    tex = tuple(jnp.where(is_checker, checker, m(c)) for c in (_DCR, _DCG, _DCB))
    if tex_hw is not None:
        # Image lanes: the kernel computes ONLY the flat texel index
        # (polynomial equirect UV over native extents); the nearest-texel
        # color is gathered OUTSIDE by XLA — no atlas size cap.  The
        # in-kernel diffuse texture is zeroed for those lanes and
        # dww = diffuse_weight * path_weight exported for the external
        # composition (same scheme as the smooth kernels).
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
        flat_raw = m(_TID).astype(jnp.int32) * (th_pad * tw_pad) + tj * tw_pad + ti
        flat = jnp.where(is_image, flat_raw, 0)
        tex = tuple(jnp.where(is_image, jnp.zeros_like(t), t) for t in tex)
    else:
        flat = None

    diffuse_w = n_dot_l * in_light * m(_DG)
    dww = None
    if tex_hw is not None:
        dww = jnp.where(is_image, diffuse_w * thr * coverage, jnp.zeros(shape, dtype))

    dome_up = jnp.maximum(normal[1], 0.0) * const(9)
    dome = (const(6) * dome_up, const(7) * dome_up, const(8) * dome_up)

    L = to_light
    V = to_cam
    H = _normalize3(tuple(L[i] + V[i] for i in range(3)))
    n_dot_v = jnp.clip(_dot3(normal, V), 0.0, 1.0)
    n_dot_h = jnp.clip(_dot3(normal, H), 0.0, 1.0)
    v_dot_h = jnp.clip(_dot3(V, H), 0.0, 1.0)
    n_dot_l_c = jnp.clip(_dot3(normal, L), 0.0, 1.0)
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

    view_angle = jnp.clip(_dot3(normal, to_cam), 0.0, 1.0)
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
    color = tuple(amb + tex[i] * diffuse_w + dome[i] + spec_term + irid[i] for i in range(3))

    w = thr * coverage
    refl_coeff = 0.5 * m(_SG) * in_light  # shader.py:106 split
    thr_next = w * refl_coeff
    alive_next = alive * hit

    ddn = 2.0 * _dot3(d, normal)
    refl = _normalize3(tuple(d[i] - normal[i] * ddn for i in range(3)))

    if xi is not None:
        # Glossy continuation: reflect about a GGX-sampled microfacet
        # (ops/vecmath.ggx_perturb_reflect, term-for-term).  xi comes from
        # the host-side PRNG so renders replay bit-identically to the XLA
        # stochastic path for the same seed.
        xi1, xi2 = xi
        alpha_s = m(_ROUGH) ** 2
        tan2 = (alpha_s**2) * xi1 / jnp.maximum(1.0 - xi1, 1e-8)
        cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t**2))
        phi = (2.0 * jnp.pi) * xi2
        # Branchless tangent frame (vecmath.orthonormal_basis).
        s_sign = jnp.where(normal[2] >= 0, 1.0, -1.0)
        a_b = -1.0 / (s_sign + normal[2])
        b_b = normal[0] * normal[1] * a_b
        t1v = (1.0 + s_sign * normal[0] * normal[0] * a_b, s_sign * b_b, -s_sign * normal[0])
        t2v = (b_b, s_sign + normal[1] * normal[1] * a_b, -normal[1])
        sc = sin_t * jnp.cos(phi)
        ss = sin_t * jnp.sin(phi)
        h = _normalize3(tuple(t1v[i] * sc + t2v[i] * ss + normal[i] * cos_t for i in range(3)))
        dhn = 2.0 * _dot3(d, h)
        r = _normalize3(tuple(d[i] - h[i] * dhn for i in range(3)))
        above = _dot3(r, normal) > 0
        refl = tuple(jnp.where(above, r[i], refl[i]) for i in range(3))

    acc_add = tuple(color[i] * w for i in range(3))
    return acc_add, p_n, refl, thr_next, alive_next, flat, dww


def _bounce_kernel_sub(
    o_ref, d_ref, thr_ref, alive_ref, acc_ref,
    geom_ref, mat_ref, const_ref,
    *xi_and_outs,
    faraway: float, s_cheap: int, s_total: int, parts: str,
    stochastic: bool = False, tex_hw: tuple | None = None,
):
    if stochastic:
        xi_ref, *outs = xi_and_outs
        xi = (xi_ref[0], xi_ref[1])
    else:
        xi = None
        outs = list(xi_and_outs)
    if tex_hw is not None:
        *outs, flat_out, dww_out = outs
    o_out, d_out, thr_out, alive_out, acc_out = outs
    o = (o_ref[0], o_ref[1], o_ref[2])  # (8, B) each
    d = (d_ref[0], d_ref[1], d_ref[2])
    acc_add, o_n, d_n, thr_n, alive_n, flat, dww = _bounce_math(
        o, d, thr_ref[:, :], alive_ref[:, :], geom_ref, mat_ref, const_ref,
        faraway=faraway, s_cheap=s_cheap, s_total=s_total, parts=parts,
        tex_hw=tex_hw, xi=xi,
    )
    for i in range(3):
        acc_out[i] = acc_ref[i] + acc_add[i]
        o_out[i] = o_n[i]
        d_out[i] = d_n[i]
    thr_out[:, :] = thr_n
    alive_out[:, :] = alive_n
    if tex_hw is not None:
        flat_out[:, :] = flat
        dww_out[:, :] = dww


def _trace_kernel_sub_deep(
    o_ref, d_ref, geom_ref, mat_ref, const_ref,
    *xi_and_outs,
    faraway: float, s_cheap: int, s_total: int,
    stochastic: bool = False, tex_hw: tuple | None = None, depth: int,
):
    """Depth-fused hard trace: the whole bounce chain in ONE launch.

    Forward-only (no residuals at all): the ray state stays in VMEM
    across bounces; only acc (and per-depth flat/dww for atlas scenes)
    leaves the kernel.  Same per-bounce math (`_bounce_math`) as the
    scan route.
    """
    if stochastic:
        xi_ref, *outs = xi_and_outs  # (2*depth, 8, B)
    else:
        outs = list(xi_and_outs)
    if tex_hw is not None:
        acc_out, flat_out, dww_out = outs
    else:
        (acc_out,) = outs
    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    dtype = o[0].dtype
    shape = o[0].shape
    thr = jnp.ones(shape, dtype)
    alive = jnp.ones(shape, dtype)
    acc = [jnp.zeros(shape, dtype) for _ in range(3)]
    for dep in range(depth):
        xi = (xi_ref[2 * dep], xi_ref[2 * dep + 1]) if stochastic else None
        acc_add, o, d, thr, alive, flat, dww = _bounce_math(
            o, d, thr, alive, geom_ref, mat_ref, const_ref,
            faraway=faraway, s_cheap=s_cheap, s_total=s_total, parts="full",
            tex_hw=tex_hw, xi=xi,
        )
        for i in range(3):
            acc[i] = acc[i] + acc_add[i]
        if tex_hw is not None:
            flat_out[dep] = flat
            dww_out[dep] = dww
    for i in range(3):
        acc_out[i] = acc[i]


def _geometry_table(scene: Scene, dtype) -> jax.Array:
    """(S, 4) float32 [cx, cy, cz, r] — SMEM-resident, unpadded."""
    sp = scene.spheres
    return jnp.concatenate(
        [jnp.asarray(sp.center, dtype), jnp.asarray(sp.radius, dtype)[:, None]], axis=1
    )


def _consts_row(scene: Scene, dtype) -> jax.Array:
    consts = jnp.zeros((1, _NCONST), dtype)
    consts = consts.at[0, 0:3].set(jnp.asarray(scene.camera.position, dtype))
    consts = consts.at[0, 3:6].set(jnp.asarray(scene.lights.point_position, dtype))
    consts = consts.at[0, 6:9].set(jnp.asarray(scene.lights.dome_color[-1], dtype))
    consts = consts.at[0, 9].set(jnp.sum(jnp.asarray(scene.lights.dome_intensity, dtype)))
    return consts


def trace_fused_sub(
    origin: jax.Array,  # (N, 3) or (3,)
    direction: jax.Array,  # (N, 3) unit — or (3, N) with transposed=True
    scene: Scene,
    cfg,  # RenderConfig
    transposed: bool = False,
    parts: str = "full",
    key: jax.Array | None = None,  # PRNG key -> stochastic glossy bounces
) -> jax.Array:
    """Hard-visibility trace via the sublane-packed bounce kernel."""
    from .pallas_bounce import _ray_state_t

    dtype = cfg.dtype
    # Mosaic requires the trailing block dim divisible by 128: with 8
    # sublane rows the tile must cover >= 1024 rays.  Smaller requested
    # blocks round up (more padding, same semantics).
    block = max(cfg.block_rays, _SUBLANES * 128)
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

    # (3, N) -> (3, 8, M): row-major split of the ray axis; the final acc
    # reshapes back with the exact inverse, so ordering is preserved.
    o3 = o_t.reshape(3, _SUBLANES, m_cols)
    d3 = d_t.reshape(3, _SUBLANES, m_cols)

    geom = _geometry_table(scene, dtype)
    mat = _material_table(scene, dtype)[: scene.spheres.count]  # unpadded
    consts = _consts_row(scene, dtype)
    s_total = scene.spheres.count
    s_cheap = s_total - scene.spheres.n_exact

    atlas = scene.texture_atlas
    textured = atlas.shape[1] > 1 or atlas.shape[2] > 1
    tex_hw = (int(atlas.shape[1]), int(atlas.shape[2])) if textured else None
    texels = jnp.asarray(atlas, dtype).reshape(-1, 3) if textured else None

    stochastic = key is not None and cfg.stochastic_roughness
    vec = pl.BlockSpec((3, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((_SUBLANES, b_cols), lambda i: (0, i), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    depth = cfg.max_depth
    if (
        parts == "full"
        and 2 <= depth <= MAX_FUSE_DEPTH_HARD
        and s_total * depth <= _MAX_FUSE_SPHERE_EVALS
    ):
        # Depth-fused route: the whole trace in ONE launch (state in
        # VMEM, no inter-bounce HBM round trips, no residuals — this
        # path is forward-only).
        kernel_deep = functools.partial(
            _trace_kernel_sub_deep,
            faraway=cfg.faraway, s_cheap=s_cheap, s_total=s_total,
            stochastic=stochastic, tex_hw=tex_hw, depth=depth,
        )

        def stk(rows, space=pltpu.VMEM):
            return pl.BlockSpec((rows, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=space)

        xi_in = ()
        xi_spec = []
        if stochastic:
            # EXACT seed schedule of the scan path, drawn up front.
            from .rng import fold_seed, uniform2

            k = key
            xis = []
            for _ in range(depth):
                k, k_bounce = fold_seed(k, 1), fold_seed(k, 2)
                xi = uniform2(k_bounce, n, dtype)
                if n_pad != n:
                    xi = jnp.concatenate([xi, jnp.full((n_pad - n, 2), 0.5, dtype)], axis=0)
                xis.append(xi.T.reshape(2, _SUBLANES, m_cols))
            xi_in = (jnp.concatenate(xis, axis=0),)
            xi_spec = [stk(2 * depth)]
        tex_specs_d = (stk(depth), stk(depth)) if textured else ()
        tex_shapes_d = (
            (
                jax.ShapeDtypeStruct((depth, _SUBLANES, m_cols), jnp.int32),
                jax.ShapeDtypeStruct((depth, _SUBLANES, m_cols), dtype),
            )
            if textured
            else ()
        )
        outs = pl.pallas_call(
            kernel_deep,
            grid=(m_cols // b_cols,),
            in_specs=[vec, vec, smem, smem, smem] + xi_spec,
            out_specs=(vec,) + tex_specs_d,
            out_shape=(jax.ShapeDtypeStruct((3, _SUBLANES, m_cols), dtype),) + tex_shapes_d,
            interpret=cfg.pallas_interpret,
        )(o3, d3, geom, mat, consts, *xi_in)
        acc = outs[0]
        if textured:
            flats, dwws = outs[1], outs[2]
            for dep in range(depth):
                tex_c = jnp.moveaxis(jnp.take(texels, flats[dep], axis=0), -1, 0)
                acc = acc + tex_c * dwws[dep][None]
        return acc.reshape(3, n_pad).T[:n]

    kernel = functools.partial(
        _bounce_kernel_sub,
        faraway=cfg.faraway,
        s_cheap=s_cheap,
        s_total=s_total,
        parts=parts,
        stochastic=stochastic,
        tex_hw=tex_hw,
    )
    xi_spec = [pl.BlockSpec((2, _SUBLANES, b_cols), lambda i: (0, 0, i), memory_space=pltpu.VMEM)] if stochastic else []
    tex_specs = (lane, lane) if textured else ()
    tex_shapes = (
        (
            jax.ShapeDtypeStruct((_SUBLANES, m_cols), jnp.int32),
            jax.ShapeDtypeStruct((_SUBLANES, m_cols), dtype),
        )
        if textured
        else ()
    )
    bounce_call = pl.pallas_call(
        kernel,
        grid=(m_cols // b_cols,),
        in_specs=[vec, vec, lane, lane, vec, smem, smem, smem] + xi_spec,
        out_specs=(vec, vec, lane, lane, vec) + tex_specs,
        out_shape=(
            jax.ShapeDtypeStruct((3, _SUBLANES, m_cols), dtype),
            jax.ShapeDtypeStruct((3, _SUBLANES, m_cols), dtype),
            jax.ShapeDtypeStruct((_SUBLANES, m_cols), dtype),
            jax.ShapeDtypeStruct((_SUBLANES, m_cols), dtype),
            jax.ShapeDtypeStruct((3, _SUBLANES, m_cols), dtype),
        )
        + tex_shapes,
        interpret=cfg.pallas_interpret,
    )

    def compose_tex(out):
        """Add the image-diffuse term: external nearest-texel gather."""
        if not textured:
            return out
        o3n, d3n, thr_n, alive_n, acc_n, flat, dww = out
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
            out = compose_tex(bounce_call(o3, d3, thr, alive, acc, geom, mat, consts, xi3))
            return out + (k,), None
        o3, d3, thr, alive, acc = carry
        return compose_tex(bounce_call(o3, d3, thr, alive, acc, geom, mat, consts)), None

    init = (
        o3,
        d3,
        jnp.ones((_SUBLANES, m_cols), dtype),
        jnp.ones((_SUBLANES, m_cols), dtype),
        jnp.zeros((3, _SUBLANES, m_cols), dtype),
    )
    if stochastic:
        init = init + (key,)
    final, _ = jax.lax.scan(bounce, init, None, length=cfg.max_depth)
    return final[4].reshape(3, n_pad).T[:n]

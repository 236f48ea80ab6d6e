"""Fully-fused bounce kernel: sweep + shadow + material + shading in ONE
Pallas kernel per bounce.

Profiling the XLA path shows each bounce shatters into ~150 materialized
fusions (hundreds of (N,)-sized HBM round trips); this kernel computes the
entire bounce — nearest-hit sweep (two numeric tiers, see
:mod:`.pallas_intersect`), hard shadow sweep, per-lane material gather (a
one-hot MXU matmul against the (S, 16) material table in VMEM), the full
BRDF stack of ``NumpyShader.create``
(``/root/reference/ray_tracer/infrastructure/numpy/shader.py:63-112``:
ambient + diffuse/texture + dome + GGX specular/glint + iridescence), and
the mirror continuation — per ray tile, touching HBM once per state array.
The bounce state stays in lane-major (3, N) layout across the whole
``lax.scan``; transposition happens once per trace.

Scope (callers gate, :func:`..render.render` falls back to the XLA path
otherwise): hard visibility, single-shard, deterministic mirror bounces,
const/checker textures (no image atlas).  Forward-only — no VJP; training
paths keep the XLA/two-kernel route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene
from .pallas_intersect import (
    _block_t_exact,
    _block_t_fast,
    _pad_rays,
    _round_up,
    _sphere_block,
    _split_tiers,
)
from .shading import AMBIENT, GLINT_EXPONENT, NUDGE, SHADING_EPS

# Material-table column layout (all float32; kind/texture-id/extents stored
# as small exact floats).  _TEXH/_TEXW are the sphere's texture's NATIVE
# (h, w) — UV maps over them, not the padded atlas slot.
_COLS = 19
(
    _CX, _CY, _CZ, _RAD, _DG, _DCR, _DCG, _DCB, _SG, _ROUGH, _IG, _IOR,
    _TFW, _TFT, _TFI, _KIND, _TID, _TEXH, _TEXW,
) = range(_COLS)

# Largest flattened atlas the fused kernels sample in-kernel (texel table
# + one-hot blocks stay comfortably in VMEM); bigger atlases fall back to
# the XLA path.
MAX_FUSED_TEXELS = 1 << 15


def _atan_coeffs():
    """Odd-polynomial coefficients for atan(x)/x on [0, 1] (|err| < 1e-7).

    Mosaic has no atan/atan2 lowering; a degree-10 (in x^2) least-squares
    fit on a dense Chebyshev-spaced grid is plenty for nearest-texel UV.
    """
    import numpy as np

    k = np.arange(4096)
    x = np.cos((2 * k + 1) / (2 * 4096) * np.pi / 2)  # dense on (0, 1]
    y = np.arctan(x) / x
    v = np.vander(x * x, 11, increasing=True)
    c, *_ = np.linalg.lstsq(v, y, rcond=None)
    return tuple(float(ci) for ci in c)


_ATAN_C = _atan_coeffs()


def _atan_unit(x):
    """atan(x) for x in [0, 1] via the polynomial."""
    x2 = x * x
    p = _ATAN_C[-1]
    for c in _ATAN_C[-2::-1]:
        p = p * x2 + c
    return x * p


def _atan2_poly(y, x):
    """Full-quadrant atan2 from the [0,1] polynomial (octant reduction)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.maximum(jnp.where(swap, ay, ax), 1e-30)
    a = _atan_unit(num / den)
    a = jnp.where(swap, (jnp.pi / 2) - a, a)
    a = jnp.where(x < 0, jnp.pi - a, a)
    return jnp.where(y < 0, -a, a)


def _asin_poly(y):
    """asin(y) = atan2(y, sqrt(1 - y^2)) for y in [-1, 1]."""
    y = jnp.clip(y, -1.0, 1.0)
    return _atan2_poly(y, jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0)))

# consts vector layout: camera(3), light(3), dome_color(3), dome_total(1)
_NCONST = 16


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _normalize3(v):
    mag = jnp.sqrt(_dot3(v, v))
    inv = 1.0 / jnp.where(mag == 0, jnp.ones_like(mag), mag)
    return tuple(c * inv for c in v)


def _nearest(o, d, cc_ref, rc_ref, ce_ref, re_ref, faraway, bs_cheap, bs_exact, exact_base, width, dtype):
    def tier(c_ref, r_ref, bs, base, block_t, carry):
        def body(k, carry):
            tmin, imin = carry
            c, r = _sphere_block(c_ref, r_ref, k * bs, bs)
            t = block_t(o, d, c, r, faraway)
            sidx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + (k * bs + base)
            tb = jnp.min(t, axis=0, keepdims=True)
            ib = jnp.min(jnp.where(t == tb, sidx, jnp.iinfo(jnp.int32).max), axis=0, keepdims=True)
            take = tb < tmin
            return jnp.where(take, tb, tmin), jnp.where(take, ib, imin)

        return jax.lax.fori_loop(0, c_ref.shape[0] // bs, body, carry)

    carry = (jnp.full((1, width), jnp.asarray(faraway, dtype)), jnp.zeros((1, width), jnp.int32))
    carry = tier(cc_ref, rc_ref, bs_cheap, 0, _block_t_fast, carry)
    tmin, imin = tier(ce_ref, re_ref, bs_exact, exact_base, _block_t_exact, carry)
    return tmin, jnp.where(tmin == jnp.asarray(faraway, dtype), 0, imin)


def _shadow(o, d, self_idx, cc_ref, rc_ref, ce_ref, re_ref, faraway, bs_cheap, bs_exact, exact_base, width, dtype):
    big = jnp.asarray(3.0e38, dtype)

    def tier(c_ref, r_ref, bs, base, block_t, carry):
        def body(k, carry):
            t_others, t_self = carry
            c, r = _sphere_block(c_ref, r_ref, k * bs, bs)
            t = block_t(o, d, c, r, faraway)
            sidx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + (k * bs + base)
            is_self = sidx == self_idx
            return (
                jnp.minimum(t_others, jnp.min(jnp.where(is_self, big, t), axis=0, keepdims=True)),
                jnp.minimum(t_self, jnp.min(jnp.where(is_self, t, big), axis=0, keepdims=True)),
            )

        return jax.lax.fori_loop(0, c_ref.shape[0] // bs, body, carry)

    carry = (jnp.full((1, width), big), jnp.full((1, width), big))
    carry = tier(cc_ref, rc_ref, bs_cheap, 0, _block_t_fast, carry)
    t_others, t_self = tier(ce_ref, re_ref, bs_exact, exact_base, _block_t_exact, carry)
    return (t_self <= t_others).astype(dtype)


def _bounce_kernel(
    o_ref, d_ref, thr_ref, alive_ref, acc_ref,
    cc_ref, rc_ref, ce_ref, re_ref, mat_ref, const_ref,
    *refs_and_outs,
    faraway: float, bs_cheap: int, bs_exact: int, exact_base: int,
    tex_shape: tuple | None = None,  # (T, Ht, Wt) when sampling in-kernel
):
    if tex_shape is not None:
        tex_ref, o_out, d_out, thr_out, alive_out, acc_out = refs_and_outs
    else:
        tex_ref = None
        o_out, d_out, thr_out, alive_out, acc_out = refs_and_outs
    dtype = rc_ref.dtype
    o = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :])
    d = (d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])
    width = o[0].shape[1]
    thr = thr_ref[:, :]
    alive = alive_ref[:, :]

    tmin, idx = _nearest(o, d, cc_ref, rc_ref, ce_ref, re_ref, faraway, bs_cheap, bs_exact, exact_base, width, dtype)
    hit = (tmin != jnp.asarray(faraway, dtype)).astype(dtype)
    coverage = hit * alive
    t_safe = jnp.where(hit > 0, tmin, jnp.ones_like(tmin))

    # Per-lane material rows: one-hot (S, B) against the (S, C) table on the
    # MXU.  float32 everywhere; the one-hot product is exact.
    s_mat = mat_ref.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (s_mat, width), 0) == idx).astype(dtype)
    mat = jax.lax.dot_general(
        mat_ref[:, :], onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # single-pass bf16 would round
        # material values to 8 mantissa bits (same trap as gather_material)
    )  # (C, B)

    def m(col):
        return mat[col : col + 1, :]  # (1, B)

    p = tuple(o[i] + d[i] * t_safe for i in range(3))  # shader.py:73
    inv_r = 1.0 / m(_RAD)
    center = (m(_CX), m(_CY), m(_CZ))
    normal = tuple((p[i] - center[i]) * inv_r for i in range(3))  # shader.py:74

    def const(i):
        return const_ref[0:1, i : i + 1]  # (1, 1)

    light = (const(3), const(4), const(5))
    cam = (const(0), const(1), const(2))
    to_light = _normalize3(tuple(light[i] - p[i] for i in range(3)))  # shader.py:75
    to_cam = _normalize3(tuple(cam[i] - p[i] for i in range(3)))  # shader.py:76
    p_n = tuple(p[i] + normal[i] * NUDGE for i in range(3))  # shader.py:77

    in_light = _shadow(
        p_n, to_light, idx, cc_ref, rc_ref, ce_ref, re_ref, faraway, bs_cheap, bs_exact, exact_base, width, dtype
    )

    # --- shading (ops/shading.py term-for-term; see provenance there) ---
    n_dot_l = jnp.maximum(_dot3(normal, to_light), 0.0)

    # texture: const color vs checker (kind stored as float 0/1)
    cx = jnp.trunc(p[0] * 2.0).astype(jnp.int32) % 2
    cz = jnp.trunc(p[2] * 2.0).astype(jnp.int32) % 2
    checker = (cx == cz).astype(dtype)
    is_checker = m(_KIND) == 1.0
    tex = tuple(jnp.where(is_checker, checker, m(c)) for c in (_DCR, _DCG, _DCB))

    if tex_ref is not None:
        # Equirectangular image texture (shape.py:68-81): UV from the unit
        # normal via the polynomial atan2/asin, nearest texel fetched with
        # blocked one-hot matmuls against the flattened atlas in VMEM.
        t_cnt, th, tw = tex_shape
        u = 0.5 + _atan2_poly(normal[2], normal[0]) / (2.0 * jnp.pi)
        v = 0.5 - _asin_poly(normal[1]) / jnp.pi
        u = u - jnp.floor(u)
        v = v - jnp.floor(v)
        # Per-lane native extents (exact small floats in the material row).
        th_l = m(_TEXH)
        tw_l = m(_TEXW)
        ti = jnp.clip((u * (tw_l - 1.0)).astype(jnp.int32), 0, (tw_l - 1.0).astype(jnp.int32))
        tj = jnp.clip((v * (th_l - 1.0)).astype(jnp.int32), 0, (th_l - 1.0).astype(jnp.int32))
        flat = m(_TID).astype(jnp.int32) * (th * tw) + tj * tw + ti  # (1, B)
        n_rows = tex_ref.shape[0]
        tb = min(512, n_rows)
        img = jnp.zeros((3, width), dtype)

        def tex_body(k, img):
            block = tex_ref[pl.ds(k * tb, tb), :]  # (TB, 3)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (tb, width), 0) + k * tb == flat
            ).astype(dtype)
            return img + jax.lax.dot_general(
                block, onehot,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        img = jax.lax.fori_loop(0, n_rows // tb, tex_body, img)
        is_image = m(_KIND) == 2.0
        tex = tuple(jnp.where(is_image, img[i : i + 1, :], tex[i]) for i in range(3))

    diffuse_w = n_dot_l * in_light * m(_DG)

    dome_up = jnp.maximum(normal[1], 0.0) * const(9)  # dome_total * max(n_y, 0)
    dome = (const(6) * dome_up, const(7) * dome_up, const(8) * dome_up)

    # GGX + glint (shader.py:246-320)
    L = to_light  # already unit
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

    # iridescence (shader.py:186-232)
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
    refl_coeff = 0.5 * m(_SG) * in_light  # shader.py:106 split, see ops/shading.py
    thr_next = w * refl_coeff
    alive_next = alive * hit

    # mirror continuation (shader.py:151)
    ddn = 2.0 * _dot3(d, normal)
    refl = _normalize3(tuple(d[i] - normal[i] * ddn for i in range(3)))

    for i in range(3):
        acc_out[i : i + 1, :] = acc_ref[i : i + 1, :] + color[i] * w
        o_out[i : i + 1, :] = p_n[i]
        d_out[i : i + 1, :] = refl[i]
    thr_out[:, :] = thr_next
    alive_out[:, :] = alive_next


def _material_table(scene: Scene, dtype) -> jax.Array:
    """(S_pad, 19) float table in kernel column order (kind/texture id and
    native texture extents as small exact floats)."""
    sp = scene.spheres
    hw = jnp.take(scene.texture_hw, sp.texture_id, axis=0)  # (S, 2) int32
    cols = [
        sp.center[:, 0], sp.center[:, 1], sp.center[:, 2], sp.radius,
        sp.diffuse_gain, sp.diffuse_color[:, 0], sp.diffuse_color[:, 1], sp.diffuse_color[:, 2],
        sp.specular_gain, sp.specular_roughness, sp.iridescence_gain, sp.specular_ior,
        sp.thin_film_weight, sp.thin_film_thickness, sp.thin_film_ior,
        sp.texture_kind.astype(dtype),
        sp.texture_id.astype(dtype),
        hw[:, 0].astype(dtype),
        hw[:, 1].astype(dtype),
    ]
    table = jnp.stack([jnp.asarray(c, dtype) for c in cols], axis=1)  # (S, _COLS)
    s_pad = _round_up(table.shape[0], 8)
    if s_pad != table.shape[0]:
        pad = jnp.zeros((s_pad - table.shape[0], _COLS), dtype)
        # padding rows: radius 1 avoids div-by-zero if ever gathered (they
        # cannot win the nearest-hit, so this is belt-and-braces).
        pad = pad.at[:, _RAD].set(1.0)
        table = jnp.concatenate([table, pad], axis=0)
    return table


def _pad_rays_t(o_t: jax.Array, d_t: jax.Array, block: int) -> tuple[jax.Array, jax.Array, int]:
    """Pad lane-major (3, N) ray arrays to a block multiple."""
    n = d_t.shape[1]
    n_pad = _round_up(n, block)
    if n_pad != n:
        extra = n_pad - n
        o_t = jnp.concatenate([o_t, jnp.broadcast_to(o_t[:, :1], (3, extra))], axis=1)
        d_t = jnp.concatenate([d_t, jnp.broadcast_to(d_t[:, :1], (3, extra))], axis=1)
    return o_t, d_t, n


def _ray_state_t(origin, direction, cfg, transposed: bool):
    """Normalize entry rays to padded lane-major (3, N_pad) + count.

    ``transposed=True`` means ``direction`` is already (3, N) — the
    zero-relayout path used by :func:`..render.render`.
    """
    dtype = cfg.dtype
    if transposed:
        d_t = jnp.asarray(direction, dtype)
        o_t = jnp.broadcast_to(jnp.asarray(origin, dtype).reshape(3, -1), d_t.shape)
        return _pad_rays_t(o_t, d_t, cfg.block_rays)
    direction = jnp.asarray(direction, dtype)
    origin = jnp.broadcast_to(jnp.asarray(origin, dtype), direction.shape)
    o, d, n = _pad_rays(origin, direction, cfg.block_rays)
    return o.T, d.T, n


def trace_fused(
    origin: jax.Array,  # (N, 3) or (3,)
    direction: jax.Array,  # (N, 3) unit — or (3, N) with transposed=True
    scene: Scene,
    cfg,  # RenderConfig
    transposed: bool = False,
) -> jax.Array:
    """Hard-visibility trace via the fused bounce kernel; (N, 3) colors."""
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

    # Flattened texel table for in-kernel equirect sampling (real atlases
    # only; callers gate on MAX_FUSED_TEXELS).
    atlas = scene.texture_atlas
    has_tex = atlas.shape[1] > 1 or atlas.shape[2] > 1
    tex_shape = None
    tex_args = ()
    tex_specs = []
    if has_tex:
        t_cnt, th, tw = atlas.shape[0], atlas.shape[1], atlas.shape[2]
        tex_shape = (t_cnt, th, tw)
        texels = jnp.asarray(atlas, dtype).reshape(t_cnt * th * tw, 3)
        rows = _round_up(texels.shape[0], 512)
        if rows != texels.shape[0]:
            texels = jnp.concatenate([texels, jnp.zeros((rows - texels.shape[0], 3), dtype)], axis=0)
        tex_args = (texels,)
        tex_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]

    kernel = functools.partial(
        _bounce_kernel,
        faraway=cfg.faraway,
        bs_cheap=bs_cheap,
        bs_exact=bs_exact,
        exact_base=s_cheap,
        tex_shape=tex_shape,
    )
    block = cfg.block_rays
    lane_spec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    bounce_call = pl.pallas_call(
        kernel,
        grid=(n_pad // block,),
        in_specs=[vec_spec, vec_spec, lane_spec, lane_spec, vec_spec, full, full, full, full, full, full]
        + tex_specs,
        out_specs=(vec_spec, vec_spec, lane_spec, lane_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((3, n_pad), dtype),
            jax.ShapeDtypeStruct((3, n_pad), dtype),
            jax.ShapeDtypeStruct((1, n_pad), dtype),
            jax.ShapeDtypeStruct((1, n_pad), dtype),
            jax.ShapeDtypeStruct((3, n_pad), dtype),
        ),
        interpret=cfg.pallas_interpret,
    )

    def bounce(carry, _):
        o_t, d_t, thr, alive, acc = carry
        return bounce_call(o_t, d_t, thr, alive, acc, cc, rc, ce, re, mat, consts, *tex_args), None

    init = (
        o_t,
        d_t,
        jnp.ones((1, n_pad), dtype),
        jnp.ones((1, n_pad), dtype),
        jnp.zeros((3, n_pad), dtype),
    )
    (_, _, _, _, acc), _ = jax.lax.scan(bounce, init, None, length=cfg.max_depth)
    return acc.T[:n]

"""Fused Pallas TPU kernels for the ray-sphere hot loop.

The reference's innermost kernel is ``NumpySphere.intersect``
(``/root/reference/ray_tracer/infrastructure/numpy/shape.py:28-51``), called
per shape from Python loops — 4.8 M ray-sphere tests per 960x540 frame
(SURVEY §3.6).  The XLA path (:mod:`.intersect`) materializes the full
(N rays x S spheres) tables; these kernels never do: each ray tile loops
over sphere blocks held in VMEM carrying a running nearest-hit reduction,
so HBM traffic is O(N + S) instead of O(N*S) — the difference between
bandwidth-bound and compute-bound at BASELINE config 4 scale
(1920x1080 x 1024 spheres).

Layout: rays live in *lanes*.  Inputs are passed transposed as (3, N) so
per-lane values are (1, B) lane vectors; sphere-block components broadcast
as (K, 1) sublane columns; the (K, B) per-block table reduces over the
sublane axis with no cross-layout relayouts.

Numerics — two tiers, split at scene build (``Spheres.n_exact``,
``scene.py``):

* **cheap tier** (leading rows; ordinary radii/centers): the plain
  float32 quadratic in the well-conditioned ``|o-c|^2 - r^2`` form,
  ~35 flops per ray-sphere test;
* **exact tier** (trailing rows; huge radius or far center, e.g. the
  reference's r=99999 ground sphere, ``main.py:39-43``): the same
  compensated arithmetic as :func:`..ops.intersect.intersect_all_stable`
  — exact (hi, lo) splits of ``o - c`` (Knuth twoSum), compensated squares
  (Dekker twoProd) and the stable q-form root pairing — ~120 flops, which
  is why it only runs on the rows that need it.

Hit semantics are the reference's strict ``disc > 0 & t > 0``
(``shape.py:50-51``) in both tiers.

Gradients: ``nearest_hit_pallas`` carries a custom VJP using the implicit
derivative of the unit-direction quadratic at the winning sphere —
identical (up to rounding) to differentiating the closed-form root, at
O(N) cost.  Visibility (``shadow_hard_pallas``) is a step function;
callers treat it as a constant exactly like the XLA hard path does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import NearestHit
from .vecmath import dot

# Padding geometry: zero radius => disc <= 0 by Cauchy-Schwarz, so the
# strict disc > 0 test can never fire (up to colinear-ray rounding, which
# the far placement makes astronomically unlikely).
_PAD_CENTER_CHEAP = (0.0, -1.0e4, 0.0)
_PAD_CENTER_EXACT = (0.0, -1.0e7, 0.0)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# In-kernel sweep cores (lane-ray layout).
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    bv = s - a
    return s, (a - (s - bv)) + (b - bv)


def _split(a, dtype):
    factor = 4097.0 if dtype == jnp.float32 else 134217729.0
    c = a * factor
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b, dtype):
    p = a * b
    ah, al = _split(a, dtype)
    bh, bl = _split(b, dtype)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _roots(b_coef, c_term, faraway, dtype):
    """Strict-inequality root selection (shape.py:41-51), stable q-form."""
    disc = b_coef * b_coef - 4.0 * c_term
    pos = disc > 0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    qroot = -0.5 * (b_coef + jnp.where(b_coef < 0, -sq, sq))
    safe_q = jnp.where(qroot == 0, jnp.ones_like(qroot), qroot)
    other = jnp.where(qroot == 0, jnp.zeros_like(qroot), c_term / safe_q)
    t0 = jnp.minimum(qroot, other)
    t1 = jnp.maximum(qroot, other)
    sol = jnp.where((t0 > 0) & (t0 < t1), t0, t1)
    return jnp.where(pos & (sol > 0), sol, jnp.asarray(faraway, dtype))


def _block_t_fast(o, d, c, r, faraway):
    """Cheap-tier hit distances: plain well-conditioned quadratic."""
    dtype = r.dtype
    oc = tuple(o[i] - c[i] for i in range(3))  # (K, B)
    b_coef = 2.0 * (d[0] * oc[0] + d[1] * oc[1] + d[2] * oc[2])
    c_term = oc[0] * oc[0] + oc[1] * oc[1] + oc[2] * oc[2] - r * r
    return _roots(b_coef, c_term, faraway, dtype)


def _block_t_exact(o, d, c, r, faraway):
    """Exact-tier hit distances: compensated arithmetic (huge spheres)."""
    dtype = r.dtype
    h = []
    lo = []
    for i in range(3):
        hi_i, lo_i = _two_sum(o[i], -c[i])  # (K, B) exact o - c
        h.append(hi_i)
        lo.append(lo_i)

    b_coef = 2.0 * (
        (d[0] * h[0] + d[1] * h[1] + d[2] * h[2]) + (d[0] * lo[0] + d[1] * lo[1] + d[2] * lo[2])
    )

    p0, e0 = _two_prod(h[0], h[0], dtype)
    p1, e1 = _two_prod(h[1], h[1], dtype)
    p2, e2 = _two_prod(h[2], h[2], dtype)
    pr, er = _two_prod(r, r, dtype)
    s1, t1 = _two_sum(p0, p1)
    s2, t2 = _two_sum(s1, p2)
    s3, t3 = _two_sum(s2, -pr)
    corr = (
        (t1 + t2 + t3)
        + (e0 + e1 + e2 - er)
        + 2.0 * (h[0] * lo[0] + h[1] * lo[1] + h[2] * lo[2])
        + (lo[0] * lo[0] + lo[1] * lo[1] + lo[2] * lo[2])
    )
    c_term = s3 + corr
    return _roots(b_coef, c_term, faraway, dtype)


def _read_rays(o_ref, d_ref):
    o = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :])  # (1, B) each
    d = (d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])
    return o, d


def _sphere_block(c_ref, r_ref, k0, block: int):
    cb = c_ref[pl.ds(k0, block), :]  # (K, 3)
    c = (cb[:, 0:1], cb[:, 1:2], cb[:, 2:3])  # (K, 1) each
    r = r_ref[pl.ds(k0, block), :]  # (K, 1)
    return c, r


def _region_plan(n_rows: int, block_spheres: int) -> tuple[int, int]:
    """(padded rows, block size) for one tier; always at least one block."""
    rows = max(n_rows, 1)
    bs = min(block_spheres, _round_up(rows, 8))
    return _round_up(rows, bs), bs


def _pad_region(center, radius, n_pad: int, pad_center) -> tuple[jax.Array, jax.Array]:
    s = center.shape[0]
    if s == n_pad:
        return center, radius.reshape(-1, 1)
    extra = n_pad - s
    dtype = center.dtype if s else jnp.float32
    pad_c = jnp.broadcast_to(jnp.asarray(pad_center, dtype), (extra, 3))
    center = jnp.concatenate([center, pad_c], axis=0) if s else pad_c
    zeros = jnp.zeros((extra,), radius.dtype if s else jnp.float32)
    radius = jnp.concatenate([radius, zeros], axis=0) if s else zeros
    return center, radius.reshape(-1, 1)


# ---------------------------------------------------------------------------
# Kernel 1: fused nearest-hit (t, idx) over all spheres.
# ---------------------------------------------------------------------------


def _nearest_kernel(
    o_ref, d_ref, cc_ref, rc_ref, ce_ref, re_ref, t_out, idx_out,
    *, faraway: float, bs_cheap: int, bs_exact: int, exact_base: int,
):
    o, d = _read_rays(o_ref, d_ref)
    width = o[0].shape[1]
    dtype = rc_ref.dtype

    def tier(c_ref, r_ref, bs, base, block_t, carry):
        def body(k, carry):
            tmin, imin = carry
            c, r = _sphere_block(c_ref, r_ref, k * bs, bs)
            t = block_t(o, d, c, r, faraway)  # (K, B)
            sidx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + (k * bs + base)
            tb = jnp.min(t, axis=0, keepdims=True)  # (1, B)
            ib = jnp.min(jnp.where(t == tb, sidx, jnp.iinfo(jnp.int32).max), axis=0, keepdims=True)
            take = tb < tmin  # strict: earlier block wins ties (lower index)
            return jnp.where(take, tb, tmin), jnp.where(take, ib, imin)

        return jax.lax.fori_loop(0, c_ref.shape[0] // bs, body, carry)

    carry = (
        jnp.full((1, width), jnp.asarray(faraway, dtype)),
        jnp.zeros((1, width), jnp.int32),
    )
    carry = tier(cc_ref, rc_ref, bs_cheap, 0, _block_t_fast, carry)
    tmin, imin = tier(ce_ref, re_ref, bs_exact, exact_base, _block_t_exact, carry)
    t_out[:, :] = tmin
    idx_out[:, :] = jnp.where(tmin == jnp.asarray(faraway, dtype), 0, imin)


def _pad_rays(o: jax.Array, d: jax.Array, block: int) -> tuple[jax.Array, jax.Array, int]:
    n = d.shape[0]
    n_pad = _round_up(n, block)
    if n_pad != n:
        extra = n_pad - n
        o = jnp.concatenate([o, jnp.broadcast_to(o[:1], (extra, 3))], axis=0)
        d = jnp.concatenate([d, jnp.broadcast_to(d[:1], (extra, 3))], axis=0)
    return o, d, n


def _split_tiers(center, radius, n_exact: int, block_spheres: int):
    """Partition + pad the sphere table into (cheap, exact) tier operands."""
    s = center.shape[0]
    n_exact = min(n_exact, s)
    s_cheap = s - n_exact
    pad_cheap, bs_cheap = _region_plan(s_cheap, block_spheres)
    pad_exact, bs_exact = _region_plan(n_exact, block_spheres)
    cc, rc = _pad_region(center[:s_cheap], radius[:s_cheap], pad_cheap, _PAD_CENTER_CHEAP)
    ce, re = _pad_region(center[s_cheap:], radius[s_cheap:], pad_exact, _PAD_CENTER_EXACT)
    return cc, rc, ce, re, bs_cheap, bs_exact, s_cheap


def _out_struct(shape, dtype, vma):
    """ShapeDtypeStruct carrying varying-manual-axes info when inside
    shard_map (required by the VMA checker for pallas_call outputs)."""
    if vma is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))


def _nearest_call(
    origin: jax.Array,  # (N, 3)
    direction: jax.Array,  # (N, 3)
    center: jax.Array,  # (S, 3)
    radius: jax.Array,  # (S,)
    faraway: float,
    n_exact: int,
    block_rays: int,
    block_spheres: int,
    interpret: bool,
    vma: frozenset | None = None,
) -> tuple[jax.Array, jax.Array]:
    o, d, n = _pad_rays(origin, direction, block_rays)
    cc, rc, ce, re, bs_cheap, bs_exact, s_cheap = _split_tiers(center, radius, n_exact, block_spheres)
    n_pad = d.shape[0]
    grid = (n_pad // block_rays,)

    kernel = functools.partial(
        _nearest_kernel,
        faraway=faraway,
        bs_cheap=bs_cheap,
        bs_exact=bs_exact,
        exact_base=s_cheap,
    )
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cheap-tier table
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # exact-tier table
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _out_struct((1, n_pad), d.dtype, vma),
            _out_struct((1, n_pad), jnp.int32, vma),
        ),
        interpret=interpret,
    )(o.T, d.T, cc, rc, ce, re)
    return t[0, :n], idx[0, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def nearest_hit_pallas_raw(
    origin, direction, center, radius, faraway, n_exact, block_rays, block_spheres, interpret, vma
):
    return _nearest_call(
        origin, direction, center, radius, faraway, n_exact, block_rays, block_spheres, interpret, vma
    )


def _nearest_fwd(origin, direction, center, radius, faraway, n_exact, block_rays, block_spheres, interpret, vma):
    t, idx = _nearest_call(
        origin, direction, center, radius, faraway, n_exact, block_rays, block_spheres, interpret, vma
    )
    return (t, idx), (origin, direction, center, radius, t, idx)


def _nearest_bwd(faraway, n_exact, block_rays, block_spheres, interpret, vma, residuals, cotangents):
    """Implicit-function gradient at the winning sphere.

    The kernel roots the unit-direction quadratic
    ``G(t) = t^2 + 2 (d.(o-c)) t + |o-c|^2 - r^2 = 0`` (the reference bakes
    ``|d| = 1`` in, ``shape.py:34-42``), so the gradients differentiate G —
    not the |d|^2-carrying form — to match AD through the closed form:
        G_t = 2 d.(p-c)                       (using p = o + t d, |d| = 1)
        dt/dc =  (p-c)/(d.(p-c)),  dt/dr = r/(d.(p-c)),
        dt/do = -(p-c)/(d.(p-c)),  dt/dd = -t (o-c)/(d.(p-c)).
    Miss lanes get zero.  O(N) work + one segment-sum scatter into the
    sphere axis.
    """
    origin, direction, center, radius, t, idx = residuals
    g_t, _ = cotangents  # idx is integer — no cotangent

    hit = t != jnp.asarray(faraway, t.dtype)
    t_safe = jnp.where(hit, t, jnp.zeros_like(t))
    g = jnp.where(hit, g_t, jnp.zeros_like(g_t))

    c_win = jnp.take(center, idx, axis=0)  # (N, 3)
    r_win = jnp.take(radius, idx, axis=0)  # (N,)
    p = origin + direction * t_safe[:, None]
    pc = p - c_win
    denom = dot(direction, pc)
    denom = jnp.where(jnp.abs(denom) < 1e-12, jnp.where(denom < 0, -1e-12, 1e-12), denom)
    inv = jnp.where(hit, 1.0 / denom, jnp.zeros_like(denom))

    oc = origin - c_win
    d_o = -pc * (g * inv)[:, None]
    d_d = -oc * (g * inv * t_safe)[:, None]
    gc_rows = pc * (g * inv)[:, None]  # (N, 3) toward winning centers
    gr_rows = r_win * g * inv  # (N,)

    s = center.shape[0]
    d_center = jax.ops.segment_sum(gc_rows, idx, num_segments=s)
    d_radius = jax.ops.segment_sum(gr_rows, idx, num_segments=s)
    return d_o, d_d, d_center, d_radius


nearest_hit_pallas_raw.defvjp(_nearest_fwd, _nearest_bwd)


def nearest_hit_pallas(
    origin: jax.Array,
    direction: jax.Array,
    center: jax.Array,
    radius: jax.Array,
    faraway: float,
    *,
    n_exact: int | None = None,
    block_rays: int = 512,
    block_spheres: int = 32,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> NearestHit:
    """Fused nearest-hit sweep; drop-in for intersect_all + nearest-hit.

    ``n_exact=None`` (the safe default) treats every sphere as exact-tier;
    pass ``scene.spheres.n_exact`` for the fast two-tier split.  ``vma``
    declares the output's varying mesh axes when called inside shard_map
    (e.g. ``{"rays"}``).
    """
    origin = jnp.broadcast_to(origin, direction.shape)
    if n_exact is None:
        n_exact = center.shape[0]
    t, idx = nearest_hit_pallas_raw(
        origin, direction, center, radius, faraway, n_exact, block_rays, block_spheres, interpret,
        frozenset(vma) if vma else None,
    )
    return NearestHit(t=t, idx=idx, hit=t != jnp.asarray(faraway, t.dtype))


# ---------------------------------------------------------------------------
# Kernel 2: fused hard shadow test.
# ---------------------------------------------------------------------------


def _shadow_kernel(
    o_ref, d_ref, self_ref, cc_ref, rc_ref, ce_ref, re_ref, *out_refs,
    faraway: float, bs_cheap: int, bs_exact: int, exact_base: int,
):
    o, d = _read_rays(o_ref, d_ref)
    width = o[0].shape[1]
    dtype = rc_ref.dtype
    self_idx = self_ref[:, :]  # (1, B) int32

    big = jnp.asarray(3.0e38 if dtype == jnp.float32 else 1.0e300, dtype)

    def tier(c_ref, r_ref, bs, base, block_t, carry):
        def body(k, carry):
            t_others, t_self = carry
            c, r = _sphere_block(c_ref, r_ref, k * bs, bs)
            t = block_t(o, d, c, r, faraway)  # (K, B)
            sidx = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + (k * bs + base)
            is_self = sidx == self_idx  # (K, B)
            t_others_b = jnp.min(jnp.where(is_self, big, t), axis=0, keepdims=True)
            t_self_b = jnp.min(jnp.where(is_self, t, big), axis=0, keepdims=True)
            return jnp.minimum(t_others, t_others_b), jnp.minimum(t_self, t_self_b)

        return jax.lax.fori_loop(0, c_ref.shape[0] // bs, body, carry)

    carry = (jnp.full((1, width), big), jnp.full((1, width), big))
    carry = tier(cc_ref, rc_ref, bs_cheap, 0, _block_t_fast, carry)
    t_others, t_self = tier(ce_ref, re_ref, bs_exact, exact_base, _block_t_exact, carry)
    if len(out_refs) == 1:
        # Reference semantics (shader.py:127-128): lit iff own sphere is
        # the nearest hit along the shadow ray, as t_self <= min(others).
        out_refs[0][:, :] = (t_self <= t_others).astype(dtype)
    else:
        # Sphere-sharded mode: emit the pair; the caller pmin-combines the
        # shards before comparing (render._shadow_from_parts).
        out_refs[0][:, :] = t_others
        out_refs[1][:, :] = t_self


def _shadow_call(
    origin, direction, center, radius, self_idx, faraway,
    n_exact, block_rays, block_spheres, interpret, vma, parts: bool,
):
    origin = jnp.broadcast_to(origin, direction.shape)
    if n_exact is None:
        n_exact = center.shape[0]
    o, d, n = _pad_rays(origin, direction, block_rays)
    cc, rc, ce, re, bs_cheap, bs_exact, s_cheap = _split_tiers(center, radius, n_exact, block_spheres)
    n_pad = d.shape[0]
    si = jnp.concatenate(
        [self_idx.astype(jnp.int32), jnp.zeros((n_pad - n,), jnp.int32)]
    ).reshape(1, n_pad)

    kernel = functools.partial(
        _shadow_kernel,
        faraway=faraway,
        bs_cheap=bs_cheap,
        bs_exact=bs_exact,
        exact_base=s_cheap,
    )
    lane = pl.BlockSpec((1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // block_rays,),
        in_specs=[
            pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
            lane,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(lane, lane) if parts else lane,
        out_shape=(
            (_out_struct((1, n_pad), d.dtype, vma), _out_struct((1, n_pad), d.dtype, vma))
            if parts
            else _out_struct((1, n_pad), d.dtype, vma)
        ),
        interpret=interpret,
    )(o.T, d.T, si, cc, rc, ce, re)
    if parts:
        return out[0][0, :n], out[1][0, :n]
    return out[0, :n]


def shadow_hard_pallas(
    origin: jax.Array,  # (N, 3) nudged points
    direction: jax.Array,  # (N, 3) unit dirs to the light
    center: jax.Array,
    radius: jax.Array,
    self_idx: jax.Array,  # (N,) int32 — each lane's own sphere
    faraway: float,
    *,
    n_exact: int | None = None,
    block_rays: int = 512,
    block_spheres: int = 32,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> jax.Array:
    """Fused hard shadow visibility in [0, 1] (step function — no gradient;
    callers stop_gradient the inputs like the XLA hard path's comparison)."""
    return _shadow_call(
        origin, direction, center, radius, self_idx, faraway,
        n_exact, block_rays, block_spheres, interpret, vma, parts=False,
    )


def shadow_parts_pallas(
    origin: jax.Array,
    direction: jax.Array,
    center: jax.Array,  # (S_local, 3) — a sphere SHARD
    radius: jax.Array,
    self_idx: jax.Array,  # (N,) int32 LOCAL index (global minus the shard
    # offset) — the in-kernel iota comparison identifies self within this
    # shard only; out-of-range values never match (not-owned lanes).
    faraway: float,
    *,
    n_exact: int | None = None,
    block_rays: int = 512,
    block_spheres: int = 32,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-shard shadow partials ``(min t over others, t of self)``.

    For sphere-sharded sweeps: each shard reduces over its own spheres; the
    caller pmin-combines both components across the sphere mesh axis and
    compares ``t_self <= t_others`` (ref shader.py:127-128 semantics).  A
    shard not owning ``self_idx`` contributes ``big`` to ``t_self``.
    """
    return _shadow_call(
        origin, direction, center, radius, self_idx, faraway,
        n_exact, block_rays, block_spheres, interpret, vma, parts=True,
    )


# ---------------------------------------------------------------------------
# Compatibility shim: full-table sweep (used only when a caller asks for the
# Pallas backend in a context that still needs (N, S) tables, e.g. smooth
# visibility).  Falls back to the XLA stable sweep — the fused kernels above
# are the real Pallas surface.
# ---------------------------------------------------------------------------


def intersect_all_pallas(origin, direction, center, radius, faraway):
    from .intersect import intersect_all_stable

    return intersect_all_stable(origin, direction, center, radius, faraway)

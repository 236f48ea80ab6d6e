"""Tile-culled bounce path: conservativeness + end-to-end parity.

The candidate lists must be CONSERVATIVE (every sphere any tile ray
actually hits appears in that tile's list) — a false negative would
change the image; false positives only cost speed.
"""

import jax
import jax.numpy as jnp
import numpy as np

from python_ray_tracer_tpu import RenderConfig, render
from python_ray_tracer_tpu.camera import ray_directions
from python_ray_tracer_tpu.models.scenes import random_spheres_scene
from python_ray_tracer_tpu.ops.intersect import intersect_all_stable
from python_ray_tracer_tpu.ops.pallas_culled import candidate_lists, pack_tiles


def test_candidate_lists_conservative_and_useful():
    scene = random_spheres_scene(n_spheres=256, width=96, height=54)
    s_cheap = scene.spheres.count - scene.spheres.n_exact
    center = scene.spheres.center[:s_cheap]
    radius = scene.spheres.radius[:s_cheap]

    dirs = ray_directions(scene.camera, jnp.float32, None)  # (N, 3)
    n = dirs.shape[0]
    block, b_cols = 512, 64
    n_pad = -(-n // block) * block
    dirs_p = jnp.concatenate([dirs, jnp.broadcast_to(dirs[:1], (n_pad - n, 3))], 0)
    o = jnp.broadcast_to(scene.camera.position, dirs_p.shape)
    o3 = pack_tiles(o.T, b_cols)
    d3 = pack_tiles(dirs_p.T, b_cols)

    cand, cnt, cnt_full = candidate_lists(o3, d3, center, radius, b_cols)
    n_tiles = n_pad // block
    assert cand.shape[0] == n_tiles
    # Useful: primary scanline tiles must cull most of the scene.
    loop_len = cnt + cnt_full  # per-tile spheres actually swept
    assert float(loop_len.mean()) < 0.35 * s_cheap, f"no culling: mean {float(loop_len.mean())}/{s_cheap}"

    # Conservative: every sphere ANY ray of the tile hits is a candidate
    # (or the tile overflowed to the full sweep).
    res = intersect_all_stable(o, dirs_p, center, radius, 1e30)  # (N_pad, S)
    hits = np.asarray(res.t) < 1e30
    cand_np, cnt_np = np.asarray(cand), np.asarray(cnt)[0, :]
    full_np = np.asarray(cnt_full)[0, :]
    for t in range(n_tiles):
        if full_np[t] > 0:
            continue  # full sweep — trivially conservative
        rays = np.arange(t * block, (t + 1) * block)  # tiles are contiguous
        tile_hit = np.unique(np.nonzero(hits[rays])[1])
        listed = set(cand_np[t, : cnt_np[t]].tolist())
        missing = [int(s) for s in tile_hit if int(s) not in listed]
        assert not missing, f"tile {t}: hit spheres missing from candidates: {missing}"


def test_ray_sort_keys_bins_and_dead_tail():
    """Dead rays must sort strictly after every live ray; nearby rays
    with similar directions must share a bin key (that is what restores
    tile coherence on reflected bounces)."""
    from python_ray_tracer_tpu.ops.pallas_culled import ray_sort_keys

    bb_lo = jnp.array([-10.0, -10.0, -10.0])
    bb_hi = jnp.array([10.0, 10.0, 10.0])
    o = jnp.array([
        [0.0, 0.01, 0.0, -9.9],   # x: rays 0,1 same cell; 3 far away
        [0.0, 0.0, 0.0, 9.9],
        [0.0, 0.0, 0.0, 0.0],
    ])
    d = jnp.array([
        [1.0, 1.0, -1.0, 1.0],
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
    ])
    live = jnp.array([True, True, True, False])
    keys = np.asarray(ray_sort_keys(o, d, live, bb_lo, bb_hi))
    assert keys[0] == keys[1], "co-located co-directed rays must share a key"
    assert keys[2] != keys[0], "opposite directions must split bins"
    assert keys[3] > keys[:3].max(), "dead rays must sort last"
    # Stable argsort over the keys groups rays 0,1 adjacently.
    order = np.argsort(keys, kind="stable")
    assert abs(int(np.where(order == 0)[0][0]) - int(np.where(order == 1)[0][0])) == 1


def test_culled_render_matches_xla():
    """End-to-end: culled split kernels == XLA sweep at 256 spheres
    (depth 2 routes through the culled path; see MAX_CULL_DEPTH)."""
    scene = random_spheres_scene(n_spheres=256, width=96, height=54)
    cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=2, dtype=jnp.float32, use_pallas=True, pallas_interpret=True, block_rays=512)
    exp = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_x))
    got = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_p))
    diff = np.abs(got - exp)
    assert np.quantile(diff, 0.999) < 1e-3
    assert (diff > 1e-2).mean() < 1e-3


def test_culled_deep_render_matches_xla():
    """Depth 4 exercises the peeled primary bounce + full-sweep secondary
    bounces of trace_fused_culled directly (production routes deep renders
    to the lane kernel, so call the culled path explicitly)."""
    from python_ray_tracer_tpu.camera import ray_directions
    from python_ray_tracer_tpu.ops.pallas_culled import trace_fused_culled

    scene = random_spheres_scene(n_spheres=192, width=64, height=36)
    cfg_x = RenderConfig(max_depth=4, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=4, dtype=jnp.float32, use_pallas=True, pallas_interpret=True, block_rays=512)
    exp = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_x)).reshape(-1, 3)
    dirs = ray_directions(scene.camera, jnp.float32, None)
    got = np.asarray(trace_fused_culled(scene.camera.position, dirs, scene, cfg_p))
    diff = np.abs(got - exp)
    assert np.quantile(diff, 0.999) < 2e-3  # energy-cut tiles may differ sub-quantum
    assert (diff > 1e-2).mean() < 1e-3


def test_beyond_light_occluder_shadows_through_light_cone():
    """The reference's shadow t is unbounded, so an occluder BEYOND the
    light still blocks (shader.py:114-128 quirk).  The culled path's
    light-apex shadow test is a DOUBLE cone precisely to keep such
    occluders in the candidate lists — this pins both the quirk and the
    cone's mirrored nappe (a single-nappe test would silently drop the
    occluder and light the pixel)."""
    from python_ray_tracer_tpu.models.scenes import make_sphere_row
    from python_ray_tracer_tpu.ops.pallas_culled import trace_fused_culled
    from python_ray_tracer_tpu.scene import build_lights, build_spheres, make_scene

    def scene_with(occluder: bool):
        rows = [
            # target sphere, hit by central rays
            make_sphere_row((0.0, 0.25, -3.0), 0.5, diffuse_gain=1.0,
                            diffuse_color=(0.9, 0.2, 0.2), specular_gain=0.2),
            # unrelated lit sphere off to the side
            make_sphere_row((2.5, 0.25, -3.0), 0.5, diffuse_gain=1.0,
                            diffuse_color=(0.2, 0.9, 0.2), specular_gain=0.2),
        ]
        if occluder:
            # on the line (target hit point -> light), BEYOND the light
            rows.append(make_sphere_row((0.0, 0.25, 9.0), 0.5))
        spheres = build_spheres(rows)
        lights = build_lights((0.0, 0.25, 5.0))
        return make_scene(spheres, lights, (0.0, 0.25, 1.0), 96, 54)

    cfg_x = RenderConfig(max_depth=1, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=1, dtype=jnp.float32, use_pallas=True,
                         pallas_interpret=True, block_rays=512)
    for occ in (True, False):
        scene = scene_with(occ)
        exp = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_x)).reshape(-1, 3)
        dirs = ray_directions(scene.camera, jnp.float32, None)
        got = np.asarray(trace_fused_culled(scene.camera.position, dirs, scene, cfg_p))
        assert np.quantile(np.abs(got - exp), 0.999) < 2e-3, f"occluder={occ}"
    # and the quirk itself: the occluded render is darker at the target
    lit = np.asarray(jax.jit(render, static_argnums=1)(scene_with(False), cfg_x))
    shad = np.asarray(jax.jit(render, static_argnums=1)(scene_with(True), cfg_x))
    assert shad.sum() < lit.sum() - 1.0, "beyond-light occluder must shadow"


def test_shadow_candidate_lists_conservative_with_light_cone():
    """Property test of the light-apex double-cone path: for shadow rays
    built EXACTLY like the production glue (origin p_n = p + n*NUDGE,
    direction normalize(light - p) — note: from p, not p_n), every
    sphere any valid ray intersects must appear in its tile's list."""
    from python_ray_tracer_tpu.ops.pallas_culled import _SORT_G
    from python_ray_tracer_tpu.ops.shading import NUDGE

    rng = np.random.default_rng(42)
    s = 192
    center = jnp.asarray(rng.uniform([-8, -1, -8], [8, 6, 8], size=(s, 3)), jnp.float32)
    radius = jnp.asarray(rng.uniform(0.1, 0.6, size=s), jnp.float32)
    light = jnp.asarray([1.5, 7.0, -2.0], jnp.float32)

    n = 16 * 4096
    b_cols = 512 // 8
    # hit points on random sphere surfaces (the real distribution)
    sid = np.sort(rng.integers(0, s, size=n))  # production rays arrive
    # group-sorted by origin cell; sorting by source sphere mimics that
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    p = np.asarray(center)[sid] + np.asarray(radius)[sid, None] * nrm
    p_n = jnp.asarray(p + nrm * NUDGE, jnp.float32)
    d = np.asarray(light)[None, :] - p
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    valid = rng.random(n) < 0.8  # some spent lanes, as in production

    o3 = pack_tiles(p_n.T, b_cols)
    d3 = pack_tiles(d.T, b_cols)
    v3 = pack_tiles(jnp.asarray(valid, jnp.float32)[None], b_cols)[0] > 0
    cand, cnt, cnt_f = candidate_lists(
        o3, d3, center, radius, b_cols, valid=v3, light=light
    )

    res = intersect_all_stable(p_n, d, center, radius, 1e30)
    hits = np.asarray(res.t) < 1e30
    cand_np, cnt_np = np.asarray(cand), np.asarray(cnt)[0]
    full_np = np.asarray(cnt_f)[0]
    block = b_cols * 8
    for t in range(n // block):
        if full_np[t] > 0:
            continue
        rays = np.arange(t * block, (t + 1) * block)
        rays = rays[valid[rays]]
        need = np.unique(np.nonzero(hits[rays])[1])
        listed = set(cand_np[t, : cnt_np[t]].tolist())
        missing = [int(x) for x in need if int(x) not in listed]
        assert not missing, f"tile {t}: shadow candidates missing {missing}"
    # and the light cone must actually tighten: scattered-origin shadow
    # tiles would otherwise list most of the table
    assert float((cnt_np + full_np).mean()) < 0.6 * s


def test_culled_render_supersampled_matches_xla():
    """Jittered supersampling composes with the culled path (each sample
    re-enters the per-bounce sort/cull machinery with different rays)."""
    scene = random_spheres_scene(n_spheres=128, width=64, height=36)
    cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32, samples_per_pixel=2)
    cfg_p = RenderConfig(max_depth=2, dtype=jnp.float32, samples_per_pixel=2,
                         use_pallas=True, pallas_interpret=True, block_rays=512)
    exp = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_x))
    got = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_p))
    diff = np.abs(got - exp)
    assert np.quantile(diff, 0.999) < 2e-3
    assert (diff > 1e-2).mean() < 1e-3


def test_mat_gather_modes_match_xla_glue(monkeypatch):
    """The in-kernel winner-material gathers ("direct" cross-vreg
    take_along_axis and the "piecewise" per-vreg gather+select composite)
    must reproduce the XLA pre-gather to 1 ULP: the gathered VALUES are
    identical bits, but the changed kernel program may fuse/contract
    downstream shading arithmetic differently (measured: one element in
    6912 off by 1 ULP).  See MAT_GATHER_MODE / benchmarks/gather_probe.py."""
    import python_ray_tracer_tpu.ops.pallas_culled as pc
    from python_ray_tracer_tpu.camera import ray_directions

    scene = random_spheres_scene(n_spheres=160, width=64, height=36)
    cfg_p = RenderConfig(max_depth=2, dtype=jnp.float32, use_pallas=True,
                         pallas_interpret=True, block_rays=512)
    dirs = ray_directions(scene.camera, jnp.float32, None)
    outs = {}
    for mode in ("xla", "direct", "piecewise"):
        monkeypatch.setattr(pc, "MAT_GATHER_MODE", mode)
        outs[mode] = np.asarray(
            pc.trace_fused_culled(scene.camera.position, dirs, scene, cfg_p)
        )
    np.testing.assert_allclose(outs["direct"], outs["xla"], rtol=3e-7, atol=1e-9)
    np.testing.assert_allclose(outs["piecewise"], outs["xla"], rtol=3e-7, atol=1e-9)


def test_sort_granularity_invariance(monkeypatch):
    """The per-bounce re-sort granularity must not change the image
    (candidate lists are conservative for ANY order; only the sub-quantum
    tile energy cut sees the permutation).  Pins the planned _SORT_G=64->8
    flip (docs/PERF.md sort-granularity curve)."""
    import python_ray_tracer_tpu.ops.pallas_culled as pc
    from python_ray_tracer_tpu.camera import ray_directions

    scene = random_spheres_scene(n_spheres=128, width=64, height=36)
    cfg_p = RenderConfig(max_depth=3, dtype=jnp.float32, use_pallas=True,
                         pallas_interpret=True, block_rays=512)
    dirs = ray_directions(scene.camera, jnp.float32, None)
    outs = {}
    for g in (64, 32, 8):  # 32 = production; 64/8 bracket it
        monkeypatch.setattr(pc, "_SORT_G", g)
        outs[g] = np.asarray(
            pc.trace_fused_culled(scene.camera.position, dirs, scene, cfg_p)
        )
    for g in (32, 8):
        diff = np.abs(outs[g] - outs[64])
        assert np.quantile(diff, 0.999) < 2e-3  # energy-cut tiles may differ sub-quantum
        assert (diff > 1e-2).mean() < 1e-3


def test_full_sweep_bounce_invariance(monkeypatch):
    """FULL_SWEEP_FROM_BOUNCE must not change the image: skipping the
    candidate build routes live tiles through the kernels' overflow path
    (cnt_full), which sweeps the same spheres in the same order —
    bitwise-identical here (interpret mode; on-chip, cross-program XLA
    fusion of the sort-key glue can flip a group at a bin boundary:
    measured max diff 9.9e-5 over 2/10^6 values at config 4 — far under
    the uint8 quantum)."""
    import python_ray_tracer_tpu.ops.pallas_culled as pc
    from python_ray_tracer_tpu.camera import ray_directions

    scene = random_spheres_scene(n_spheres=128, width=64, height=36)
    cfg_p = RenderConfig(max_depth=3, dtype=jnp.float32, use_pallas=True,
                         pallas_interpret=True, block_rays=512)
    dirs = ray_directions(scene.camera, jnp.float32, None)
    outs = {}
    for fs in (None, 1, 2):
        monkeypatch.setattr(pc, "FULL_SWEEP_FROM_BOUNCE", fs)
        outs[fs] = np.asarray(
            pc.trace_fused_culled(scene.camera.position, dirs, scene, cfg_p)
        )
    np.testing.assert_array_equal(outs[1], outs[None])
    np.testing.assert_array_equal(outs[2], outs[None])


def test_culled_image_atlas_matches_xla():
    """Image textures through the culled path (in-kernel flat texel ids +
    external XLA gather) == the XLA sampler, at an atlas size the fused
    in-VMEM sampler could never hold (one 512x512 texture alone is 8x
    MAX_FUSED_TEXELS) — VERDICT r2 item 4."""
    from python_ray_tracer_tpu.models.scenes import textured_spheres_scene

    scene = textured_spheres_scene(n_spheres=128, width=64, height=36)
    cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=2, dtype=jnp.float32, use_pallas=True,
                         pallas_interpret=True, block_rays=512)
    exp = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_x))
    got = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_p))
    diff = np.abs(got - exp)
    # polynomial atan2/asin vs libm: isolated UV-seam texels may differ
    assert np.quantile(diff, 0.999) < 2e-3
    assert (diff > 1e-2).mean() < 1e-3

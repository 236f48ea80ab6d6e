"""/verify's TPU surfaces in one process: golden render + compiled
shard_map fused-smooth gradient smoke (Pallas under Mosaic, fwd+bwd).

Run on the real chip (the interpret-mode CI exercises different VMA
rules than Mosaic — .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import python_ray_tracer_tpu as prt  # noqa: E402
from python_ray_tracer_tpu.models.scenes import reference_scene  # noqa: E402
from python_ray_tracer_tpu.optim import make_loss_fn, scene_to_params  # noqa: E402
from python_ray_tracer_tpu.parallel import make_mesh, render_sharded  # noqa: E402
from python_ray_tracer_tpu.utils.image import load_png, save_png  # noqa: E402


def main() -> None:
    scene = reference_scene(960, 540, dtype=jnp.float32)
    img = prt.render_jit(scene, prt.RenderConfig(max_depth=6, dtype=jnp.float32))
    save_png(img, "/root/repo/out/verify_render.png")
    diff = np.abs(
        load_png("/root/repo/out/verify_render.png").astype(int)
        - load_png("/root/reference/render.png").astype(int)
    )
    print("golden maxdiff", diff.max(), "frac>0", (diff > 0).mean(), flush=True)  # noqa: T201
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-4

    scene_s = reference_scene(192, 108, dtype=jnp.float32)
    cfg = prt.RenderConfig(
        max_depth=2, dtype=jnp.float32, use_pallas=True, visibility="smooth"
    )
    mesh = make_mesh()  # 1 real chip
    img_s = render_sharded(scene_s, cfg, mesh)
    target = np.asarray(img_s) * 0.85  # perturb off the minimum
    g = jax.grad(make_loss_fn(scene_s, jnp.asarray(target), cfg, mesh=mesh))(
        scene_to_params(scene_s)
    )
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
    print("sharded fused-smooth grad ok on hardware", flush=True)  # noqa: T201


if __name__ == "__main__":
    main()

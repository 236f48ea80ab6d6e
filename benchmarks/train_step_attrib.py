"""Attribute the round-4 fused train step (960x540 depth-3, 1.30 ms).

Differential timing, LICM-safe (changing data through the scan carry,
forced host fetch), three nested scopes:

  kernel — the raw pallas train call on prebuilt packed inputs (o3, d3,
           tgt3, mask, tables): kernel + launch only
  loss   — fused_train_l2 value_and_grad (adds ray-gen packing, table
           builds, custom_vjp scalar multiplies, camera VJP reduces)
  step   — the full Adam step (adds optax update + scan bookkeeping),
           i.e. the headline harness

Usage: python benchmarks/train_step_attrib.py [steps]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from python_ray_tracer_tpu.config import RenderConfig  # noqa: E402
from python_ray_tracer_tpu.models.scenes import reference_scene  # noqa: E402
from python_ray_tracer_tpu.optim import make_loss_fn, scene_to_params  # noqa: E402
from python_ray_tracer_tpu.render import render  # noqa: E402

W, H, DEPTH = 960, 540, 3
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def report(name, elapsed):
    rec = {"bench": "train_step_attrib", "scope": name, "ms": round(elapsed / STEPS * 1e3, 4)}
    print(json.dumps(rec))  # noqa: T201
    return rec


def best_of(run, *args, n=3):
    out = run(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # warm + fetch
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    cfg = RenderConfig(max_depth=DEPTH, dtype=jnp.float32, visibility="smooth",
                       use_pallas=True, block_rays=2048)
    scene = reference_scene(W, H, dtype=jnp.float32)
    target = jnp.clip(render(scene, RenderConfig(max_depth=DEPTH, dtype=jnp.float32)), 0.0, 1.0)

    # --- scope: kernel (raw pallas call on prebuilt packed inputs) -----
    from python_ray_tracer_tpu.camera import ray_directions_t
    from python_ray_tracer_tpu.ops import pallas_bounce_smooth_sub as pbs
    from python_ray_tracer_tpu.ops.pallas_bounce import _material_table, _ray_state_t
    from python_ray_tracer_tpu.ops.pallas_bounce_sub import _SUBLANES, _consts_row, _geometry_table
    from python_ray_tracer_tpu.ops.pallas_intersect import _round_up

    dirs_t = ray_directions_t(scene.camera, cfg.dtype, None)
    o_t, d_t, n = _ray_state_t(scene.camera.position, dirs_t, cfg, True)
    block = max(cfg.block_rays, _SUBLANES * 128)
    n_pad = _round_up(d_t.shape[1], block)
    if n_pad != d_t.shape[1]:
        d_t = jnp.concatenate(
            [d_t, jnp.broadcast_to(d_t[:, :1], (3, n_pad - d_t.shape[1]))], axis=1
        )
    m_cols = n_pad // _SUBLANES
    o3 = jnp.broadcast_to(jnp.asarray(scene.camera.position, cfg.dtype).reshape(3, 1, 1),
                          (3, _SUBLANES, m_cols))
    d3 = d_t.reshape(3, _SUBLANES, m_cols)
    tgt_t = jnp.asarray(target, cfg.dtype).reshape(n, 3).T
    if n_pad != n:
        tgt_t = jnp.concatenate([tgt_t, jnp.zeros((3, n_pad - n), cfg.dtype)], axis=1)
    tgt3 = tgt_t.reshape(3, _SUBLANES, m_cols)
    mask = (jnp.arange(n_pad, dtype=jnp.int32) < n).astype(cfg.dtype).reshape(_SUBLANES, m_cols)
    s_total = scene.spheres.count
    geom = _geometry_table(scene, cfg.dtype)
    mat = _material_table(scene, cfg.dtype)[:s_total]
    consts = _consts_row(scene, cfg.dtype)
    params = (cfg.faraway, s_total - scene.spheres.n_exact, s_total,
              float(cfg.edge_sharpness), float(cfg.shadow_sharpness),
              None, False, False, block, False, None, DEPTH, True)

    @jax.jit
    def kernel_only(d3, tgt3):
        def body(carry, _):
            d3c, acc = carry
            outs = pbs._train_call_sub_deep(params, o3, d3c, tgt3, mask, geom, mat, consts)
            # thread the loss back into the directions so LICM can't hoist
            d3c = d3c + outs[0][0, 0] * 1e-30
            return (d3c, acc + outs[0][0, 0]), None

        (d3c, acc), _ = jax.lax.scan(body, (d3, jnp.zeros((), cfg.dtype)), None, length=STEPS)
        return acc

    report("kernel", best_of(kernel_only, d3, tgt3))

    # --- scope: loss (fused_train_l2 value_and_grad) -------------------
    loss_fn = make_loss_fn(scene, target, cfg)
    params_p = scene_to_params(scene)

    @jax.jit
    def vag_only(p):
        def body(carry, _):
            p, acc = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            # thread grads into params at zero scale: LICM-safe, no Adam
            p = jax.tree_util.tree_map(lambda a, g: a + g * 1e-30, p, grads)
            return (p, acc + loss), None

        (p, acc), _ = jax.lax.scan(body, (p, jnp.zeros(())), None, length=STEPS)
        return acc

    report("loss", best_of(vag_only, params_p))

    # --- scope: step (full Adam, the headline harness) -----------------
    optimizer = optax.adam(1e-3)

    @jax.jit
    def full_step(p, s):
        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = optimizer.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(body, (p, s), None, length=STEPS)
        return losses[-1]

    report("step", best_of(full_step, params_p, optimizer.init(params_p)))


if __name__ == "__main__":
    main()

"""Hardware smoke for the stochastic culled-smooth path (r5 flag gate).

The kernels are interpret-parity-pinned (tests/test_culled_smooth.py::
test_culled_stochastic_matches_blocked); this script is the missing
hardware half: compile the culled stochastic fwd + bwd on the real chip,
check forward/gradient parity vs the (hardware-proven) blocked pair at
the same seed, and time an Adam step both ways.  A pass here is the
flip condition for CULL_SMOOTH_STOCHASTIC in pallas_culled_smooth.py.

Usage: python benchmarks/stoch_cull_smoke.py [n_spheres] [--wh=WxH]
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

from python_ray_tracer_tpu.camera import ray_directions  # noqa: E402
from python_ray_tracer_tpu.config import RenderConfig  # noqa: E402
from python_ray_tracer_tpu.models.scenes import inverse_task_scene  # noqa: E402
from python_ray_tracer_tpu.ops.pallas_bounce_smooth_sub import trace_fused_smooth_sub  # noqa: E402
from python_ray_tracer_tpu.ops.pallas_culled_smooth import trace_culled_smooth  # noqa: E402
from python_ray_tracer_tpu.ops.rng import fold_seed, seed_root  # noqa: E402
from python_ray_tracer_tpu.optim import combine, scene_to_params  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_spheres = int(args[0]) if args else 128
    wh = next((a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--wh=")), "960x540")
    width, height = (int(x) for x in wh.split("x"))

    scene = inverse_task_scene(n_spheres=n_spheres, width=width, height=height,
                               dtype=jnp.float32)
    cfg = RenderConfig(max_depth=3, dtype=jnp.float32, visibility="smooth",
                       edge_sharpness=200.0, shadow_sharpness=200.0,
                       stochastic_roughness=True, rng_seed=7, use_pallas=True)
    key = fold_seed(fold_seed(seed_root(cfg.rng_seed), 0), 4)
    dirs = ray_directions(scene.camera, jnp.float32, None)

    def run(fn, tag):
        t0 = time.perf_counter()
        img = np.asarray(jax.jit(
            lambda p, d: fn(p, d, scene, cfg, key=key))(scene.camera.position, dirs))
        dt = time.perf_counter() - t0
        assert np.isfinite(img).all(), f"{tag}: non-finite forward"
        print(json.dumps({"stage": f"fwd_{tag}", "compile_s": round(dt, 1),
                          "mean": float(img.mean())}), flush=True)
        return img

    img_b = run(trace_fused_smooth_sub, "blocked")
    img_c = run(trace_culled_smooth, "culled")
    fwd_max = float(np.abs(img_c - img_b).max())
    print(json.dumps({"stage": "fwd_parity", "maxdiff": fwd_max}), flush=True)
    assert fwd_max <= 1e-5, fwd_max

    tgt = jnp.clip(jnp.asarray(img_b), 0.0, 1.0) * 0.9
    params = scene_to_params(scene)

    def mkloss(fn):
        def loss(p):
            sc = combine(p, scene)
            img = fn(sc.camera.position, dirs, sc, cfg, key=key)
            return jnp.mean((jnp.clip(img, 0.0, 1.0) - tgt) ** 2)
        return loss

    grads = {}
    times = {}
    for tag, fn in (("blocked", trace_fused_smooth_sub), ("culled", trace_culled_smooth)):
        gfn = jax.jit(jax.grad(mkloss(fn)))
        t0 = time.perf_counter()
        g = gfn(params)
        jax.block_until_ready(g)
        compile_s = time.perf_counter() - t0
        elapsed = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            g = gfn(params)
            float(np.asarray(g["camera.position"][0]))
            elapsed = min(elapsed, time.perf_counter() - t0)
        grads[tag] = {k: np.asarray(v) for k, v in g.items()}
        times[tag] = elapsed
        print(json.dumps({"stage": f"grad_{tag}", "compile_s": round(compile_s, 1),
                          "grad_ms": round(elapsed * 1e3, 3)}), flush=True)

    worst = 0.0
    for k in grads["blocked"]:
        ga, gc = grads["blocked"][k], grads["culled"][k]
        scale = max(np.abs(ga).max(), 1e-9)
        rel = float(np.abs(gc - ga).max() / scale)
        worst = max(worst, rel)
        assert rel <= 1e-3, (k, rel)
    print(json.dumps({
        "bench": "stoch_cull_smoke", "n_spheres": n_spheres, "res": f"{width}x{height}",
        "fwd_maxdiff": fwd_max, "grad_worst_rel": worst,
        "grad_ms_blocked": round(times["blocked"] * 1e3, 3),
        "grad_ms_culled": round(times["culled"] * 1e3, 3),
        "device": str(jax.devices()[0].platform), "ok": True,
    }), flush=True)


if __name__ == "__main__":
    main()

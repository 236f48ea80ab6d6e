"""Device-trace attribution of the culled-smooth Adam step.

Captures a jax.profiler trace of a few 1024-sphere 1080p depth-3 training
steps through the culled smooth path and aggregates device-event
durations by op name — where do the 219 ms/step go (kernel A sweeps, the
fwd/bwd shade pair, candidate builds, sorts/gathers, scatter glue)?

Usage: python benchmarks/culled_smooth_attrib.py [steps]
Prints one JSON line with the top device ops (total ms over the capture).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
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
from python_ray_tracer_tpu.models.scenes import random_spheres_scene  # noqa: E402
from python_ray_tracer_tpu.optim import make_loss_fn, scene_to_params  # noqa: E402
from python_ray_tracer_tpu.render import render  # noqa: E402

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    scene = random_spheres_scene(n_spheres=1024, width=1920, height=1080)
    cfg = RenderConfig(max_depth=3, dtype=jnp.float32, visibility="smooth", use_pallas=True)
    target = jnp.clip(
        render(scene, RenderConfig(max_depth=3, dtype=jnp.float32, use_pallas=True)), 0.0, 1.0
    )
    params = scene_to_params(scene)
    opt = optax.adam(1e-3)
    loss_fn = make_loss_fn(scene, target, cfg)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    s0 = opt.init(params)
    p, s, loss = step(params, s0)
    print("warm loss", float(np.asarray(loss)), flush=True)

    logdir = "/tmp/cs_trace"
    os.system(f"rm -rf {logdir}")
    t0 = time.time()
    with jax.profiler.trace(logdir):
        for _ in range(STEPS):
            p, s, loss = step(p, s)
        float(np.asarray(loss))
    wall = time.time() - t0

    traces = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    agg: dict[str, float] = defaultdict(float)
    cnt: dict[str, int] = defaultdict(int)
    for path in traces:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        # keep only device-side complete events (TPU op track)
        pid_names = {
            p.get("pid"): p.get("args", {}).get("name", "")
            for p in data.get("traceEvents", [])
            if p.get("ph") == "M" and p.get("name") == "process_name"
        }
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pname = pid_names.get(ev.get("pid"), "")
            if "TPU" not in pname and "tpu" not in pname:
                continue
            name = ev.get("name", "?")[:80]
            agg[name] += ev.get("dur", 0) / 1e3  # us -> ms
            cnt[name] += 1

    top = sorted(agg.items(), key=lambda kv: -kv[1])[:24]
    rec = {
        "bench": "culled_smooth_attrib",
        "steps": STEPS,
        "wall_ms_per_step": round(wall / STEPS * 1e3, 1),
        "top_device_ops_ms_total": [
            {"op": k, "ms": round(v, 2), "n": cnt[k]} for k, v in top
        ],
        "n_trace_files": len(traces),
    }
    print(json.dumps(rec), flush=True)  # noqa: T201


if __name__ == "__main__":
    main()

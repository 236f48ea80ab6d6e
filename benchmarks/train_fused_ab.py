"""A/B the single-launch fused train kernel against the two-launch pair.

Variants, same 200-step-scan harness as the headline bench
(``python_ray_tracer_tpu.bench``), 960x540 depth-3 reference scene:

  live    — fused train kernel, forward intermediates live across the
            fwd->bwd boundary (no replay; Mosaic spills to VMEM)
  replay  — fused train kernel, only (o, d, thr, alive, idx, hit, clear)
            kept per bounce; the adjoint re-derives the rest (the
            two-launch pair's strategy, minus the HBM round trip)
  pair    — the round-3 two-launch deep fwd/bwd custom-VJP route
            (fused-train routing disabled)

Usage: python benchmarks/train_fused_ab.py [variant ...] [--steps N]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = 200
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])
    variants = args or ["live", "replay", "pair"]

    import python_ray_tracer_tpu.render  # noqa: F401  (package attr `render` is the function)
    render_mod = sys.modules["python_ray_tracer_tpu.render"]
    from python_ray_tracer_tpu import bench
    from python_ray_tracer_tpu.ops import pallas_bounce_smooth_sub as pbs

    orig_ok = render_mod.fused_train_l2_ok
    for variant in variants:
        if variant == "pair":
            render_mod.fused_train_l2_ok = lambda *a: False
        else:
            render_mod.fused_train_l2_ok = orig_ok
            pbs.TRAIN_SAVE_MODE = variant
        rec = bench.main(steps=steps)
        rec["variant"] = variant
        print(json.dumps(rec))  # noqa: T201
    render_mod.fused_train_l2_ok = orig_ok


if __name__ == "__main__":
    main()

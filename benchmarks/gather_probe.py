"""Probe: can Mosaic do the material take IN-KERNEL, and how fast?

The culled path's last big glue cost (docs/PERF.md) is the winner-material
row take — `jnp.take(mat16, idx, axis=0)` on ~2M per-lane winner indices,
11.2 ms reflected + 3.7 ms primary per config-4 frame, row-count-bound
like every XLA gather on this chip (~92 M rows/s).

If Mosaic lowers `jnp.take_along_axis` along lanes (tpu.DynamicGatherOp),
the shade kernel can gather the 12 material columns itself from a VMEM
(12, S) table — the winner index is ALREADY in-kernel — killing both the
XLA gather and the (12, 8, M) HBM operand.

Stages:
  1. lowering probes (tiny kernels, compile-only): which gather shapes
     does this jax/libtpu accept?
  2. timed A/B at config-4 scale (S=1024, 2M rays, 12 channels):
     XLA take vs the best in-kernel formulation.

    python benchmarks/gather_probe.py [--stage 1|2|all]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

INTERPRET = False  # set by --interpret for a CPU smoke run


def _call(*a, **kw):
    return pl.pallas_call(*a, interpret=INTERPRET, **kw)


def _try(name: str, fn) -> bool:
    try:
        fn()
        print(json.dumps({"probe": name, "ok": True}), flush=True)  # noqa: T201
        return True
    except Exception as e:  # noqa: BLE001 — report the Mosaic error verbatim
        msg = str(e).splitlines()[0][:160]
        print(json.dumps({"probe": name, "ok": False, "err": msg}), flush=True)  # noqa: T201
        return False


def stage1() -> dict[str, bool]:
    """Compile-only lowering probes."""
    res = {}

    def lane_gather_128():
        def k(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

        x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        i = jnp.zeros((8, 128), jnp.int32)
        out = _call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(x, i)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x)[:, :1] * np.ones((1, 128)))

    res["lane_gather_8x128"] = _try("lane_gather_8x128", lane_gather_128)

    def lane_gather_1024():
        # cross-vreg: indices span 8 lane-vregs
        def k(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

        x = jnp.arange(8 * 1024, dtype=jnp.float32).reshape(8, 1024)
        i = jnp.full((8, 1024), 777, jnp.int32)
        out = _call(
            k, out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.float32)
        )(x, i)
        np.testing.assert_allclose(np.asarray(out)[:, 0], np.asarray(x)[:, 777])

    res["lane_gather_8x1024"] = _try("lane_gather_8x1024", lane_gather_1024)

    def sublane_gather():
        def k(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

        x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        i = jnp.ones((8, 128), jnp.int32)
        out = _call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(x, i)
        np.testing.assert_allclose(np.asarray(out)[0], np.asarray(x)[1])

    res["sublane_gather_8x128"] = _try("sublane_gather_8x128", sublane_gather)

    def lane_gather_wide_table():
        # what the shade kernel wants directly: (8, S) table row gathered
        # by (8, B) indices with B != S
        def k(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

        x = jnp.arange(8 * 1024, dtype=jnp.float32).reshape(8, 1024)
        i = jnp.full((8, 256), 777, jnp.int32)
        out = _call(
            k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32)
        )(x, i)
        np.testing.assert_allclose(np.asarray(out)[:, 0], np.asarray(x)[:, 777])

    res["lane_gather_wide_table"] = _try("lane_gather_wide_table", lane_gather_wide_table)

    def broadcast_row_gather():
        # the composite the shade kernel would actually use: out[s, l] =
        # row[idx[s, l]] for a (1024,) table row, via 8 per-vreg gathers
        # + selects on idx // 128.
        def k(row_ref, i_ref, o_ref):
            row = row_ref[...]  # (8, 1024) — row replicated on sublanes
            idx = i_ref[...]  # (8, B)
            hi, lo = idx // 128, idx % 128
            acc = jnp.zeros(idx.shape, row.dtype)
            for kk in range(8):
                piece = jax.lax.broadcast_in_dim(
                    row[0, kk * 128 : (kk + 1) * 128], idx.shape[:1] + (128,), (1,)
                )
                tiled = jnp.concatenate([piece] * (idx.shape[1] // 128), axis=1)
                g = jnp.take_along_axis(tiled, lo, axis=1)
                acc = jnp.where(hi == kk, g, acc)
            o_ref[...] = acc

        row = jnp.arange(1024, dtype=jnp.float32)
        rows = jnp.broadcast_to(row, (8, 1024))
        i = jnp.full((8, 256), 900, jnp.int32)
        out = _call(
            k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32)
        )(rows, i)
        np.testing.assert_allclose(np.asarray(out), 900.0)

    res["broadcast_row_gather"] = _try("broadcast_row_gather", broadcast_row_gather)
    return res


def _timeit(fn, *args, iters: int = 50) -> float:
    """Best-of-3 timed scans, changing data threaded through the carry."""

    @jax.jit
    def run(a0, rest):
        def body(carry, _):
            out = fn(carry, *rest)
            # fold output back into the carry so nothing hoists (min with
            # 0 resists constant folding, unlike * 0)
            dep = jnp.minimum(out.ravel()[0].astype(carry.dtype), 0)
            return carry + 1 + dep, None

        c, _ = jax.lax.scan(body, a0, None, length=iters)
        return c

    a0, rest = args[0], args[1:]
    float(np.asarray(run(a0, rest)).ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run(a0, rest)).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def stage2(n_rays: int = 2 * 1024 * 1024, s: int = 1024, chans: int = 12) -> None:
    """Timed A/B: XLA take vs in-kernel gather at config-4 scale."""
    key = jax.random.PRNGKey(0)
    mat = jax.random.uniform(key, (s, 16), jnp.float32)
    m = n_rays // 8
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (8, m), 0, s, jnp.int32)

    def xla_take(idx, mat):
        idx = jnp.abs(idx) % s  # consume the carry perturbation
        return jnp.moveaxis(jnp.take(mat[:, :chans], idx, axis=0), -1, 0)

    t = _timeit(xla_take, idx0, mat)
    print(json.dumps({"probe": "xla_take_ms", "ms": round(t * 1e3, 3)}), flush=True)  # noqa: T201

    # In-kernel: grid over ray tiles; whole (chans, s) table in VMEM per
    # tile; per-128 broadcast-gather-select composite per channel.
    blk = 2048

    def kern(mat_ref, i_ref, o_ref):
        # mirrors ops/pallas_culled.py mat_mode="piecewise" exactly:
        # (8, 128)-vreg gathers with indices < 128 by construction
        idx = jnp.abs(i_ref[...]) % s
        hi, lo = idx // 128, idx % 128
        for c in range(chans):
            row = mat_ref[c, :]  # (s,)
            acc = jnp.zeros(idx.shape, jnp.float32)
            for kk in range(s // 128):
                piece = jax.lax.broadcast_in_dim(
                    row[kk * 128 : (kk + 1) * 128], (8, 128), (1,)
                )
                cols = [
                    jnp.take_along_axis(piece, lo[:, c0 : c0 + 128], axis=1)
                    for c0 in range(0, blk, 128)
                ]
                g = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)
                acc = jnp.where(hi == kk, g, acc)
            o_ref[c, :, :] = acc

    mat_t = jnp.asarray(mat[:, :chans].T)  # (chans, s)

    def pallas_take(idx, mat_t):
        return _call(
            kern,
            grid=(m // blk,),
            in_specs=[
                pl.BlockSpec((chans, s), lambda i: (0, 0)),
                pl.BlockSpec((8, blk), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((chans, 8, blk), lambda i: (0, 0, i)),
            out_shape=jax.ShapeDtypeStruct((chans, 8, m), jnp.float32),
        )(mat_t, idx)

    # parity first
    a = np.asarray(xla_take(idx0, mat))
    b = np.asarray(pallas_take(idx0, mat_t))
    np.testing.assert_allclose(a, b)
    t = _timeit(pallas_take, idx0, mat_t)
    print(json.dumps({"probe": "pallas_take_piecewise_ms", "ms": round(t * 1e3, 3)}), flush=True)  # noqa: T201

    def kern_d(mat_ref, i_ref, o_ref):
        # the "direct" form: one cross-vreg lane gather per channel
        idx = jnp.abs(i_ref[...]) % s
        for c in range(chans):
            rb = jax.lax.broadcast_in_dim(mat_ref[c, :], (8, s), (1,))
            o_ref[c, :, :] = jnp.take_along_axis(rb, idx, axis=1)

    def pallas_take_d(idx, mat_t):
        return _call(
            kern_d,
            grid=(m // blk,),
            in_specs=[
                pl.BlockSpec((chans, s), lambda i: (0, 0)),
                pl.BlockSpec((8, blk), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((chans, 8, blk), lambda i: (0, 0, i)),
            out_shape=jax.ShapeDtypeStruct((chans, 8, m), jnp.float32),
        )(mat_t, idx)

    try:
        b = np.asarray(pallas_take_d(idx0, mat_t))
        np.testing.assert_allclose(a, b)
        t = _timeit(pallas_take_d, idx0, mat_t)
        print(json.dumps({"probe": "pallas_take_direct_ms", "ms": round(t * 1e3, 3)}), flush=True)  # noqa: T201
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": "pallas_take_direct_ms", "err": str(e).splitlines()[0][:160]}), flush=True)  # noqa: T201


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=["1", "2", "all"])
    ap.add_argument("--rays", type=int, default=2 * 1024 * 1024)
    ap.add_argument(
        "--interpret", action="store_true",
        help="Pallas interpreter mode (CPU correctness smoke only)",
    )
    args = ap.parse_args()
    global INTERPRET  # noqa: PLW0603 — one-shot CLI switch
    INTERPRET = args.interpret
    if args.stage in ("1", "all"):
        res = stage1()
        if args.stage == "all" and not res.get("lane_gather_8x128"):
            print(json.dumps({"skip_stage2": "no lane gather support"}), flush=True)  # noqa: T201
            return
    if args.stage in ("2", "all"):
        stage2(n_rays=args.rays)


if __name__ == "__main__":
    main()

"""Probe: what does re-binning 2M rays cost on the real TPU?

Measures (a) argsort of 2^21 uint32 keys, (b) sort_key_val with fused
value permutation of the full per-ray bounce state (11 f32 + 1 i32),
(c) the take-along gather alternative.  LICM-safe: keys depend on the
scan carry; results force a host fetch.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 21  # ~2.07M rays of config 4, padded


def timed(fn, label, reps=3):
    out = None
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = time.perf_counter() - t0
        print(f"{label} rep{r}: {dt*1e3:.2f} ms total")
    return out


def main():
    print("devices:", jax.devices())
    iters = 20
    key_bits = jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(2654435769)

    @jax.jit
    def bench_argsort(seed):
        def body(c, _):
            keys = (key_bits ^ c) >> jnp.uint32(18)  # ~14-bit bin keys
            order = jnp.argsort(keys)
            return c + order[0].astype(jnp.uint32), None

        c, _ = jax.lax.scan(body, seed, None, length=iters)
        return c

    @jax.jit
    def bench_sortkv(seed):
        state = [jnp.full((N,), jnp.float32(i)) for i in range(11)]
        pix = jnp.arange(N, dtype=jnp.int32)

        def body(carry, _):
            c, state, pix = carry
            keys = (key_bits ^ c) >> jnp.uint32(18)
            out = jax.lax.sort([keys] + state + [pix], num_keys=1)
            state2 = [s + 1.0 for s in out[1:12]]
            return (c + out[0][0], state2, out[12]), None

        (c, state, pix), _ = jax.lax.scan(body, (seed, state, pix), None, length=iters)
        return c

    @jax.jit
    def bench_argsort_take(seed):
        state = [jnp.full((N,), jnp.float32(i)) for i in range(11)]

        def body(carry, _):
            c, state = carry
            keys = (key_bits ^ c) >> jnp.uint32(18)
            order = jnp.argsort(keys)
            state2 = [jnp.take(s, order) + 1.0 for s in state]
            return (c + order[0].astype(jnp.uint32), state2), None

        (c, state), _ = jax.lax.scan(body, (seed, state), None, length=iters)
        return c

    t0 = time.perf_counter()
    r = timed(lambda: bench_argsort(jnp.uint32(1)), "argsort-only(x20)")
    r = timed(lambda: bench_sortkv(jnp.uint32(1)), "sort_key_val 12 operands(x20)")
    r = timed(lambda: bench_argsort_take(jnp.uint32(1)), "argsort+11 takes(x20)")
    print("total", time.perf_counter() - t0)


if __name__ == "__main__":
    main()

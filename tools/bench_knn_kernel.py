"""Standalone TPU timing for the Pallas kNN kernel: events_per_program
sweep + XLA baseline, all in one process (carry-threaded scan so nothing
hoists).  Prints one JSON line per variant."""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, L, D, K = 128, 128, 3, 8
N_INNER = 50
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from graphnet_tpu.ops.knn import _knn_graph_xla
    from graphnet_tpu.ops.knn_pallas import knn_graph_pallas

    rng = np.random.default_rng(0)
    coords = jnp.asarray(
        rng.standard_normal((B, L, D)).astype(np.float32)
    )
    lengths = rng.integers(L // 2, L + 1, size=B)
    mask = jnp.asarray(np.arange(L)[None, :] < lengths[:, None])

    def timed(fn):
        @jax.jit
        def many(c):
            def one(cc, _):
                idx, em = fn(cc)
                # thread results back into the carry so nothing hoists
                shift = (
                    em.sum().astype(jnp.float32)
                    + idx.sum().astype(jnp.float32)
                ) * 1e-12
                return cc + shift, None

            out, _ = jax.lax.scan(one, c, None, length=N_INNER)
            return out

        c = coords
        c = many(c)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        for _ in range(REPS):
            c = many(c)
        jax.block_until_ready(c)
        return (time.perf_counter() - t0) / (REPS * N_INNER) * 1e3

    for bb in (1, 2, 4, 8, 16):
        ms = timed(
            functools.partial(
                lambda c, bb: knn_graph_pallas(
                    c, mask, k=K, tile=L, events_per_program=bb
                ),
                bb=bb,
            )
        )
        print(
            json.dumps({"variant": f"pallas_bb{bb}", "ms": round(ms, 4)}),
            flush=True,
        )
    ms = timed(lambda c: _knn_graph_xla(c, mask, K))
    print(json.dumps({"variant": "xla", "ms": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()

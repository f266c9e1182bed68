"""Real-TPU check of fused_edgeconv_knn: Mosaic compile, parity with the
separate-kernels composition, and in-model forward/step timing."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, L, D, K = 128, 128, 4, 8


def main():
    import jax
    import jax.numpy as jnp

    from graphnet_tpu.ops.edgeconv_pallas import (
        fused_edgeconv,
        fused_edgeconv_knn,
    )
    from graphnet_tpu.ops.knn import _knn_graph_xla

    rng = np.random.default_rng(0)
    H1, H2 = 336, 256
    a = jnp.asarray(rng.standard_normal((B, L, H1)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B, L, H1)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, L, (B, L, K)).astype(np.int32))
    lengths = rng.integers(L // 2, L + 1, size=B)
    mask = jnp.asarray(np.arange(L)[None, :] < lengths[:, None])
    em = (
        jnp.asarray(rng.random((B, L, K)) > 0.2)
        & mask[:, :, None]
        & jnp.take_along_axis(
            jnp.broadcast_to(mask[:, None, :], (B, L, L)), idx, axis=2
        )
    )
    w2 = jnp.asarray(
        rng.standard_normal((H1, H2)).astype(np.float32) * 0.05
    )
    b2 = jnp.asarray(rng.standard_normal((H2,)).astype(np.float32))

    fused = jax.jit(
        lambda *args: fused_edgeconv_knn(*args, "add", 0.0, K, 0, 3)
    )
    out, nidx, nem = fused(a, b, idx, em, mask, w2, b2)
    jax.block_until_ready(out)
    print("compiled OK", flush=True)

    out_ref = jax.jit(
        lambda *args: fused_edgeconv(*args, 128, "add", 0.0)
    )(a, b, idx, em, w2, b2)
    ridx, rem = _knn_graph_xla(out_ref[..., 0:3], mask, K)

    err = float(
        jnp.abs(out - out_ref).max() / (jnp.abs(out_ref).max() + 1e-9)
    )
    nem_np, rem_np = np.asarray(nem), np.asarray(rem)
    nidx_np, ridx_np = np.asarray(nidx), np.asarray(ridx)
    mask_agree = bool((nem_np == rem_np).all())
    set_mismatches = 0
    for bi in range(B):
        for i in range(L):
            if set(nidx_np[bi, i][nem_np[bi, i]]) != set(
                ridx_np[bi, i][rem_np[bi, i]]
            ):
                set_mismatches += 1
    print(
        json.dumps(
            {
                "out_rel_err": err,
                "edge_mask_agree": mask_agree,
                "neighbor_set_mismatches": set_mismatches,
            }
        ),
        flush=True,
    )

    # timing: fused vs separate, 200 reps under one jit each
    def many_fused(a, b, idx, em, mask, w2, b2):
        def one(c, _):
            aa, s = c
            o, ni, ne = fused_edgeconv_knn(
                aa, b, idx, em, mask, w2, b2, "add", 0.0, K, 0, 3
            )
            return (aa + 1e-9 * o[..., :1], s + o.sum()), None

        (aa, s), _ = jax.lax.scan(one, (a, 0.0), None, length=50)
        return s

    def many_sep(a, b, idx, em, mask, w2, b2):
        def one(c, _):
            aa, s = c
            o = fused_edgeconv(aa, b, idx, em, w2, b2, 128, "add", 0.0)
            ni, ne = _knn_graph_xla(o[..., 0:3], mask, K)
            return (
                aa + 1e-9 * o[..., :1],
                s + o.sum() + ne.sum().astype(jnp.float32),
            ), None

        (aa, s), _ = jax.lax.scan(one, (a, 0.0), None, length=50)
        return s

    from graphnet_tpu.ops.knn import knn_graph as auto_knn

    def many_sep_pallas(a, b, idx, em, mask, w2, b2):
        def one(c, _):
            aa, s = c
            o = fused_edgeconv(aa, b, idx, em, w2, b2, 128, "add", 0.0)
            ni, ne = auto_knn(o[..., 0:3], mask, K)
            return (
                aa + 1e-9 * o[..., :1],
                s + o.sum() + ne.sum().astype(jnp.float32),
            ), None

        (aa, s), _ = jax.lax.scan(one, (a, 0.0), None, length=50)
        return s

    for name, fn in (
        ("fused_knn", many_fused),
        ("separate_pallas_knn", many_sep_pallas),
        ("separate_xla_knn", many_sep),
    ):
        f = jax.jit(fn)
        s = f(a, b, idx, em, mask, w2, b2)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(3):
            s = f(a, b, idx, em, mask, w2, b2)
        jax.block_until_ready(s)
        ms = (time.perf_counter() - t0) / (3 * 50) * 1e3
        print(
            json.dumps({"variant": name, "ms_per_layer": round(ms, 4)}),
            flush=True,
        )


if __name__ == "__main__":
    main()

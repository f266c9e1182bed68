"""Sweep flash-attention (Lp, tq, ts) configs at the DeepIce post-cls
shape (B=16, H=12, L=769, hd=32, bf16), fwd+bwd per layer, scan-timed."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from graphnet_tpu.ops.flash_attention import flash_attention

print(json.dumps({"backend": jax.default_backend()}), flush=True)

B, H, L, hd = 16, 12, 769, 32
N_INNER = 16
rng = np.random.default_rng(0)
q = jnp.asarray(
    rng.standard_normal((B, H, L, hd)), jnp.bfloat16
) * hd**-0.5
k = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.bfloat16)
mask = jnp.asarray(rng.random((B, L)) > 0.1)
mask = mask.at[:, 0].set(True)


def pad_to(t, Lp, axis=2):
    pad = [(0, 0)] * t.ndim
    pad[axis] = (0, Lp - t.shape[axis])
    return jnp.pad(t, pad)


CONFIGS = [
    (1024, 1024, 512),   # current _pick_pad choice
    (1024, 512, 512),
    (1024, 512, 1024),
    (1024, 256, 1024),
    (896, 896, 896),
    (896, 128, 896),
    (896, 256, 896),     # tq=256 divides 896? 896%256=128 -> skip below
]

for Lp, tq, ts in CONFIGS:
    if Lp % tq or Lp % ts:
        continue
    qp, kp, vp = (pad_to(t, Lp) for t in (q, k, v))
    mp = pad_to(mask, Lp, axis=1)

    @jax.jit
    def step_scan(args, tq=tq, ts=ts):
        qp, kp, vp = args

        def body(c, _):
            q_, k_, v_ = c

            def loss_fn(trip):
                out = flash_attention(
                    trip[0], trip[1], trip[2], mp, scale=1.0,
                    tq=tq, ts=ts,
                )
                return (out.astype(jnp.float32) ** 2).mean()

            loss, g = jax.value_and_grad(loss_fn)((q_, k_, v_))
            c2 = tuple(
                t - (1e-9 * gg).astype(t.dtype) for t, gg in zip(c, g)
            )
            return c2, loss

        return jax.lax.scan(body, args, None, length=N_INNER)

    try:
        out = step_scan((qp, kp, vp))
        _ = float(out[1][-1])
        t0 = time.perf_counter()
        reps = 3
        for _i in range(reps):
            out = step_scan((qp, kp, vp))
        _ = float(out[1][-1])
        dt = (time.perf_counter() - t0) / (reps * N_INNER) * 1e3
        print(
            json.dumps(
                {"Lp": Lp, "tq": tq, "ts": ts, "ms": round(dt, 3)}
            ),
            flush=True,
        )
    except Exception as exc:  # noqa: BLE001 — report and keep sweeping
        print(
            json.dumps(
                {"Lp": Lp, "tq": tq, "ts": ts,
                 "error": str(exc)[-300:]}
            ),
            flush=True,
        )

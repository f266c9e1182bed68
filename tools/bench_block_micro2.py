"""Follow-up block microbench: isolate the Mlp's exact-erf GELU cost,
the bare GEMM ceiling, and the attention projection cost at the DeepIce
shape (see bench_block_micro.py for protocol)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

print(json.dumps({"backend": jax.default_backend()}), flush=True)

B, L, D, H = 16, 769, 384, 12
N_INNER = 16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
key = jax.random.PRNGKey(0)


def bench(name, scan_fn, init):
    out = scan_fn(init)
    _ = float(out[1][-1])
    t0 = time.perf_counter()
    reps = 3
    for _i in range(reps):
        out = scan_fn(init)
    _ = float(out[1][-1])
    dt = (time.perf_counter() - t0) / (reps * N_INNER) * 1e3
    print(json.dumps({"case": name, "ms": round(dt, 3)}), flush=True)


def fwd_and_step(name, module, apply_args):
    params = module.init(key, *apply_args)

    @jax.jit
    def fwd_scan(p):
        def body(pp, _):
            out = module.apply(pp, *apply_args)
            loss = jnp.sum(out.astype(jnp.float32))
            return (
                jax.tree_util.tree_map(
                    lambda t: t + (loss * 1e-12).astype(t.dtype), pp
                ),
                loss,
            )

        return jax.lax.scan(body, p, None, length=N_INNER)

    @jax.jit
    def step_scan(p):
        def body(pp, _):
            def loss_fn(p_):
                return (
                    module.apply(p_, *apply_args).astype(jnp.float32)
                    ** 2
                ).mean()

            loss, g = jax.value_and_grad(loss_fn)(pp)
            pp = jax.tree_util.tree_map(
                lambda t, gg: t - (1e-9 * gg).astype(t.dtype), pp, g
            )
            return pp, loss

        return jax.lax.scan(body, p, None, length=N_INNER)

    bench(f"{name}_fwd", fwd_scan, params)
    bench(f"{name}_step", step_scan, params)


class MlpAct(nn.Module):
    act: str = "gelu_exact"

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * D, dtype=jnp.bfloat16, name="fc1")(x)
        if self.act == "gelu_exact":
            h = nn.gelu(h, approximate=False)
        elif self.act == "gelu_tanh":
            h = nn.gelu(h, approximate=True)
        elif self.act == "relu":
            h = nn.relu(h)
        return nn.Dense(D, dtype=jnp.bfloat16, name="fc2")(h)


for act in ("gelu_exact", "gelu_tanh", "relu", "none"):
    fwd_and_step(f"mlp_{act}", MlpAct(act=act), (x,))


class QKVProj(nn.Module):
    """The attention projections alone (qkv + out)."""

    @nn.compact
    def __call__(self, x):
        qkv = nn.Dense(3 * D, dtype=jnp.bfloat16, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return nn.Dense(D, dtype=jnp.bfloat16, name="out")(
            q * 0.5 + k * 0.25 + v
        )


fwd_and_step("attn_proj_only", QKVProj(), (x,))

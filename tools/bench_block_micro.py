"""Microbench DeepIce Block internals on the real TPU at the bench
shape (B=16, L=769 post-cls, D=384, H=12, bf16): full block
(flash/dense attention), attention alone, MLP alone, LayerNorm pair.

Timing: 16-iteration lax.scan with params threaded through the carry
(a real tiny update — XLA hoists carry-independent bodies; CLAUDE.md),
timed region ends at a scalar readback.  Per-iteration time therefore
EXCLUDES the tunneled runtime's per-dispatch overhead."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

import graphnet_tpu.ops.flash_attention as fa
from graphnet_tpu.models.components.layers import (
    Block,
    Mlp,
    MultiHeadAttention,
)

print(json.dumps({"backend": jax.default_backend()}), flush=True)

B, L, D, H = 16, 769, 384, 12
N_INNER = 16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
mask = jnp.asarray(rng.random((B, L)) > 0.1)
mask = mask.at[:, 0].set(True)
key = jax.random.PRNGKey(0)


def bench(name, scan_fn, init):
    out = scan_fn(init)
    _ = float(out[1][-1])  # warm + hard sync
    t0 = time.perf_counter()
    reps = 3
    for _i in range(reps):
        out = scan_fn(init)
    _ = float(out[1][-1])
    dt = (time.perf_counter() - t0) / (reps * N_INNER) * 1e3
    print(json.dumps({"case": name, "ms": round(dt, 3)}), flush=True)


def shift(p, s):
    return jax.tree_util.tree_map(
        lambda t: t + (s * 1e-12).astype(t.dtype), p
    )


def fwd_and_step(name, module, apply_args):
    params = module.init(key, *apply_args)

    @jax.jit
    def fwd_scan(p):
        def body(pp, _):
            out = module.apply(pp, *apply_args)
            loss = jnp.sum(out.astype(jnp.float32))
            return shift(pp, loss), loss

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


block = Block(num_heads=H, mlp_ratio=4.0, init_values=1.0,
              dtype=jnp.bfloat16)
fwd_and_step("block_flash", block, (x, mask))

fa_supported = fa.supported
fa.supported = lambda *a, **k: False
fwd_and_step("block_dense", block, (x, mask))
fa.supported = fa_supported

attn = MultiHeadAttention(num_heads=H, dtype=jnp.bfloat16)
fwd_and_step("attn_flash", attn, (x, mask))
fa.supported = lambda *a, **k: False
fwd_and_step("attn_dense", attn, (x, mask))
fa.supported = fa_supported

mlp = Mlp(hidden_features=4 * D, dtype=jnp.bfloat16)
fwd_and_step("mlp", mlp, (x,))


class LNPair(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)(h)


fwd_and_step("ln_pair", LNPair(), (x,))

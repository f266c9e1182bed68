"""DeepIce train-step ablation at the bench shape (B=16, L=768, bf16).

Each variant runs in a FRESH subprocess (axon runtime gotchas: degraded
device_put after readbacks, unreliable block_until_ready in long-lived
processes — CLAUDE.md).  Timed region ends at float(loss).

Variants isolate where the 145.7 ms step goes:
  base        rel_bias_chunks=4 (current bench config)
  flash       rel_flash kernel for the biased block
  no_bias     n_rel=0 — upper bound on what the biased block costs
  no_rel      depth_rel=0 — the 4 sandwich blocks entirely removed
  fwd_only    base, forward pass only (no grad/opt)
  remat       base + per-block jax.checkpoint (DeepIce(remat=True))
  B32         base at B=32 (OOMs on v5e without remat)
  remat_B32   remat at B=32 — the remat-unlocked batch size
  depth0      depth=0 — the 12 plain cls-token blocks removed (isolates
              them as base - depth0 - encoder)
  encoder     depth=0 AND depth_rel=0 — FourierEncoder + task only
  L1536_chunks / L1536_flash  B=8, L=1536: the shape where the Pallas
              rel-flash kernel's auto policy engages — records the
              kernel's win vs the chunked-dense path at long L
  remat_B32_flash  remat at B=32 with rel_flash="always"
"""
import json
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
variant = sys.argv[1]
import numpy as np
import jax, optax
import jax.numpy as jnp
from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.icemix import DeepIce
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import (
    DirectionReconstructionWithKappa,
)
from graphnet_tpu.training.loss_functions import VonMisesFisher3DLoss

B_d, L_d = 16, 768

kw = dict(n_features=6, rel_bias_chunks=4, compute_dtype="bfloat16",
          rel_flash="never")
if variant == "flash":
    kw["rel_flash"] = "always"
elif variant == "no_bias":
    kw["n_rel"] = 0
elif variant == "no_rel":
    kw["depth_rel"] = 0
elif variant == "chunks1":
    # materialise the [B, L, L, hd] bf16 pair tensor ONCE (XLA saves it
    # for backward — no per-chunk transcendental recompute)
    kw["rel_bias_chunks"] = 1
elif variant == "depth0":
    kw["depth"] = 0
elif variant == "encoder":
    kw["depth"] = 0
    kw["depth_rel"] = 0
elif variant == "remat":
    kw["remat"] = True
elif variant in ("remat_B32", "B32", "remat_B32_flash"):
    if variant.startswith("remat"):
        kw["remat"] = True
    if variant.endswith("flash"):
        kw["rel_flash"] = "always"
    B_d = 32
elif variant in ("L1536_chunks", "L1536_flash"):
    B_d, L_d = 8, 1536
    if variant.endswith("flash"):
        kw["rel_flash"] = "always"
elif variant in ("L3072_chunks", "L3072_flash"):
    # the memory-bound regime: the chunked-dense path's O(L^2) fp32
    # attention planes + saved-for-bwd buffers should exceed v5e HBM
    # here while the streaming kernel holds only O(L*ts) tiles
    B_d, L_d = 8, 3072
    if variant.endswith("flash"):
        kw["rel_flash"] = "always"

rng = np.random.default_rng(0)
events = [np.concatenate([
    rng.standard_normal((L_d, 3)).astype(np.float32),
    rng.random((L_d, 1)).astype(np.float32),
    rng.random((L_d, 1)).astype(np.float32),
    (rng.random((L_d, 1)) > 0.5).astype(np.float32)], axis=1)
    for _ in range(B_d)]
direction = rng.standard_normal((B_d, 3)).astype(np.float32)
direction /= np.linalg.norm(direction, axis=1, keepdims=True)
batch = jax.device_put(
    make_batch(events, labels={"direction": direction}, length=L_d))

model = StandardModel(
    backbone=DeepIce(**kw),
    tasks=(DirectionReconstructionWithKappa(
        loss_function=VonMisesFisher3DLoss(),
        target_labels=("direction",)),))
params = model.init(jax.random.PRNGKey(0), batch)
opt = optax.flatten(optax.adam(1e-3, eps=1e-3))
ostate = opt.init(params)

if variant == "fwd_only":
    @jax.jit
    def steps(p, o, b, n=8):
        def one(c, _):
            # thread params through the carry via a tiny shift so XLA
            # cannot hoist the body (CLAUDE.md bench pitfall)
            pp = c
            loss = model.loss(model.apply(pp, b), b.labels)
            pp = jax.tree_util.tree_map(
                lambda t: t + jnp.zeros_like(t) * loss, pp)
            return pp, loss
        p, losses = jax.lax.scan(one, p, None, length=n)
        return p, o, losses
else:
    @jax.jit
    def steps(p, o, b, n=8):
        def one(c, _):
            pp, oo = c
            def loss_fn(p_):
                return model.loss(model.apply(p_, b), b.labels)
            loss, grads = jax.value_and_grad(loss_fn)(pp)
            u, oo = opt.update(grads, oo)
            return (optax.apply_updates(pp, u), oo), loss
        (p, o), losses = jax.lax.scan(one, (p, o), None, length=n)
        return p, o, losses

p, o, losses = steps(params, ostate, batch)
_ = float(losses[-1])  # warm + hard sync
t0 = time.perf_counter()
reps = 3
for _i in range(reps):
    p, o, losses = steps(p, o, batch)
lv = float(losses[-1])
dt = (time.perf_counter() - t0) / (reps * 8)
try:
    stats = jax.local_devices()[0].memory_stats() or {}
    peak_gb = round(stats.get("peak_bytes_in_use", 0) / 1e9, 3)
except Exception:
    peak_gb = None
print(json.dumps({"variant": variant,
                  "step_ms": round(dt * 1e3, 2),
                  "events_per_s": round(B_d / dt, 1),
                  "peak_hbm_gb": peak_gb,
                  "loss": lv}), flush=True)
"""

variants = sys.argv[1:] or ["base", "flash", "no_bias", "no_rel",
                            "fwd_only"]
for v in variants:
    r = subprocess.run(
        [sys.executable, "-c", WORKER, v],
        capture_output=True, text=True, timeout=2400,
    )
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            print(line, flush=True)
    if r.returncode != 0:
        print(json.dumps({"variant": v, "error": r.stderr[-2000:]}),
              flush=True)

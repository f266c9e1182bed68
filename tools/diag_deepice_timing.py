"""Why does the DeepIce scan time ~0.2ms/step (impossible)? Compare:
(a) single-step jit, block_until_ready only
(b) single-step jit, float(loss) forced readback
(c) 5-step scan, block_until_ready
(d) 5-step scan, float(loss)
and print losses to confirm real work."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import bench
import jax, optax

B_d, L_d = 4, 768
import jax.numpy as jnp
from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.icemix import DeepIce
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import DirectionReconstructionWithKappa
from graphnet_tpu.training.loss_functions import VonMisesFisher3DLoss

rng = np.random.default_rng(0)
events = [np.concatenate([
    rng.standard_normal((L_d, 3)).astype(np.float32),
    rng.random((L_d, 1)).astype(np.float32),
    rng.random((L_d, 1)).astype(np.float32),
    (rng.random((L_d, 1)) > 0.5).astype(np.float32)], axis=1) for _ in range(B_d)]
direction = rng.standard_normal((B_d, 3)).astype(np.float32)
direction /= np.linalg.norm(direction, axis=1, keepdims=True)
batch = jax.device_put(make_batch(events, labels={"direction": direction}, length=L_d))
model = StandardModel(
    backbone=DeepIce(n_features=6, rel_bias_chunks=4, compute_dtype="bfloat16"),
    tasks=(DirectionReconstructionWithKappa(
        loss_function=VonMisesFisher3DLoss(), target_labels=("direction",)),))
params = model.init(jax.random.PRNGKey(0), batch)
opt = optax.flatten(optax.adam(1e-3, eps=1e-3))
ostate = opt.init(params)

@jax.jit
def step(p, o, b):
    def loss_fn(p_):
        return model.loss(model.apply(p_, b), b.labels)
    loss, grads = jax.value_and_grad(loss_fn)(p)
    u, o = opt.update(grads, o)
    return optax.apply_updates(p, u), o, loss

@jax.jit
def steps(p, o, b):
    def one(c, _):
        pp, oo = c
        def loss_fn(p_):
            return model.loss(model.apply(p_, b), b.labels)
        loss, grads = jax.value_and_grad(loss_fn)(pp)
        u, oo = opt.update(grads, oo)
        return (optax.apply_updates(pp, u), oo), loss
    (p, o), losses = jax.lax.scan(one, (p, o), None, length=5)
    return p, o, losses

p, o, loss = step(params, ostate, batch)
jax.block_until_ready(loss)
print("single-step loss:", float(loss), flush=True)
t0 = time.perf_counter()
for _ in range(10):
    p, o, loss = step(p, o, batch)
jax.block_until_ready(loss)
print(json.dumps({"single_step_block_ms": (time.perf_counter()-t0)/10*1e3}), flush=True)
t0 = time.perf_counter()
for _ in range(10):
    p, o, loss = step(p, o, batch)
lv = float(loss)
print(json.dumps({"single_step_float_ms": (time.perf_counter()-t0)/10*1e3, "loss": lv}), flush=True)

p, o, losses = steps(params, ostate, batch)
jax.block_until_ready(losses)
print("scan losses:", [round(float(x),4) for x in np.asarray(losses)], flush=True)
t0 = time.perf_counter()
for _ in range(3):
    p, o, losses = steps(p, o, batch)
jax.block_until_ready(losses)
print(json.dumps({"scan_block_ms_per_step": (time.perf_counter()-t0)/15*1e3}), flush=True)
t0 = time.perf_counter()
for _ in range(3):
    p, o, losses = steps(p, o, batch)
lv = float(losses[-1])
print(json.dumps({"scan_float_ms_per_step": (time.perf_counter()-t0)/15*1e3, "last_loss": lv}), flush=True)

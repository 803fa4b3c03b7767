"""Train-step throughput breakdown on the joint-config shapes.

Separates (a) device compute ceiling — train_step on a device-resident
batch, (b) + per-step host->device batch transfer, (c) + on-device
batch prep (prepare_batch), to locate the trainer's wall.
Shapes follow configs/superpoint_synth_joint_v2.yaml: batch 32,
120x160, warped pair, sparse descriptor loss.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from ssp.models import build_model
from ssp.train import create_train_state, make_train_step
from ssp.data.pipeline import prepare_batch

B, H, W, K = 32, 120, 160, 128
model = build_model("SuperPointNet_gauss2")
state = create_train_state(model, jax.random.key(0), (1, H, W, 1))
step, _ = make_train_step(semantic=False, warped_pair=True, donate=False)

rng = np.random.default_rng(0)
imgs_h = rng.uniform(size=(B, H, W)).astype(np.float32)
pts_h = (rng.uniform(size=(B, K, 2)) * [H - 1, W - 1]).astype(np.float32)
valid_h = (rng.uniform(size=(B, K)) < 0.5)

pb = jax.jit(lambda k, i, p, v: prepare_batch(
    k, i, p, v,
    photometric={"enable": True}, homographic={"enable": False},
    warped_pair={"enable": True},
))

def timed(label, fn, iters=20):
    out = fn(0); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = fn(i)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"stage": label, "ms_per_step": round(dt * 1e3, 1),
                      "it_per_s": round(1 / dt, 2)}))
    return out

# (a) compute only: fixed device-resident prepared batch
batch0 = pb(jax.random.key(1), jnp.asarray(imgs_h), jnp.asarray(pts_h), jnp.asarray(valid_h))
jax.block_until_ready(batch0["image"])
st = {"s": state}
def comp(i):
    st["s"], m = step(st["s"], batch0, jax.random.key(i))
    return m
timed("train_step (device-resident batch)", comp)

# (b) + host->device transfer each step
def xfer(i):
    ib = jax.device_put(imgs_h); pbt = jax.device_put(pts_h); vb = jax.device_put(valid_h)
    b = pb(jax.random.key(i), ib, pbt, vb)
    st["s"], m = step(st["s"], b, jax.random.key(i))
    return m
timed("+ per-step transfer + prepare_batch", xfer)

# (c) prepare_batch alone (device-resident inputs)
ib, ptb, vb = jnp.asarray(imgs_h), jnp.asarray(pts_h), jnp.asarray(valid_h)
timed("prepare_batch only", lambda i: pb(jax.random.key(i), ib, ptb, vb))

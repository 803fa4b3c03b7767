"""A/B/C the three inference forwards at the HA export shape (240x320).

The packed Pallas stem wins at 480x640 (w_half=320 -> 17% lane-pad
waste) but w_half=160 pads to 256 lanes (37.5% waste) at 240x320 —
this measures whether the folded-BN forward should gate the packed
stem by width.  Run on the real TPU.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from ssp.models import build_model
from ssp.models.fast_infer import _forward, fold_variables, fast_apply_fn
from ssp.export.homography_adaptation import make_ha_fn

NUM_H, H, W, GROUP = 100, 240, 320, 8

model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32), train=False)
variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(size=(GROUP, H, W)).astype(np.float32))
keys = jax.random.split(jax.random.key(1), GROUP)


def folded_xla_stem(variables, x, train=False):
    return _forward(x, fold_variables(variables), use_packed=False, interpret=False)


for name, fn in (("flax", model.apply), ("fast_packed", fast_apply_fn),
                 ("fast_xla_stem", folded_xla_stem)):
    ha = make_ha_fn(fn, variables, num_h=NUM_H, top_k=600)
    out = ha(keys, imgs); jax.block_until_ready(out)
    t0 = time.perf_counter(); iters = 6
    for _ in range(iters):
        out = ha(keys, imgs)
    jax.block_until_ready(out)
    rate = GROUP * iters / (time.perf_counter() - t0)
    print(json.dumps({"forward": name, "ha_kernel_img_s": round(rate, 2)}), flush=True)

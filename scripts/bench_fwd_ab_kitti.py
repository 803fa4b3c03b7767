"""A/B the inference forwards at the KITTI export shape (384x1248,
num=20 per configs/magicpoint_kitti_export.yaml).  w_half=624 packs to
640 lanes (2.5% waste) so the packed stem should win here."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from ssp.models import build_model
from ssp.models.fast_infer import fast_apply_fn
from ssp.export.homography_adaptation import make_ha_fn

NUM_H, H, W, GROUP = 20, 384, 1248, 4

model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32), train=False)
variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(size=(GROUP, H, W)).astype(np.float32))
keys = jax.random.split(jax.random.key(1), GROUP)

for name, fn in (("flax", model.apply), ("fast_packed", fast_apply_fn)):
    ha = make_ha_fn(fn, variables, num_h=NUM_H, top_k=1000)
    out = ha(keys, imgs); jax.block_until_ready(out)
    t0 = time.perf_counter(); iters = 6
    for _ in range(iters):
        out = ha(keys, imgs)
    jax.block_until_ready(out)
    rate = GROUP * iters / (time.perf_counter() - t0)
    print(json.dumps({"forward": name, "ha_kernel_img_s": round(rate, 2)}), flush=True)

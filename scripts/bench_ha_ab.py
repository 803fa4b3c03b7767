import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time, tempfile
from pathlib import Path
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from ssp.models import build_model
from ssp.export.homography_adaptation import make_ha_fn, run_ha_export

NUM_H, H, W, GROUP, N_SUS = 100, 240, 320, 8, 64
model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32), train=False)
variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
rng = np.random.default_rng(0)
imgs_d = jnp.asarray(rng.uniform(size=(GROUP, H, W)).astype(np.float32))
keys_d = jax.random.split(jax.random.key(1), GROUP)
feed = [(f"img_{i:04d}", rng.uniform(size=(H, W)).astype(np.float32)) for i in range(N_SUS)]

for mode in (True, False):
    ha = make_ha_fn(model.apply, variables, num_h=NUM_H, top_k=600, one_dispatch=mode)
    out = ha(keys_d, imgs_d); jax.block_until_ready(out)  # compile
    t0 = time.perf_counter(); iters = 4
    for _ in range(iters):
        out = ha(keys_d, imgs_d)
    jax.block_until_ready(out)
    kern = GROUP * iters / (time.perf_counter() - t0)
    with tempfile.TemporaryDirectory() as td:
        run_ha_export(ha, feed[:GROUP], Path(td)/"w", seed=0, group=GROUP)
        t0 = time.perf_counter()
        n = run_ha_export(ha, feed, Path(td)/"o", seed=0, group=GROUP)
        sus = n / (time.perf_counter() - t0)
    print(json.dumps({"one_dispatch": mode, "kernel_img_s": round(kern,2), "sustained_img_s": round(sus,2)}))

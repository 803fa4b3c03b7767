"""One-off sustained-throughput probes for run_ha_export:
group=16 at 240x320 (amortization) and KITTI 96x320 (resolution)."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time, tempfile
from pathlib import Path
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from ssp.models import build_model
from ssp.export.homography_adaptation import make_ha_fn, run_ha_export

def probe(H, W, group, n_img=64):
    model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32), train=False)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    ha = make_ha_fn(model.apply, variables, num_h=100, top_k=600)
    rng = np.random.default_rng(0)
    feed = [(f"img_{i:04d}", rng.uniform(size=(H, W)).astype(np.float32)) for i in range(n_img)]
    with tempfile.TemporaryDirectory() as td:
        run_ha_export(ha, feed[:group], Path(td)/"w", seed=0, group=group)
        t0 = time.perf_counter()
        n = run_ha_export(ha, feed, Path(td)/"o", seed=0, group=group)
        sus = n / (time.perf_counter() - t0)
    print(json.dumps({"res": f"{H}x{W}", "group": group, "sustained_img_s": round(sus, 2)}))

probe(240, 320, 16)
probe(96, 320, 8)

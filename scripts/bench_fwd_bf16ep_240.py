"""Measure a bf16-epilogue variant of the folded forward at 240x320.

Hypothesis: `preferred_element_type=f32` on every trunk conv makes XLA
materialize f32 intermediates (2x HBM) that flax's all-bf16 path never
writes — explaining flax 29.6 vs folded 26.5 img/s at the HA shape.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from ssp.models import build_model
from ssp.models.fast_infer import fold_variables, _pool, _stem_packed
from ssp.export.homography_adaptation import make_ha_fn

NUM_H, H, W, GROUP = 100, 240, 320, 8


def _conv16(x, wsb, relu=True):
    w, s, b = wsb
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )
    y = y * s.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)
    if relu:
        y = jnp.maximum(y, jnp.bfloat16(0))
    return y


def make_fwd(use_packed):
    def fwd(variables, x, train=False):
        folded = fold_variables(variables)
        if use_packed:
            t = _stem_packed(x, folded, False)
        else:
            t = _pool(_conv16(_conv16(x.astype(jnp.bfloat16), folded["inc0"]), folded["inc1"]))
        t = _pool(_conv16(_conv16(t, folded["d1a"]), folded["d1b"]))
        t = _pool(_conv16(_conv16(t, folded["d2a"]), folded["d2b"]))
        feat = _conv16(_conv16(t, folded["d3a"]), folded["d3b"])
        semi = _conv16(_conv16(feat, folded["pa"]), folded["pb"], relu=False)
        desc = _conv16(_conv16(feat, folded["da"]), folded["db"], relu=False)
        desc32 = desc.astype(jnp.float32)
        desc32 = desc32 / (jnp.linalg.norm(desc32, axis=-1, keepdims=True) + 1e-12)
        return {"semi": semi.astype(jnp.float32), "desc": desc32}
    return fwd


model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32), train=False)
variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(size=(GROUP, H, W)).astype(np.float32))
keys = jax.random.split(jax.random.key(1), GROUP)

for name, fn in (("bf16ep_xla_stem", make_fwd(False)),
                 ("bf16ep_packed", make_fwd(True))):
    ha = make_ha_fn(fn, variables, num_h=NUM_H, top_k=600)
    out = ha(keys, imgs); jax.block_until_ready(out)
    t0 = time.perf_counter(); iters = 6
    for _ in range(iters):
        out = ha(keys, imgs)
    jax.block_until_ready(out)
    rate = GROUP * iters / (time.perf_counter() - t0)
    print(json.dumps({"forward": name, "ha_kernel_img_s": round(rate, 2)}), flush=True)

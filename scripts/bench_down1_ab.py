"""A/B the x-pair packed down1 Pallas kernel vs XLA conv-conv-pool.

Stage-isolated at the bench geometry (stem output of 480x640, B=32:
[32, 240, 320, 64]) and at KITTI geometry ([B, 192, 624, 64]), plus the
full fast-forward pipeline with the kernel on/off.

Usage: python scripts/bench_down1_ab.py
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssp.models import build_model
from ssp.models import fast_infer as fi
from ssp.kernels.down1_pallas import down1_pallas_packed


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def stage_ab(B, H2, W2, folded):
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(B, H2, W2, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    (wa, sa, ba), (wb, sb, bb) = folded["d1a"], folded["d1b"]

    pallas = jax.jit(lambda t: down1_pallas_packed(t, wa, sa, ba, wb, sb, bb))
    xla = jax.jit(lambda t: fi._pool(fi._conv(fi._conv(t, folded["d1a"]), folded["d1b"])))
    ms_p = timeit(pallas, x)
    ms_x = timeit(xla, x)
    print(f"down1 stage [{B},{H2},{W2},64]: pallas {ms_p:.2f} ms  xla {ms_x:.2f} ms  "
          f"(pallas/xla {ms_p/ms_x:.2f}x)", flush=True)


def full_ab(B, H, W, variables):
    """Like-for-like full-forward A/B: both arms are built from pieces
    (identical stem/d2+/head/L2-norm), differing ONLY in the down1
    stage, so the comparison bypasses _forward's B<=4 batch gate and
    measures the kernel itself at every batch."""
    x = jnp.asarray(
        np.random.default_rng(1).uniform(size=(B, H, W, 1)).astype(np.float32)
    )
    folded = fi.fold_variables(variables)
    from ssp.kernels.down1_pallas import down1_pallas_packed
    (wa, sa, ba), (wb, sb, bb) = folded["d1a"], folded["d1b"]

    def tail(t):
        t = fi._pool(fi._conv(fi._conv(t, folded["d2a"]), folded["d2b"]))
        feat = fi._conv(fi._conv(t, folded["d3a"]), folded["d3b"])
        semi = fi._conv(fi._conv(feat, folded["pa"]), folded["pb"], relu=False)
        desc = fi._conv(fi._conv(feat, folded["da"]), folded["db"], relu=False)
        desc32 = desc.astype(jnp.float32)
        desc32 = desc32 / (jnp.linalg.norm(desc32, axis=-1, keepdims=True) + 1e-12)
        return semi, desc32

    def fwd_on(im):
        t = fi._stem_packed(im, folded, False)
        t = down1_pallas_packed(t, wa, sa, ba, wb, sb, bb, pool=True,
                                interpret=False)
        return tail(t)

    def fwd_off(im):
        t = fi._stem_packed(im, folded, False)
        t = fi._pool(fi._conv(fi._conv(t, folded["d1a"]), folded["d1b"]))
        return tail(t)

    ms_on = timeit(jax.jit(fwd_on), x)
    ms_off = timeit(jax.jit(fwd_off), x)
    print(f"full fwd [{B},{H},{W}]: down1-pallas {ms_on:.2f} ms ({B/ms_on*1e3:.0f} img/s)  "
          f"down1-xla {ms_off:.2f} ms ({B/ms_off*1e3:.0f} img/s)", flush=True)
    return {"B": B, "H": H, "W": W, "ms_pallas": round(ms_on, 3),
            "ms_xla": round(ms_off, 3)}


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 480, 640, 1), jnp.float32), train=False
    )
    folded = fi.fold_variables(variables)
    stage_ab(32, 240, 320, folded)   # bench geometry
    stage_ab(4, 192, 624, folded)    # KITTI geometry
    rows = [full_ab(32, 480, 640, variables),
            full_ab(4, 384, 1248, variables)]
    if "--localize" in sys.argv:
        localize(32, 480, 640, variables)
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    if out:
        import json
        with open(out, "w") as f:
            json.dump({"bench": "down1_full_fwd_ab", "rows": rows}, f, indent=1)
        print(f"wrote {out}", flush=True)


def localize(B, H, W, variables):
    """Where does the in-context loss at 480x640 come from?"""
    folded = fi.fold_variables(variables)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(size=(B, H, W, 1)).astype(np.float32)
    )
    (wa, sa, ba), (wb, sb, bb) = folded["d1a"], folded["d1b"]

    def stem(im):
        return fi._stem_packed(im, folded, False)

    def v_stem(im):
        return stem(im)

    def v_pal(im):
        return down1_pallas_packed(stem(im), wa, sa, ba, wb, sb, bb)

    def v_xla(im):
        return fi._pool(fi._conv(fi._conv(stem(im), folded["d1a"]), folded["d1b"]))

    def v_pal_d2(im):
        t = v_pal(im)
        return fi._pool(fi._conv(fi._conv(t, folded["d2a"]), folded["d2b"]))

    def v_xla_d2(im):
        t = v_xla(im)
        return fi._pool(fi._conv(fi._conv(t, folded["d2a"]), folded["d2b"]))

    for name, f in [("stem", v_stem), ("stem+d1pal", v_pal), ("stem+d1xla", v_xla),
                    ("stem+d1pal+d2", v_pal_d2), ("stem+d1xla+d2", v_xla_d2)]:
        ms = timeit(jax.jit(f), x)
        print(f"  {name:16s} {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()

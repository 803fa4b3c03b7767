"""Decompose the device-corpus train step into stage costs on the chip.

Times five scan-of-k variants that add one pipeline stage each:

  1. sample        on-device corpus gather (DeviceCorpus.sample)
  2. +prep         prepare_batch (photometric + homography + labels)
  3. +fwd          loss evaluation, no gradients (eval_step)
  4. +grad-nodesc  full train step with lambda_loss=0 (no descriptor loss)
  5. full          the production corpus_train_step

Marginal cost of a stage = t[i] - t[i-1].  Timing uses the
two-run-length differencing from scripts/bench_train_corpus.py (the
tunnel's donated-aliased buffers make block_until_ready lie; only a
host read truly synchronizes, and the diff cancels that fixed cost).

Env: SSP_BENCH_CFG (config path, default v3 joint), SSP_PROF_SPD
(scan length per dispatch, default 20), SSP_PROF_FAKE_CORPUS=n (skip
dataset materialization and upload n random samples instead — timing
does not depend on corpus content, and the real corpus can take
~20 min of host loading + several GB of HBM).
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os, time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from ssp import registry
from ssp.train.step import make_train_step
from ssp.utils.config import load_config
from ssp.utils.experiment import ExperimentPaths
from ssp.cli.train import make_dataset

CFG = os.environ.get("SSP_BENCH_CFG", "configs/superpoint_synth_joint_v3.yaml")
SPD = int(os.environ.get("SSP_PROF_SPD", "20"))

cfg = load_config(CFG)
cfg["steps_per_dispatch"] = SPD
# SSP_PROF_OVERRIDE='{"model": {"fused_semantic_ce": false}}' — ad-hoc
# config deltas for A/B profiling without a config-file variant
if os.environ.get("SSP_PROF_OVERRIDE"):
    import json

    from ssp.utils.config import dict_update

    dict_update(cfg, json.loads(os.environ["SSP_PROF_OVERRIDE"]))
agent_cls = registry.get("agent", cfg["front_end_model"])
agent = agent_cls(cfg, save_path=ExperimentPaths("profile_step"),
                  exper_name="profile_step")
fake_n = int(os.environ.get("SSP_PROF_FAKE_CORPUS", "0"))
if fake_n:
    import numpy as np_

    h, w = (cfg["data"].get("preprocessing") or {}).get("resize", [120, 160])
    rng = np_.random.default_rng(0)

    class _Fake:
        def __len__(self):
            return fake_n

        def __getitem__(self, i):
            r = np_.random.default_rng(i)
            s = {
                "image": r.uniform(size=(h, w)).astype(np_.float32),
                "points": r.uniform(5, min(h, w) - 5, (48, 2)).astype(np_.float32),
                "points_valid": np_.ones((48,), bool),
                "name": str(i),
            }
            if agent._step_kwargs.get("semantic"):
                nc = int((cfg["model"].get("params") or {}).get("n_classes", 133))
                s["sem"] = r.integers(0, nc + 1, size=(h, w)).astype(np_.int32)
            return s

    agent.attach_device_corpus(_Fake())
else:
    agent.attach_device_corpus(make_dataset(cfg, "train"))
dc = agent.device_corpus
prep = agent._prep_train
bs = agent.real_batch_size
mesh = agent.mesh

nodesc_step, _ = make_train_step(**{**agent._step_kwargs, "lambda_loss": 0.0})


def scan_of(body):
    """jit a (state, corpus, key) -> (state, scalar, key) scan-of-SPD."""

    def dispatch(state, corpus, key):
        key, k_seq = jax.random.split(key)
        keys = jax.random.split(k_seq, SPD)
        state, outs = jax.lax.scan(lambda st, k: body(st, corpus, k), state, keys)
        return state, outs[-1], key

    return jax.jit(dispatch, donate_argnums=(0, 2))


def body_sample(st, corpus, k):
    k_samp, _, _ = jax.random.split(k, 3)
    raw = dc.sample(corpus, k_samp, bs, mesh)
    return st, jnp.float32(raw["image"].mean())


def body_prep(st, corpus, k):
    k_samp, k_prep, _ = jax.random.split(k, 3)
    raw = dc.sample(corpus, k_samp, bs, mesh)
    batch = prep(k_prep, raw)
    tot = sum(jnp.float32(v.mean()) for v in jax.tree_util.tree_leaves(batch))
    return st, tot


def body_fwd(st, corpus, k):
    k_samp, k_prep, k_step = jax.random.split(k, 3)
    raw = dc.sample(corpus, k_samp, bs, mesh)
    batch = prep(k_prep, raw)
    metrics = agent.eval_step(st, batch, k_step)
    return st, metrics["loss"]


def make_body_step(step):
    def body(st, corpus, k):
        k_samp, k_prep, k_step = jax.random.split(k, 3)
        raw = dc.sample(corpus, k_samp, bs, mesh)
        batch = prep(k_prep, raw)
        st, metrics = step(st, batch, k_step)
        return st, metrics["loss"]

    return body


VARIANTS = [
    ("sample", body_sample),
    ("+prep", body_prep),
    ("+fwd", body_fwd),
    ("+grad-nodesc", make_body_step(nodesc_step)),
    ("full", make_body_step(agent.train_step)),
]
only = os.environ.get("SSP_PROF_ONLY")
if only:
    names = {s.strip() for s in only.split(",")}
    VARIANTS = [v for v in VARIANTS if v[0] in names]


def run(dispatch, n, state, key):
    out = None
    for _ in range(n):
        state, out, key = dispatch(state, agent.device_corpus.arrays, key)
    float(np.asarray(out))  # true sync (host read)
    return state, key


results = {}
prev = 0.0
for name, body in VARIANTS:
    dispatch = scan_of(body)
    state = agent.state
    key = jax.random.key(7)
    t0 = time.perf_counter()
    state, key = run(dispatch, 1, state, key)  # compile + warmup
    t_compile = time.perf_counter() - t0
    # second warmup: the first post-donation dispatch sees different
    # input layouts and recompiles — measure only after BOTH variants
    # of the program exist
    state, key = run(dispatch, 2, state, key)
    n1, n2 = 3, 9
    t0 = time.perf_counter(); state, key = run(dispatch, n1, state, key)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); state, key = run(dispatch, n2, state, key)
    t2 = time.perf_counter() - t0
    ms = (t2 - t1) / ((n2 - n1) * SPD) * 1e3
    results[name] = ms
    print(f"{name:14s} {ms:8.2f} ms/step  (marginal {ms - prev:+7.2f} ms)"
          f"  [compile+warm {t_compile:.0f}s]", flush=True)
    prev = ms
    # donation consumed agent.state's buffers only if the variant got
    # them; rebuild a fresh state per variant to stay safe
    agent.state = jax.tree_util.tree_map(jnp.asarray, state)

print({k: round(v, 2) for k, v in results.items()})

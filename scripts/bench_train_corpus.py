"""Device-corpus trainer throughput on the real chip.

Counterpart to bench_train_real.py: same agent/config, but the corpus
is HBM-resident and batches are sampled on device — zero steady-state
host->device transfers.

Timing methodology: ``jax.block_until_ready`` is NOT trustworthy here —
``corpus_train_step`` donates its inputs (state, key), and on the axon
tunnel the donated-aliased output buffers report ready immediately,
making block-based timings off by orders of magnitude (measured
54 690 "it/s" vs a real 8.6).  Only a host read of a value that
depends on the computation truly synchronizes, and a single host read
costs a full tunnel round-trip (~230 ms), so we difference two run
lengths to cancel that fixed cost.

Env knobs: SSP_BENCH_CFG (config path), SSP_BENCH_SPD (override
steps_per_dispatch).
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, os, time
import jax
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from ssp import registry
from ssp.utils.config import load_config
from ssp.utils.experiment import ExperimentPaths
from ssp.cli.train import make_dataset

cfg = load_config(os.environ.get("SSP_BENCH_CFG",
                                 "configs/superpoint_synth_joint_v2.yaml"))
if os.environ.get("SSP_BENCH_SPD"):
    cfg["steps_per_dispatch"] = int(os.environ["SSP_BENCH_SPD"])
agent_cls = registry.get("agent", cfg["front_end_model"])
agent = agent_cls(cfg, save_path=ExperimentPaths("bench_train_corpus"),
                  exper_name="bench_train_corpus")
t0 = time.perf_counter()
agent.attach_device_corpus(make_dataset(cfg, "train"))
t_upload = time.perf_counter() - t0
print(f"# corpus attached in {t_upload:.1f}s", flush=True)


def sync() -> float:
    """Host read of a param element — the only reliable barrier on the
    tunnel (block_until_ready returns early on donation-aliased
    buffers)."""
    leaf = jax.tree_util.tree_leaves(agent.state.params)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


t0 = time.perf_counter()
key = jax.random.key(99)
agent.state, _, key = agent.corpus_train_step(
    agent.state, agent.device_corpus.arrays, key)
sync()
print(f"# first dispatch (compile) {time.perf_counter()-t0:.1f}s", flush=True)

spd = agent.steps_per_dispatch


def run(n_dispatches: int) -> float:
    global key
    t0 = time.perf_counter()
    for _ in range(n_dispatches):
        agent.state, metrics, key = agent.corpus_train_step(
            agent.state, agent.device_corpus.arrays, key)
    sync()
    return time.perf_counter() - t0


run(2)  # warm
n1 = max(1, 200 // spd)
n2 = 4 * n1
t1, t2 = run(n1), run(n2)
steps = (n2 - n1) * agent.r * spd
ms_per_step = (t2 - t1) / steps * 1e3
print(json.dumps({
    "spd": spd, "r": agent.r, "upload_s": round(t_upload, 2),
    "it_per_s": round(steps / (t2 - t1), 2),
    "ms_per_step": round(ms_per_step, 2),
    "ms_per_dispatch": round(ms_per_step * spd * agent.r, 2),
}))

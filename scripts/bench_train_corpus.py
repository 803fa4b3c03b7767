"""Device-corpus trainer throughput on the real chip (v2 config wiring).

Counterpart to bench_train_real.py: same agent/config, but the corpus
is HBM-resident and batches are sampled on device — zero steady-state
host->device transfers.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from ssp import registry
from ssp.utils.config import load_config
from ssp.utils.experiment import ExperimentPaths
from ssp.cli.train import make_dataset

cfg = load_config("configs/superpoint_synth_joint_v2.yaml")
agent_cls = registry.get("agent", cfg["front_end_model"])
agent = agent_cls(cfg, save_path=ExperimentPaths("bench_train_corpus"),
                  exper_name="bench_train_corpus")
t0 = time.perf_counter()
agent.attach_device_corpus(make_dataset(cfg, "train"))
t_upload = time.perf_counter() - t0
print(f"# corpus attached in {t_upload:.1f}s", flush=True)
t0 = time.perf_counter()
key = jax.random.key(99)
agent.state, _ = agent.corpus_train_step(
    agent.state, agent.device_corpus.arrays, key)
jax.block_until_ready(agent.state.params)
print(f"# first dispatch (compile) {time.perf_counter()-t0:.1f}s", flush=True)

spd = agent.steps_per_dispatch
key = jax.random.key(0)
N, warm = 50, 3
for it in range(N + warm):
    if it == warm:
        jax.block_until_ready(agent.state.params)
        t_all0 = time.perf_counter()
    key, k_step = jax.random.split(key)
    agent.state, metrics = agent.corpus_train_step(
        agent.state, agent.device_corpus.arrays, k_step)
jax.block_until_ready(agent.state.params)
t_total = time.perf_counter() - t_all0
steps = N * agent.r * spd
print(json.dumps({
    "spd": spd, "r": agent.r, "upload_s": round(t_upload, 2),
    "it_per_s": round(steps / t_total, 2),
    "ms_per_dispatch": round(t_total / N * 1e3, 2),
}))

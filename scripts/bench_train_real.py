"""Instrument the REAL trainer dispatch loop (v2 config wiring) to find
where wall-clock goes: loader next(), host stack, transfer, dispatch."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from ssp import registry
from ssp.utils.config import load_config
from ssp.utils.experiment import ExperimentPaths
from ssp.cli.train import make_dataset
from ssp.data.prefetch import Prefetcher
from ssp.train.trainer import shard_batch_axis1

cfg = load_config("configs/superpoint_synth_joint_v2.yaml")
agent_cls = registry.get("agent", cfg["front_end_model"])
agent = agent_cls(cfg, save_path=ExperimentPaths("bench_train_real"),
                  exper_name="bench_train_real")
train_set = make_dataset(cfg, "train")
bs = int(cfg["model"].get("real_batch_size", cfg["model"]["batch_size"]))
tcfg = cfg.get("training") or {}
agent.train_loader = Prefetcher(train_set.batches(
    bs, shuffle=True, seed=0, workers=int(tcfg.get("workers_train", 4))))

spd = agent.steps_per_dispatch
key = jax.random.key(0)
N, warm = 30, 3
for it in range(N + warm):
    if it == warm:
        t_next = t_stack = t_put = t_disp = 0.0
        t_all0 = time.perf_counter()
    key, k_step = jax.random.split(key)
    t0 = time.perf_counter()
    raws = [next(agent.train_loader) for _ in range(spd)]
    t1 = time.perf_counter()
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *raws)
    t2 = time.perf_counter()
    stacked = shard_batch_axis1(stacked, agent.mesh)
    t3 = time.perf_counter()
    agent.state, metrics = agent.multi_train_step(agent.state, stacked, k_step)
    t4 = time.perf_counter()
    if it >= warm:
        t_next += t1 - t0; t_stack += t2 - t1; t_put += t3 - t2; t_disp += t4 - t3
jax.block_until_ready(agent.state.params)
t_total = time.perf_counter() - t_all0
steps = N * agent.r * spd
print(json.dumps({
    "spd": spd, "r": agent.r, "it_per_s": round(steps / t_total, 2),
    "ms_next": round(t_next / N * 1e3, 1),
    "ms_stack": round(t_stack / N * 1e3, 1),
    "ms_put": round(t_put / N * 1e3, 1),
    "ms_dispatch": round(t_disp / N * 1e3, 1),
    "ms_total_per_dispatch": round(t_total / N * 1e3, 1),
}))

"""Training CLI — mirror of the reference's ``train4.py``.

Usage:
  python -m ssp.cli.train train_joint configs/magicpoint_shapes_pair.yaml my_exp
  python -m ssp.cli.train train_base  <config> <exper_name> [--debug]

``train_base`` and ``train_joint`` are intentionally the same code path
(as in the reference, ``train4.py:43-44``); the config decides whether
a descriptor/semantic head trains.
"""

from __future__ import annotations

import argparse
import logging

from ssp import registry
from ssp.utils.config import load_config
from ssp.utils.experiment import ExperimentPaths


def make_dataset(config: dict, task: str):
    data_cfg = dict(config["data"])
    name = data_cfg.pop("dataset")
    cls = registry.get("dataset", name)
    return cls(task=task, **data_cfg)


def train_joint(
    config: dict, exper_name: str, debug: bool = False, eval_only: bool = False
) -> None:
    exper = ExperimentPaths(exper_name)
    agent_cls = registry.get("agent", config["front_end_model"])
    agent = agent_cls(config, save_path=exper, exper_name=exper_name)

    from ssp.data.prefetch import Prefetcher

    train_set = make_dataset(config, "train")
    val_set = make_dataset(config, "val")
    bs = int(config["model"].get("real_batch_size", config["model"]["batch_size"]))
    seed = int(config.get("seed", 0))
    # decode thread pools, same config keys as the reference's torch
    # DataLoader workers (configs/*: training.workers_train)
    training_cfg = config.get("training") or {}
    if training_cfg.get("device_corpus"):
        # upload the whole corpus to HBM once; training samples batches
        # on device (zero steady-state host->device transfers — see
        # ssp/data/device_corpus.py for why this matters on this rig)
        agent.attach_device_corpus(train_set)
    else:
        agent.train_loader = Prefetcher(train_set.batches(
            bs, shuffle=True, seed=seed,
            workers=int(training_cfg.get("workers_train", 4)),
        ))
    agent.val_loader = val_set.batches(
        int(config["model"].get("eval_batch_size", bs)), shuffle=False, seed=seed,
        workers=int(training_cfg.get("workers_val", 2)),
    )
    if eval_only:
        # validation-only pass (reference train4.py --eval flag)
        import jax

        agent._validate(jax.random.key(seed))
        return
    if debug:
        agent.max_iter = min(agent.max_iter, 10)
    agent.train()


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    import os

    if os.environ.get("SSP_DISTRIBUTED"):
        # multi-host pod slices: one process per host over DCN
        # (coordinator/process env comes from the launcher, e.g. GKE/TPU VM)
        import jax

        jax.distributed.initialize()
    ap = argparse.ArgumentParser(description="ssp training")
    sub = ap.add_subparsers(dest="command", required=True)
    for cmd in ("train_base", "train_joint"):
        p = sub.add_parser(cmd)
        p.add_argument("config")
        p.add_argument("exper_name")
        p.add_argument("--debug", action="store_true")
        p.add_argument("--eval", action="store_true")
        p.add_argument(
            "--max-restarts", type=int, default=0,
            help="supervise the run in child processes: on a crash "
            "(OOM kill, RSS-budget stop, infra failure) resume from "
            "the newest checkpoint, up to N times.  The TPU-tunnel "
            "PJRT plugin leaks every host-to-device staging buffer "
            "(~batch size per step), so multi-hour runs need either "
            "this or a generous rss_budget_mb.",
        )
    args = ap.parse_args()
    if getattr(args, "max_restarts", 0) > 0:
        raise SystemExit(run_supervised(
            args.command, args.config, args.exper_name, args.max_restarts,
            debug=args.debug,
        ))
    config = load_config(args.config)
    train_joint(config, args.exper_name, debug=args.debug, eval_only=args.eval)


def watched_call(cmd, exper: "ExperimentPaths", stall_s: float,
                 poll_s: float = 30.0) -> int:
    """Run ``cmd`` in a child; kill it (rc 124) if the experiment's
    metrics files stop progressing for ``stall_s`` seconds."""
    import subprocess
    import time

    log_ = logging.getLogger("ssp.train.supervisor")

    def progress_mtime() -> float:
        latest = 0.0
        for name in ("metrics_train.jsonl", "metrics_val.jsonl"):
            p = exper.root / name
            if p.exists():
                latest = max(latest, p.stat().st_mtime)
        return latest

    child = subprocess.Popen(cmd)
    last = time.time()
    last_mtime = progress_mtime()
    while True:
        r = child.poll()
        if r is not None:
            return r
        time.sleep(poll_s)
        m = progress_mtime()
        if m > last_mtime:
            last_mtime, last = m, time.time()
        elif time.time() - last > stall_s:
            log_.error(
                "no metrics progress for %.0f s — killing hung child %d",
                stall_s, child.pid,
            )
            child.kill()
            child.wait()
            return 124


def run_supervised(
    command: str, config_path: str, exper_name: str, max_restarts: int,
    debug: bool = False,
) -> int:
    """Crash-resilient training: run the real training in a child
    process; if it dies (nonzero exit — including SIGKILL from the
    kernel OOM killer, which no in-process handler can survive), write
    a resume config pointing at the newest checkpoint and relaunch.

    This is the process-granularity recovery the reference approximates
    with its Ctrl-C handler (``train4.py:96-102``) — but it also covers
    failures Python never sees.

    Hang detection: the TPU tunnel can die mid-op and leave the child
    blocked forever inside a device call (observed: a ~1 h link outage
    froze a run at iter 110k with the process alive at 7% CPU).  The
    supervisor watches the experiment's metrics files; if nothing
    progresses for ``SSP_STALL_TIMEOUT_S`` seconds (default 2400 —
    generous enough for corpus upload + first compile), the child is
    killed and resumed from the newest checkpoint like a crash."""
    import os
    import sys

    import yaml

    from ssp.train.checkpoint import latest_checkpoint

    log_ = logging.getLogger("ssp.train.supervisor")
    stall_s = float(os.environ.get("SSP_STALL_TIMEOUT_S", "2400"))
    cfg_file = config_path
    rc = 1

    for attempt in range(max_restarts + 1):
        cmd = [sys.executable, "-m", "ssp.cli.train", command, cfg_file, exper_name]
        if debug:
            cmd.append("--debug")
        rc = watched_call(cmd, ExperimentPaths(exper_name), stall_s)
        if rc == 0:
            return 0
        exper = ExperimentPaths(exper_name)
        ckpt = latest_checkpoint(exper.checkpoints)
        if ckpt is None:
            log_.error("child exited %d with no checkpoint to resume from", rc)
            return rc
        cfg = load_config(config_path)
        cfg["pretrained"] = str(ckpt)
        cfg["retrain"] = False
        cfg["reset_iter"] = False
        cfg_file = str(exper.root / "resume_auto.yaml")
        with open(cfg_file, "w") as f:
            yaml.safe_dump(cfg, f)
        log_.warning(
            "child exited %d; restart %d/%d from %s",
            rc, attempt + 1, max_restarts, ckpt,
        )
    return rc


if __name__ == "__main__":
    main()

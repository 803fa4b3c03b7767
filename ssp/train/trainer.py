"""Training agent: orchestration around the jitted step.

Functional replacement for the reference's agent classes
(``Train_model_frontend_all.py`` / ``Train_model_heatmap_all.py``):
config merge, interval scaling for gradient accumulation, the
iteration-based train loop with interleaved validation, periodic
checkpointing, metric logging, Ctrl-C checkpoint rescue
(``train4.py:96-102``).

Registry names ``Train_model_heatmap``, ``Train_model_heatmap_all``,
``Train_model_frontend``, ``Train_model_frontend_all`` all map here —
the reference splits base/subclass and ships stale config names
(``configs/magicpoint_shapes_pair.yaml:65`` vs the actual class); one
agent with aliases removes that landmine.

Batch-size semantics: the reference "mimics" ``real_batch_size`` by
gradient accumulation over ``r = real/batch`` micro-batches and scales
every interval by ``r`` (``Train_model_heatmap_all.py:94-112``).  Here
the device mesh makes the *real* batch the actual global batch; n_iter
still counts micro-batches (step advances by ``r``) so configs and
checkpoint numbering line up with the reference.
"""

from __future__ import annotations

import logging
import signal
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssp import registry
from ssp.data.pipeline import prepare_batch
from ssp.models import build_model
from ssp.parallel import make_mesh, shard_batch
from ssp.registry import register
from ssp.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from ssp.train.state import create_train_state
from ssp.train.step import make_train_step
from ssp.utils.experiment import ExperimentPaths, MetricsLogger

log = logging.getLogger(__name__)


def shard_batch_axis1(batch, mesh):
    """Shard [steps, B, ...] host arrays over the data axis on axis 1."""
    return shard_batch(batch, mesh, axis=1)

DEFAULT_CONFIG: Dict[str, Any] = {
    "train_iter": 170000,
    "save_interval": 2000,
    "tensorboard_interval": 200,
    "validation_interval": 1000,
    "validation_size": 4,
    "model": {
        "batch_size": 16,
        "eval_batch_size": 16,
        "learning_rate": 0.001,
        "detector_loss": {"loss_type": "softmax"},
        "lambda_loss": 1,
        "multi_task_loss": False,
        "dense_loss": {"enable": False, "params": {}},
        "sparse_loss": {"enable": True, "params": {}},
    },
    "data": {
        "semantic": False,
        "ignore_class": 133,
        "gaussian_label": {"enable": False, "params": {}},
        "augmentation": {"photometric": {"enable": False}, "homographic": {"enable": False}},
        "warped_pair": {"enable": False},
    },
}


def precision_recall(heatmap: np.ndarray, labels: np.ndarray, thresh: float = 0.015):
    """Thresholded-heatmap precision/recall vs the binary label map
    (reference ``batch_precision_recall``,
    ``Train_model_heatmap_all.py:613-621``)."""
    pred = (heatmap >= thresh).astype(np.float32)
    lab = (labels > 0).astype(np.float32)
    tp = (pred * lab).sum()
    precision = tp / max(pred.sum(), 1e-6)
    recall = tp / max(lab.sum(), 1e-6)
    return float(precision), float(recall)


@register(
    "agent",
    "Train_model_heatmap",
    "Train_model_heatmap_all",
    "Train_model_frontend",
    "Train_model_frontend_all",
)
class TrainAgent:
    def __init__(
        self,
        config: Dict[str, Any],
        save_path: Optional[ExperimentPaths] = None,
        exper_name: str = "exp",
        mesh=None,
    ):
        from ssp.utils.config import dict_update
        import copy

        self.config = dict_update(copy.deepcopy(DEFAULT_CONFIG), config)
        m = self.config["model"]
        self.batch_size = int(m["batch_size"])
        self.real_batch_size = int(m.get("real_batch_size", self.batch_size))
        self.r = max(self.real_batch_size // self.batch_size, 1)
        for k in ("train_iter", "validation_interval", "tensorboard_interval", "save_interval"):
            self.config[k] = int(self.config[k]) * self.r

        self.exper = save_path or ExperimentPaths(exper_name)
        self.exper.dump_config(self.config)
        self._heat_fn = None
        self._residual_fn = None
        self._val_logger = None
        if mesh is None:
            # data-parallel mesh over the largest device count that
            # divides the global batch (batches shard evenly or not at all)
            devices = jax.devices()
            n = len(devices)
            while self.real_batch_size % n:
                n -= 1
            mesh = make_mesh(devices[:n])
        self.mesh = mesh
        self.n_iter = 0
        self.max_iter = self.config["train_iter"]

        self._build()
        self.train_loader: Optional[Iterator] = None
        self.val_loader: Optional[Iterator] = None

    # -- construction -------------------------------------------------
    def _build(self) -> None:
        m = self.config["model"]
        data = self.config["data"]
        model_params = dict(m.get("params") or {})
        self.model = build_model(m["name"], **model_params)
        self.semantic = bool(data.get("semantic", False))
        self.warped_pair = bool(data.get("warped_pair", {}).get("enable", False))

        size = data.get("preprocessing", {}).get("resize", [120, 160])
        self.input_hw = (int(size[0]), int(size[1]))

        key = jax.random.key(int(self.config.get("seed", 0)))
        self.state = create_train_state(
            self.model,
            key,
            (1, *self.input_hw, 1),
            learning_rate=float(m["learning_rate"]),
            max_steps=max(self.max_iter // self.r, 1),
        )

        if m.get("dense_loss", {}).get("enable"):
            desc_loss, desc_params = "dense", dict(m["dense_loss"].get("params") or {})
            desc_params = {
                "lambda_d": desc_params.get("lambda_d", 250),
                "descriptor_dist": desc_params.get("descriptor_dist", 4),
            }
        else:
            p = dict(m.get("sparse_loss", {}).get("params") or {})
            desc_loss = "sparse"
            desc_params = {
                "num_matching_attempts": int(p.get("num_matching_attempts", 1000)),
                "num_masked_non_matches_per_match": int(
                    p.get("num_masked_non_matches_per_match", 100)
                ),
                "lamda_d": float(p.get("lamda_d", 1.0)),
                "method": p.get("method", "2d"),
            }

        step_kwargs = dict(
            semantic=self.semantic,
            warped_pair=self.warped_pair,
            det_loss_type=m.get("detector_loss", {}).get("loss_type", "softmax"),
            desc_loss=desc_loss,
            desc_params=desc_params,
            lambda_loss=float(m.get("lambda_loss", 1)),
            multi_task=bool(m.get("multi_task_loss", False)),
            ignore_class=int(data.get("ignore_class", 133)),
            sem_fused=bool(m.get("fused_semantic_ce", True)),
        )
        self._step_kwargs = dict(step_kwargs)  # for variant rebuilds (profiling)
        self.train_step, self.eval_step = make_train_step(**step_kwargs)
        # reference-exact micro-batch gradient accumulation (summed
        # grads, per-micro BN) — optional; the default is the real
        # global batch (documented deviation, SURVEY §2.7)
        if bool(m.get("exact_accumulation", False)) and self.r > 1:
            from ssp.train.step import make_accum_train_step

            self.train_step = make_accum_train_step(self.r, **step_kwargs)
            log.info("exact gradient accumulation: r=%d micro-batches", self.r)

        aug = data.get("augmentation", {})
        gl = data.get("gaussian_label", {})
        sigma = None
        if gl.get("enable"):
            sigma = float(gl.get("params", {}).get("GaussianBlur", {}).get("sigma", 0.2))
        self._prep_train = self._make_prepare(
            photometric=self._photo_cfg(aug.get("photometric", {}), "train"),
            homographic=aug.get("homographic", {}),
            warped_pair=data.get("warped_pair", {}),
            gaussian_label_sigma=sigma,
            ignore_class=int(data.get("ignore_class", 133)),
            sem_warp_mode=data.get("sem_warp_mode", "bilinear"),
        )
        self._prep_val = self._make_prepare(
            photometric=self._photo_cfg(aug.get("photometric", {}), "val"),
            homographic=self._val_homographic(aug.get("homographic", {})),
            warped_pair=data.get("warped_pair", {}),
            gaussian_label_sigma=sigma,
            ignore_class=int(data.get("ignore_class", 133)),
            sem_warp_mode=data.get("sem_warp_mode", "bilinear"),
        )

        # multiple optimizer steps per device dispatch: a lax.scan over
        # stacked host batches amortizes dispatch latency (useful on
        # high-latency links; semantics identical, metrics = last step)
        self.steps_per_dispatch = max(int(self.config.get("steps_per_dispatch", 1)), 1)
        if self.steps_per_dispatch > 1:
            # n_iter advances by r·k per dispatch — align intervals so
            # save/validate/log points are never skipped
            stride = self.r * self.steps_per_dispatch
            for k in ("validation_interval", "tensorboard_interval", "save_interval"):
                v = int(self.config[k])
                self.config[k] = max(((v + stride - 1) // stride) * stride, stride)
        if self.steps_per_dispatch > 1:
            prep = self._prep_train

            def multi_step(state, stacked_batches, key):
                keys = jax.random.split(key, self.steps_per_dispatch)

                def body(st, inp):
                    k, batch_raw = inp
                    k_prep, k_step = jax.random.split(k)
                    batch = prep(k_prep, batch_raw)
                    # read self.train_step at trace time, not build
                    # time: subclasses (SubpixelTrainAgent) swap the
                    # step AFTER super()._build() returns
                    st, metrics = self.train_step(st, batch, k_step)
                    return st, metrics

                state, metrics = jax.lax.scan(body, state, (keys, stacked_batches))
                return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

            self.multi_train_step = jax.jit(multi_step, donate_argnums=(0,))

        # device-resident corpus mode (see ssp/data/device_corpus.py):
        # attach_device_corpus uploads the dataset once and training
        # samples batches on device — zero host->device transfers in
        # steady state (tunnel staging-buffer leak mitigation + no
        # per-step host round-trip)
        self.device_corpus = None
        self.corpus_train_step = None
        self._corpus_key = None

        pretrained = self.config.get("pretrained")
        if not pretrained and self.config.get("auto_resume", True) \
                and not self.config.get("retrain", False):
            # relaunching into an experiment that already has
            # checkpoints continues it (full resume) instead of
            # silently restarting from scratch — the r5 flagship
            # relaunch lost 25 min of chip window to exactly that
            # (config without a `pretrained:` pointer).  Opt out with
            # `auto_resume: false` or `retrain: true`.
            prev = latest_checkpoint(self.exper.checkpoints)
            if prev is not None:
                log.warning("auto-resuming from %s (auto_resume)", prev)
                self.state = load_checkpoint(prev, self.state, mode="full")
                self.n_iter = int(self.state.step) * self.r
        elif pretrained and not self.config.get("retrain", False):
            mode = "full" if not self.config.get("reset_iter", True) else "weights"
            log.info("loading pretrained %s (mode=%s)", pretrained, mode)
            self.state = load_checkpoint(
                pretrained, self.state, mode=mode,
                reset_iter=bool(self.config.get("reset_iter", True)),
            )
            self.n_iter = int(self.state.step) * self.r

    def attach_device_corpus(self, dataset) -> None:
        """Upload ``dataset`` to the mesh and build the fused
        sample->prep->step dispatch (scan of ``steps_per_dispatch``).
        Replaces ``train_loader`` for the training stream; validation
        keeps the host loader."""
        from ssp.data.device_corpus import DeviceCorpus

        self.device_corpus = DeviceCorpus.from_dataset(
            dataset, self.mesh,
            quantize=bool(
                (self.config.get("training") or {}).get(
                    "device_corpus_quantize", False
                )
            ),
        )
        dc = self.device_corpus
        prep = self._prep_train
        spd = self.steps_per_dispatch
        bs = self.real_batch_size

        def corpus_step(state, corpus, key):
            # the carried key is split *inside* the program and the
            # advanced key returned: the host loop runs exactly ONE
            # device op per dispatch.  Per-iteration host-side
            # `jax.random.split` + unpacking cost 4 extra tiny device
            # programs each, and on the high-latency tunnel every
            # in-flight program can pay a full round-trip (~230 ms) —
            # measured 925 ms/dispatch from the loop vs 1.3 ms enqueue
            # when the dispatch is a single fused program.
            key, k_seq = jax.random.split(key)
            keys = jax.random.split(k_seq, spd)

            def body(st, k):
                k_samp, k_prep, k_step = jax.random.split(k, 3)
                raw = dc.sample(corpus, k_samp, bs, self.mesh)
                batch = prep(k_prep, raw)
                st, metrics = self.train_step(st, batch, k_step)
                return st, metrics

            state, metrics = jax.lax.scan(body, state, keys)
            return state, jax.tree_util.tree_map(lambda m: m[-1], metrics), key

        self.corpus_train_step = jax.jit(corpus_step, donate_argnums=(0, 2))
        log.info(
            "device corpus attached: %d samples, %s",
            dc.n,
            {k: (v.shape, str(v.dtype)) for k, v in dc.arrays.items()},
        )

    @staticmethod
    def _photo_cfg(cfg: Dict[str, Any], split: str) -> Dict[str, Any]:
        cfg = dict(cfg)
        enable_key = f"enable_{split}"
        if enable_key in cfg:
            cfg["enable"] = bool(cfg.get("enable", False)) and bool(cfg[enable_key])
        return cfg

    @staticmethod
    def _val_homographic(cfg: Dict[str, Any]) -> Dict[str, Any]:
        cfg = dict(cfg)
        if "enable_val" in cfg:
            cfg["enable"] = bool(cfg.get("enable", False)) and bool(cfg["enable_val"])
        return cfg

    def _make_prepare(self, **prep_cfg):
        has_sem = self.semantic

        def prep(key, host_batch):
            sem = host_batch.get("sem") if has_sem else None
            return prepare_batch(
                key,
                host_batch["image"],
                host_batch["points"],
                host_batch["points_valid"],
                sem=sem,
                **prep_cfg,
            )

        return jax.jit(prep)

    # -- loop ---------------------------------------------------------
    def train(self) -> None:
        assert self.train_loader is not None or self.device_corpus is not None, (
            "set train_loader or attach_device_corpus first"
        )
        logger = MetricsLogger(self.exper, "train")
        tb_int = self.config["tensorboard_interval"]
        val_int = self.config["validation_interval"]
        save_int = self.config["save_interval"]
        key = jax.random.key(int(self.config.get("seed", 0)) + 1)

        interrupted = {"flag": False}
        prev_handler = signal.signal(
            signal.SIGINT, lambda *_: interrupted.update(flag=True)
        )
        # optional jax.profiler trace of the first post-warmup steps
        # (config: profile: {enable: true, logdir: ..., steps: N})
        prof_cfg = self.config.get("profile", {}) or {}
        prof_active = False
        prof_done = False
        stride = self.r * self.steps_per_dispatch

        def hits(n0: int, n1: int, interval: int, lo: int = 0) -> bool:
            """True iff a multiple of ``interval`` lies in [max(n0, lo), n1).

            Interval checks must be window-crossing tests: with
            ``steps_per_dispatch`` > 1 the iteration counter advances by
            the whole stride at once and a plain ``n_iter % interval``
            check would never fire (the counter lands on
            j·stride + r·(k−1), never on a multiple of the interval)."""
            a = max(n0, lo)
            if n1 <= a or interval <= 0:
                return False
            return (n1 - 1) // interval >= -(-a // interval)

        # host-memory watchdog: long tunnel-backed runs have been
        # OOM-killed by the kernel with no Python-visible error (and no
        # final checkpoint — the SIGKILL skips `finally`).  RSS is
        # logged with every metrics row for leak diagnosis, and when it
        # crosses the budget the trainer checkpoints and raises a clear
        # error instead of dying silently.  Budget defaults to 85% of
        # MemTotal; set ``rss_budget_mb: 0`` to disable.
        import resource

        def rss_mb() -> float:
            return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

        budget_mb = self.config.get("rss_budget_mb")
        if budget_mb is None:
            try:
                with open("/proc/meminfo") as f:
                    total_kb = int(f.readline().split()[1])
                budget_mb = 0.85 * total_kb / 1024.0
            except OSError:
                budget_mb = 0
        budget_mb = float(budget_mb)

        t0 = time.time()
        n_last_log = self.n_iter
        try:
            while self.n_iter < self.max_iter and not interrupted["flag"]:
                n0 = self.n_iter
                if (prof_cfg.get("enable") and not prof_active and not prof_done
                        and n0 >= 2 * self.r):
                    jax.profiler.start_trace(
                        prof_cfg.get("logdir", str(self.exper.root / "profile"))
                    )
                    prof_active = True
                if self.device_corpus is not None:
                    # single device op per dispatch: the PRNG key is
                    # carried through the program (see corpus_step) —
                    # no per-iteration split/unpack programs on the link
                    if self._corpus_key is None:
                        key, k0 = jax.random.split(key)
                        self._corpus_key = k0
                    self.state, metrics, self._corpus_key = self.corpus_train_step(
                        self.state, self.device_corpus.arrays, self._corpus_key
                    )
                elif self.steps_per_dispatch > 1:
                    key, k_prep, k_step = jax.random.split(key, 3)
                    raws = [next(self.train_loader) for _ in range(self.steps_per_dispatch)]
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.stack(xs), *raws
                    )
                    stacked = shard_batch_axis1(stacked, self.mesh)
                    self.state, metrics = self.multi_train_step(
                        self.state, stacked, k_step
                    )
                else:
                    key, k_prep, k_step = jax.random.split(key, 3)
                    host_batch = next(self.train_loader)
                    batch = self._prep_train(k_prep, shard_batch(host_batch, self.mesh))
                    self.state, metrics = self.train_step(self.state, batch, k_step)
                self.n_iter = n0 + stride
                if prof_active and self.n_iter >= (2 + int(prof_cfg.get("steps", 5))) * self.r:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    prof_active = False
                    prof_done = True

                # events are labeled with the interval boundary the
                # window crossed (largest multiple below n_iter), so
                # checkpoint names / metric steps stay on the familiar
                # multiples regardless of the dispatch stride
                def boundary(interval: int) -> int:
                    return ((self.n_iter - 1) // interval) * interval

                if hits(n0, self.n_iter, tb_int):
                    import gc

                    gc.collect()  # drop cyclic garbage holding device handles
                    scal = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    scal["iters_per_s"] = (
                        (self.n_iter - n_last_log) / max(time.time() - t0, 1e-9)
                        if n0 else 0.0
                    )
                    scal["host_rss_mb"] = rss_mb()
                    if budget_mb and scal["host_rss_mb"] > budget_mb:
                        save_checkpoint(
                            self.exper.checkpoints, self.state, self.n_iter
                        )
                        raise RuntimeError(
                            f"host RSS {scal['host_rss_mb']:.0f} MB exceeds the "
                            f"{budget_mb:.0f} MB budget at iter {self.n_iter}; "
                            "checkpoint saved — resume with pretrained: "
                            f"{self.exper.checkpoints}/superPointNet_{self.n_iter}"
                        )
                    t0 = time.time()
                    n_last_log = self.n_iter
                    b = boundary(tb_int)
                    logger.log(b, scal)
                    log.info(
                        "iter %d loss %.4f det %.4f desc %.4f",
                        b, scal["loss"], scal["loss_det"], scal["loss_desc"],
                    )

                if val_int and self.val_loader is not None and hits(n0, self.n_iter, val_int):
                    # dedicated subkey: never reuse the carried key, or the
                    # first val batch's prep/step keys would equal the next
                    # training step's (correlated augmentation streams)
                    key, k_val = jax.random.split(key)
                    self._validate(k_val, label=boundary(val_int))

                if hits(n0, self.n_iter, save_int, lo=1):
                    save_checkpoint(
                        self.exper.checkpoints, self.state, boundary(save_int)
                    )
        finally:
            signal.signal(signal.SIGINT, prev_handler)
            save_checkpoint(self.exper.checkpoints, self.state, self.n_iter)
            logger.close()
            if self._val_logger is not None:
                self._val_logger.close()
                self._val_logger = None

    def _validate(self, key: jax.Array, label: Optional[int] = None) -> None:
        # one logger for the whole run: a fresh MetricsLogger per call
        # would open a new timestamped TensorBoard event dir every
        # validation, fragmenting the scalar curves across ~hundreds of
        # files on a long run
        if self._val_logger is None:
            self._val_logger = MetricsLogger(self.exper, "val")
        logger = self._val_logger
        step_label = self.n_iter if label is None else label
        n_batches = int(self.config.get("validation_size", 4)) + 1
        agg: Dict[str, list] = {}
        first_batch = None
        for i in range(n_batches):
            host_batch = next(self.val_loader)
            key, k_prep, k_step = jax.random.split(key, 3)
            batch = self._prep_val(k_prep, shard_batch(host_batch, self.mesh))
            if i == 0:
                first_batch = batch
            metrics = self.eval_step(self.state, batch, k_step)
            for k, v in jax.device_get(metrics).items():
                agg.setdefault(k, []).append(float(v))
        scalars = {k: float(np.mean(v)) for k, v in agg.items()}
        # val_residual_diagnostic: true enables the soft-argmax
        # residual probe — it is pure TensorBoard telemetry, and its
        # jitted program has been observed to wedge the axon tunnel
        # client on some deployments (D2H fetch never completes), so
        # it is opt-in (default off; cost the r4 flagship ~65 min).
        # The reference's residual histograms are likewise interval-
        # gated telemetry that never blocks training
        # (Train_model_heatmap_all.py:568-571).
        run_residual = bool(self.config.get("val_residual_diagnostic", False))
        if first_batch is not None and run_residual:
            self._residual_offsets = None
            err = self._residual_diagnostic(first_batch)
            if err is not None:
                scalars["subpix_residual_err"] = err
            if getattr(self, "_residual_offsets", None) is not None:
                logger.log_histogram(
                    step_label, "val/subpix_residual_offsets",
                    self._residual_offsets,
                )
        logger.log(step_label, scalars, prefix="val_")
        if first_batch is not None:
            self._log_val_images(logger, first_batch, step_label)

    def _residual_diagnostic(self, batch) -> Optional[float]:
        """Soft-argmax subpixel offsets at label positions vs the true
        fractional residuals (reference ``pred_soft_argmax`` diagnostics,
        ``Train_model_heatmap_all.py:623-675``)."""
        if "points" not in batch or "points_valid" not in batch:
            return None
        try:
            if self._residual_fn is None:
                from ssp.core.grid import flatten_detection
                from ssp.losses.subpixel import subpixel_residual_loss

                apply_fn = self.state.apply_fn

                from ssp.postprocess.points import soft_argmax_refine

                def residual_fn(params, stats, images, points, points_valid):
                    out = apply_fn(
                        {"params": params, "batch_stats": stats}, images,
                        train=False,
                    )
                    heat = flatten_detection(out["semi"])[..., 0]

                    def one(h, p, v):
                        r = jnp.round(p[:, :2])
                        loss = subpixel_residual_loss(h, r, p[:, :2] - r, v)
                        # per-point predicted offsets for the TB
                        # histogram (reference logs residual
                        # distributions, Train_model_frontend_all.py:568)
                        pts3 = jnp.concatenate(
                            [r, jnp.zeros_like(r[:, :1])], axis=-1
                        )
                        off = soft_argmax_refine(h, pts3)[:, :2] - r
                        return loss, off

                    losses, offs = jax.vmap(one)(heat, points, points_valid)
                    return jnp.mean(losses), offs, points_valid

                self._residual_fn = jax.jit(residual_fn)
            err, offs, valid = self._residual_fn(
                self.state.params, self.state.batch_stats,
                batch["image"], batch["points"], batch["points_valid"],
            )
            offs = np.asarray(offs)[np.asarray(valid)]
            self._residual_offsets = offs  # picked up by _validate
            return float(err)
        except Exception:  # diagnostics must never kill training
            log.exception("residual diagnostic failed")
            return None

    def _log_val_images(self, logger: MetricsLogger, batch, step: int) -> None:
        """Heatmap / label / NMS overlays and the warped-pair panel for
        the first val image (reference TensorBoard image logging,
        ``Train_model_frontend_all.py:535-566``: label overlay, NMS
        detection overlay, and the warped view)."""
        try:
            from ssp.core.grid import flatten_detection
            from ssp.postprocess.points import extract_keypoints
            from ssp.utils.draw import draw_keypoints, img_overlap

            if self._heat_fn is None:
                apply_fn = self.state.apply_fn

                def heat_fn(params, stats, img):
                    out = apply_fn(
                        {"params": params, "batch_stats": stats}, img, train=False
                    )
                    return flatten_detection(out["semi"])

                self._heat_fn = jax.jit(heat_fn)
            det_thresh = float(
                self.config["model"].get("detection_threshold", 0.015)
            )
            nms_rad = int(self.config["model"].get("nms", 4))

            def panels(img_dev, labels_dev, tag):
                heat = jax.device_get(
                    self._heat_fn(self.state.params, self.state.batch_stats,
                                  img_dev[:1])
                )[0, ..., 0]
                img = np.asarray(jax.device_get(img_dev[0, ..., 0]))
                labels = np.asarray(jax.device_get(labels_dev[0, ..., 0]))
                logger.log_image(step, f"val/{tag}_heatmap_overlay",
                                 img_overlap(heat / max(heat.max(), 1e-6),
                                             labels, img))
                pts, valid = extract_keypoints(
                    jnp.asarray(heat), k=300, conf_thresh=det_thresh,
                    nms_radius=nms_rad,
                )
                pts = np.asarray(jax.device_get(pts))[np.asarray(valid)]
                logger.log_image(step, f"val/{tag}_nms_detections",
                                 draw_keypoints(img, pts))

            panels(batch["image"], batch["labels_2d"], "base")
            if "warped_image" in batch:
                panels(batch["warped_image"], batch["warped_labels_2d"], "warped")
        except Exception:  # visualization must never kill training
            log.exception("val image logging failed")

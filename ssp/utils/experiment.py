"""Experiment directories + metrics logging.

Reference layout (``train4.py:63-66``, ``utils/utils.py:952-961``):
``EXPER_PATH/<exper_name>/`` holds ``config.yml`` and ``checkpoints/``;
TensorBoard events go to ``runs/<task>/<exper>_<date>``.  We write
structured JSONL always (machine-readable, greppable) and TensorBoard
events too when TensorFlow is importable (it is in this image).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional


def settings_paths() -> Dict[str, Path]:
    """DATA_PATH / EXPER_PATH roots (reference ``settings.py:6-9``),
    overridable by environment."""
    return {
        "DATA_PATH": Path(os.environ.get("SSP_DATA_PATH", "datasets")),
        "EXPER_PATH": Path(os.environ.get("SSP_EXPER_PATH", "logs")),
    }


class ExperimentPaths:
    def __init__(self, exper_name: str, exper_path: Optional[Path] = None):
        root = exper_path or settings_paths()["EXPER_PATH"]
        self.root = Path(root) / exper_name
        self.checkpoints = self.root / "checkpoints"
        self.predictions = self.root / "predictions"
        self.root.mkdir(parents=True, exist_ok=True)
        self.checkpoints.mkdir(parents=True, exist_ok=True)

    def dump_config(self, config: Dict[str, Any]) -> None:
        import yaml

        def sanitize(x):
            if isinstance(x, dict):
                return {k: sanitize(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return [sanitize(v) for v in x]
            if isinstance(x, (str, int, float, bool)) or x is None:
                return x
            return str(x)  # dtypes, paths, callables → repr

        with open(self.root / "config.yml", "w") as f:
            yaml.safe_dump(sanitize(config), f)


class MetricsLogger:
    """JSONL + optional TensorBoard scalar logging."""

    def __init__(self, exper: ExperimentPaths, task: str = "train", use_tb: bool = True):
        self._jsonl = open(exper.root / f"metrics_{task}.jsonl", "a")
        self._tb = None
        if use_tb:
            try:
                import tensorflow as tf  # noqa: F401

                stamp = _dt.datetime.now().strftime("%m-%d-%H:%M")
                logdir = Path("runs") / task / f"{exper.root.name}_{stamp}"
                self._tb = tf.summary.create_file_writer(str(logdir))
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float], prefix: str = "") -> None:
        rec = {"step": int(step)}
        rec.update({f"{prefix}{k}": float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(f"{prefix}{k}", float(v), step=int(step))

    def log_image(self, step: int, name: str, image) -> None:
        """Log an image overlay to TensorBoard (reference logs label/NMS/
        heatmap overlays, ``Train_model_frontend_all.py:535-566``).
        image: [H, W] or [H, W, C] float in [0, 1] or uint8."""
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf

        img = np.asarray(image)
        if img.ndim == 2:
            img = img[..., None]
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        with self._tb.as_default():
            tf.summary.image(name, img[None], step=int(step))

    def log_histogram(self, step: int, name: str, values) -> None:
        """Log a value distribution to TensorBoard (reference logs
        subpixel-residual histograms,
        ``Train_model_frontend_all.py:568-571``)."""
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf

        vals = np.asarray(values).reshape(-1)
        if vals.size == 0:
            return
        with self._tb.as_default():
            tf.summary.histogram(name, vals, step=int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            # tf buffers events (~120 s flush interval): without an
            # explicit close, scalars logged since the last periodic
            # flush never reach the events file
            self._tb.close()
            self._tb = None

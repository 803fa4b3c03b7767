"""Multi-process (multi-host stand-in) correctness: one global train
step over a 2-process × 4-device mesh must equal the single-process
8-device result.  This exercises the ``jax.distributed`` DCN path the
single-process multichip tests can't: cross-process batch construction
(``make_array_from_process_local_data``) and a gradient all-reduce that
spans processes.  SURVEY §2.7."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
WORKER = Path(__file__).parent / "multiproc_worker.py"
HA_WORKER = Path(__file__).parent / "multiproc_ha_worker.py"


def _env(n_dev: int) -> dict:
    env = {
        **os.environ,
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_dev}",
    }
    # workers must not inherit a pytest-level device-count selection
    env.pop("JAX_NUM_CPU_DEVICES", None)
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_step_matches_single(tmp_path):
    single = tmp_path / "single.json"
    r = subprocess.run(
        [sys.executable, str(WORKER), "0", "1", "", str(single)],
        env=_env(8), cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    multi = tmp_path / "multi.json"
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", coord, str(multi)],
            env=_env(4), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]

    a = json.loads(single.read_text())
    b = json.loads(multi.read_text())
    assert a["loss"] == pytest.approx(b["loss"], rel=1e-6, abs=1e-7)
    assert a["checksum"] == pytest.approx(b["checksum"], rel=1e-6)


def test_two_process_ha_export_matches_single(tmp_path):
    """Production pod export lane: `run_ha_export` over a 2-process ×
    4-device mesh must write the same npz files (names AND point sets)
    as the single-process 8-device run — each host writes only its own
    rows, so this also checks no file is written twice or dropped."""
    import numpy as np

    single = tmp_path / "single"
    r = subprocess.run(
        [sys.executable, str(HA_WORKER), "0", "1", "", str(single)],
        env=_env(8), cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    multi = tmp_path / "multi"
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(HA_WORKER), str(i), "2", coord, str(multi)],
            env=_env(4), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]

    names_s = sorted(p.name for p in single.glob("*.npz"))
    names_m = sorted(p.name for p in multi.glob("*.npz"))
    assert names_s == names_m and len(names_s) == 12
    for name in names_s:
        pts_s = np.load(single / name)["pts"]
        pts_m = np.load(multi / name)["pts"]
        assert pts_s.shape == pts_m.shape, name
        np.testing.assert_allclose(pts_m, pts_s, rtol=1e-5, atol=1e-5,
                                   err_msg=name)

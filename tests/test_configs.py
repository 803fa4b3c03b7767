"""Every shipped config parses, and its names resolve in the registry."""

from pathlib import Path

import pytest
import yaml

import ssp  # noqa: F401 — populates registries
from ssp import registry

CONFIG_DIR = Path(__file__).parent.parent / "configs"
CONFIGS = sorted(CONFIG_DIR.glob("*.yaml"))


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.name)
def test_config_parses_and_resolves(path):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    assert "data" in cfg and "model" in cfg

    dataset = cfg["data"].get("dataset")
    if dataset:
        registry.get("dataset", dataset)  # raises if unknown

    model = cfg["model"].get("name")
    if model and model not in ("sift", "orb"):  # classical baselines
        registry.get("model", model)

    agent = cfg.get("front_end_model")
    if agent:
        registry.get("agent", agent)


def test_reference_registry_names_present():
    """The reference's public selection strings must all resolve."""
    for name in (
        "SyntheticDataset_gaussian", "Coco", "Coco_sem", "Kitti_inh",
        "Tum", "Apollo", "hpatches", "PatchesDataset",
    ):
        registry.get("dataset", name)
    for name in (
        "SuperPointNet_gauss2", "SuperPointNet_gauss2_ssmall",
        "SuperPointNet_pretrained", "SubpixelNet",
    ):
        registry.get("model", name)
    for name in (
        "Train_model_heatmap", "Train_model_heatmap_all",
        "Train_model_frontend", "Train_model_frontend_all",
        "Val_model_heatmap",
    ):
        registry.get("agent", name)


def test_load_config_does_not_mutate_defaults(tmp_path):
    """dict_update merges in place — load_config must deep-copy the
    caller's defaults or one load poisons every later one."""
    import yaml

    from ssp.utils.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({"model": {"nms": 8}}))
    defaults = {"model": {"nms": 4}}
    cfg = load_config(p, defaults)
    assert cfg["model"]["nms"] == 8
    assert defaults["model"]["nms"] == 4

"""Shipped configs parse and resolve (the reference YAML schema)."""

from pathlib import Path

from yolopoint_tpu.utils.config import load_config, resolve_sub_configs

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"


def test_all_shipped_configs_load():
    files = sorted(CONFIG_DIR.glob("*.yaml"))
    assert len(files) >= 5
    for f in files:
        cfg = load_config(f)
        subs = resolve_sub_configs(cfg, CONFIG_DIR)
        assert subs and all("data" in s or "model" in s for s in subs), f.name


def test_concat_config_composes_two_datasets():
    cfg = load_config(CONFIG_DIR / "concat_datasets.yaml")
    subs = resolve_sub_configs(cfg, CONFIG_DIR)
    assert len(subs) == 2
    names = {s["data"]["dataset"] for s in subs}
    assert names == {"kitti", "coco"}
    # override applied to the coco sub-config
    coco = next(s for s in subs if s["data"]["dataset"] == "coco")
    assert coco["data"]["augmentation"]["mosaic"] == 0.0
    # parent training params flow into every sub-config
    assert all(s["training_params"]["epochs"] == 100 for s in subs)

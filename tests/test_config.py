import os

from vavae_tpu.utils.config import Config, load_config


def test_attr_and_item_access():
    c = Config({"train": {"max_steps": 100}, "lr": 1e-4})
    assert c.train.max_steps == 100
    assert c["train"]["max_steps"] == 100
    assert c.get("missing", 5) == 5


def test_merge_and_override():
    a = Config({"model": {"type": "S/2", "use_rope": True}})
    b = a.merged_with({"model": {"type": "XL/1"}})
    assert b.model.type == "XL/1" and b.model.use_rope is True
    c = b.override(["model.use_rope=false", "train.lr=0.0002"])
    assert c.model.use_rope is False and c.train.lr == 2e-4


def test_yaml_roundtrip(tmp_path):
    p1 = tmp_path / "a.yaml"
    p1.write_text("train:\n  max_steps: 10\nmodel:\n  model_type: LightningDiT-S/2\n")
    p2 = tmp_path / "b.yaml"
    p2.write_text("train:\n  max_steps: 20\n")
    cfg = load_config(str(p1), str(p2), overrides=["data.num_classes=32"])
    assert cfg.train.max_steps == 20
    assert cfg.model.model_type == "LightningDiT-S/2"
    assert cfg.data.num_classes == 32


def test_all_shipped_configs_load():
    """Every YAML in vavae_tpu/configs must load, and model configs must
    resolve to a constructible DiT variant."""
    import glob

    from vavae_tpu.models.dit import LightningDiT_models

    root = os.path.join(os.path.dirname(__file__), "..", "vavae_tpu", "configs")
    paths = glob.glob(os.path.join(root, "**", "*.yaml"), recursive=True)
    assert len(paths) >= 10
    for p in paths:
        cfg = load_config(p)
        mt = cfg.get("model", {}).get("model_type")
        if mt:
            assert mt in LightningDiT_models, f"{p}: unknown model {mt}"
        if "stages" in cfg:
            stages = [dict(s) for s in cfg.stages]
            assert all("epochs" in s and "vf_weight" in s for s in stages)


def test_staged_vavae_configs():
    """The 3-stage recipes carry the reference's stage hyperparameters
    (f16d32_vfdinov2_long.yaml:1-9; step4_train_vavae.py:506-510)."""
    root = os.path.join(os.path.dirname(__file__), "..", "vavae_tpu", "configs")
    long = load_config(os.path.join(root, "vavae_f16d32_long.yaml"))
    s = [dict(x) for x in long.stages]
    assert [x["epochs"] for x in s] == [100, 15, 15]
    assert [x["vf_weight"] for x in s] == [0.5, 0.1, 0.1]
    assert s[2]["distmat_margin"] == 0.25 and s[2]["cos_margin"] == 0.5

    ft = load_config(os.path.join(root, "vavae_microdoppler_finetune.yaml"))
    fs = [dict(x) for x in ft.stages]
    assert [x["epochs"] for x in fs] == [45, 15, 30]
    assert fs[0]["disc_start"] == 5001 and fs[1]["disc_start"] == 1
    assert ft.model.params.lossconfig.params.adaptive_vf is False


def test_reference_config_keys_load():
    """Our loader must read the reference's own YAML files unchanged."""
    ref = "/root/reference/LightningDiT/configs/lightningdit_xl_vavae_f16d32.yaml"
    if not os.path.exists(ref):
        return
    cfg = load_config(ref)
    assert cfg.model.model_type == "LightningDiT-XL/1"
    assert cfg.train.global_batch_size == 1024
    assert cfg.transport.use_cosine_loss is True
    assert cfg.sample.cfg_scale == 10.0

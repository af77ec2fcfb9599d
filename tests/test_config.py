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

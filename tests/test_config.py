import os

from speech2lip_tpu.core.config import (DEFAULT_CONFIG, default_config,
                                        load_config, update_recursive)


def test_update_recursive_deep_merge():
    a = {"x": {"y": 1, "z": 2}, "k": 3}
    update_recursive(a, {"x": {"y": 10}, "new": {"n": 1}})
    assert a == {"x": {"y": 10, "z": 2}, "k": 3, "new": {"n": 1}}


def test_default_config_is_copy():
    c = default_config()
    c["model"]["net_width"] = 999
    assert DEFAULT_CONFIG["model"]["net_width"] == 256


def test_load_config_inherit_chain(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("model:\n  net_width: 128\ntraining:\n  batch_rays: 100\n")
    child = tmp_path / "sub" / "child.yaml"
    os.makedirs(child.parent)
    child.write_text(
        "inherit_from: ../base.yaml\ntraining:\n  batch_rays: 200\n")
    cfg = load_config(str(child))
    assert cfg["model"]["net_width"] == 128        # from base
    assert cfg["training"]["batch_rays"] == 200    # child wins
    assert cfg["model"]["net_depth"] == 8          # from in-code defaults


def test_repo_may_config_loads():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "configs", "may", "may.yaml")
    if not os.path.exists(path):
        import pytest
        pytest.skip("configs/may/may.yaml not written yet")
    cfg = load_config(path)
    assert cfg["data"]["width"] == 120
    assert cfg["data"]["height"] == 80
    assert cfg["model"]["MLP_version"] == "v2"


def test_factory_registry(tmp_path):
    import numpy as np
    from speech2lip_tpu.core import factory
    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.data.synthetic import make_synthetic_tree, synthetic_config
    geo = make_synthetic_tree(str(tmp_path), n_frames=8, face=64,
                              lip_h=32, lip_w=32)
    cfg = synthetic_config(str(tmp_path), geo)
    ds = factory.get_dataset("train", cfg)
    assert len(ds) == 7
    params, unet_p, unet_s = factory.get_model(cfg)
    assert params["fc_uv"]["w"].shape == (42, 256)
    trainer_mod = factory.get_trainer(cfg)
    assert hasattr(trainer_mod, "fit")


def test_all_identity_configs_load():
    """Every shipped identity config loads through inherit_from with its
    reference substring-dispatch constants made explicit (SURVEY §5 quirk)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expect = {
        "may": {"canonical_idx": 0, "mel_fmin": 95.0,
                "val_split_frames": 598, "expand_mask_divisor": 5},
        "obama2": {"canonical_idx": 12, "mel_fmin": 55.0,
                   "val_split_frames": 650, "expand_mask_divisor": 12},
        "obama_adnerf": {"canonical_idx": 0, "mel_fmin": 55.0,
                         "val_split_frames": 800, "expand_mask_divisor": 5,
                         "mouth_center_y_ratio": 1.0},
    }
    for name, fields in expect.items():
        cfg = load_config(os.path.join(here, "configs", name,
                                       f"{name}.yaml"))
        for k, v in fields.items():
            assert cfg["data"][k] == v, (name, k)
        assert cfg["model"]["MLP_version"] == "v2"

import numpy as np
import pytest

from fgn_tpu.config import Config, apply_typed_config
from fgn_tpu.config.core import merge_dicts


def test_attribute_access_nested():
    c = Config.from_dict({"a": {"b": {"c": 1}}, "x": [1, 2]})
    assert c.a.b.c == 1
    c.a.b.c = 2
    assert c["a"]["b"]["c"] == 2


def test_merge_dicts_recursive_and_delete():
    base = {"m": {"x": 1, "y": 2}, "k": 3}
    over = {"m": {"y": 5}, "k": 4}
    out = merge_dicts(base, over)
    assert out == {"m": {"x": 1, "y": 5}, "k": 4}
    out2 = merge_dicts(base, {"m": {"_delete_": True, "z": 9}})
    assert out2["m"] == {"z": 9}


def test_from_file_base_composition(tmp_path):
    (tmp_path / "base.py").write_text(
        "model = dict(depth=50, norm='bn')\nlr = 0.01\n"
    )
    (tmp_path / "child.py").write_text(
        "_base_ = ['base.py']\nmodel = dict(norm='gn')\nwd = 1e-4\n"
    )
    cfg = Config.from_file(str(tmp_path / "child.py"))
    assert cfg.model.depth == 50  # inherited
    assert cfg.model.norm == "gn"  # overridden
    assert cfg.lr == 0.01 and cfg.wd == 1e-4


def test_from_file_ignores_private_and_modules(tmp_path):
    (tmp_path / "c.py").write_text(
        "import os\n_private = 1\nvalue = os.path.join('a', 'b')\n"
    )
    cfg = Config.from_file(str(tmp_path / "c.py"))
    assert "os" not in cfg and "_private" not in cfg
    assert cfg.value == "a/b"


def test_real_configs_compose():
    cfg = Config.from_file("fgn_tpu/configs/fgn_train_mnistiseg_n3k3.py")
    assert cfg.model.n_ways == 3 and cfg.model.k_shots == 3
    assert cfg.model.backbone_norm == "gn"  # scratch base
    assert cfg.optimizer.type == "adagrad"
    assert cfg.train_ds_cfg["batch"] == 8
    ft = Config.from_file("fgn_tpu/configs/fgn_ft_coco2voc.py")
    assert ft.max_epochs == 6  # ft schedule
    assert ft.optimizer.weight_decay == 5e-5
    assert ft.ft_ds_cfg1["sampling_cats"] == "novel"


class _Typed:
    x = 1
    name = "a"
    ratio = 0.5


def test_apply_typed_config_enforces_types():
    obj = _Typed()
    apply_typed_config(obj, {"x": 3, "ratio": 0.25, "new_key": [1]})
    assert obj.x == 3 and obj.ratio == 0.25 and obj.new_key == [1]
    with pytest.raises(TypeError):
        apply_typed_config(_Typed(), {"name": 5})
    # int accepted where float expected (numeric kinship)
    apply_typed_config(obj, {"ratio": 1})
    assert obj.ratio == 1


def test_model_config_from_cfg_and_batch_heuristic():
    from fgn_tpu.config import Config
    from fgn_tpu.main import batch_heuristic, model_config_from_cfg

    cfg = Config.from_file("fgn_tpu/configs/fgn_r50_c4_densecl.py")
    mcfg = model_config_from_cfg(cfg)
    assert mcfg.n_ways == 3 and mcfg.backbone_norm == "frozen_bn"
    assert mcfg.anchor_scales == (2, 4, 8, 16, 32)
    assert mcfg.rcnn_bbox_stds == (0.1, 0.1, 0.2, 0.2)
    # unknown keys in the dict are ignored, not fatal
    cfg.model["bogus_key"] = 1
    model_config_from_cfg(cfg)
    # reference heuristic (main.py:487-501), except N3K1 capped at 8:
    # the reference's batch 10 kills the TPU worker (RESULTS.md)
    assert batch_heuristic(1, 1) == 12
    assert batch_heuristic(3, 1) == 8
    assert batch_heuristic(3, 3) == 8

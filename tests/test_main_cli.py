"""CLI surface: config overlay + dotted --set overrides (main.py)."""

import pytest


def test_set_overrides_parse(tmp_path, monkeypatch):
    """Exercise main's arg handling up to trainer dispatch."""
    captured = {}

    class FakeTrainer:
        def __init__(self, cfg):
            captured["cfg"] = cfg

        def run(self):
            captured["ran"] = True

    import implicit_depth_tpu.train.trainer as trainer_mod
    monkeypatch.setitem(trainer_mod.TRAINERS, "fake", FakeTrainer)

    from implicit_depth_tpu.main import main
    main(["--set", "trainer_name=fake", "exp_type=train",
          "training.lr=0.0005", "grid.res=4", "debug=True",
          "tpu.compute_dtype=float32"])
    cfg = captured["cfg"]
    assert captured.get("ran")
    assert cfg.training.lr == 0.0005
    assert cfg.grid.res == 4
    assert cfg.debug is True
    assert cfg.tpu.compute_dtype == "float32"


def test_unknown_exp_type_raises(monkeypatch):
    class FakeTrainer:
        def __init__(self, cfg):
            pass

    import implicit_depth_tpu.train.trainer as trainer_mod
    monkeypatch.setitem(trainer_mod.TRAINERS, "fake", FakeTrainer)
    from implicit_depth_tpu.main import main
    with pytest.raises(ValueError):
        main(["--set", "trainer_name=fake", "exp_type=bogus"])

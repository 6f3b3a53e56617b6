"""End-to-end reference workflow on generated reference-FORMAT disk data:
scripts/make_disk_datasets.py renders procedural scenes into the exact
ClearGrasp/Omniverse on-disk layouts, and the full trainer loop (mixed
ClearGrasp+Omniverse training + the reference's 4 validation splits +
per-image test CSVs) runs from those files — the same wiring
`configs/train_lidf.yaml` uses (≙ reference train_lidf.py:124-201,625-664).
"""

import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "scripts"))

from implicit_depth_tpu.config import load_config  # noqa: E402

H_SRC, W_SRC = 96, 128


@pytest.fixture(scope="module")
def disk_root(tmp_path_factory):
    from make_disk_datasets import (
        write_cleargrasp_real,
        write_cleargrasp_syn,
        write_omniverse,
    )
    root = str(tmp_path_factory.mktemp("datasets_disk"))
    rng = np.random.default_rng(0)
    cg = osp.join(root, "cleargrasp")
    hw = (H_SRC, W_SRC)
    write_cleargrasp_syn(osp.join(cg, "cleargrasp-dataset-train"), 4, rng, hw)
    write_cleargrasp_syn(osp.join(cg, "cleargrasp-dataset-test-val",
                                  "synthetic-val"), 2, rng, hw)
    write_cleargrasp_syn(osp.join(cg, "cleargrasp-dataset-test-val",
                                  "synthetic-test"), 2, rng, hw)
    write_cleargrasp_real(osp.join(cg, "cleargrasp-dataset-test-val",
                                   "real-val"), 2, rng, hw, "d415")
    write_cleargrasp_real(osp.join(cg, "cleargrasp-dataset-test-val",
                                   "real-test"), 2, rng, hw, "d435")
    write_omniverse(osp.join(root, "omniverse", "train"), 4, rng, hw)
    write_omniverse(osp.join(root, "omniverse", "small_test"), 2, rng, hw)
    return root


def disk_cfg(disk_root, tmp_path):
    return load_config(overrides={
        "trainer_name": "lidf",
        "exp_type": "train",
        "base_log_dir": str(tmp_path / "logs"),
        "log_name": "disk_e2e",
        "mask_type": "all",
        "seed": 0,
        "dataset": {
            "type": "mixed",
            "cleargrasp_root_dir": osp.join(disk_root, "cleargrasp"),
            "omniverse_root_dir": osp.join(disk_root, "omniverse"),
            "img_width": 64, "img_height": 48,
            "use_data_augmentation": True, "depth_aug": True,
            "corrupt_table": True,
        },
        "model": {"rgb_out": 8, "pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8},
        "grid": {"miss_sample_num": 256, "valid_sample_num": 256},
        "training": {"batch_size": 2, "valid_batch_size": 1, "nepochs": 1,
                     "num_workers": 2, "log_interval": 1, "do_valid": False},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32"},
    })


def test_mixed_dataset_from_disk(disk_root):
    from implicit_depth_tpu.config import Config
    from implicit_depth_tpu.data.datasets import get_dataset
    cfg = disk_cfg(disk_root, __import__("pathlib").Path("/tmp"))
    ds = get_dataset(cfg.dataset, "train")
    # 90% of 4 cg-syn frames + 90% of 4 omniverse files
    assert len(ds) == 3 + 3
    for idx in (0, len(ds) - 1):  # one cleargrasp item, one omniverse item
        s = ds[idx]
        assert s["rgb"].shape == (48, 64, 3)
        assert np.isfinite(s["xyz"]).all()
        zeroed = s["depth_corrupt"] == 0
        assert zeroed.any()
        assert np.all(s["corrupt_mask"][zeroed] > 0.5)


@pytest.mark.slow
def test_trainer_on_disk_mixed(disk_root, tmp_path):
    from implicit_depth_tpu.train.trainer import LIDFTrainer
    cfg = disk_cfg(disk_root, tmp_path)
    tr = LIDFTrainer(cfg)
    tr.run()
    assert tr.ckpt.latest_exists()

    # the reference's 4 ClearGrasp validation splits all materialize
    loaders = tr.make_valid_loaders()
    assert set(loaders) == {"synthetic_known", "synthetic_novel",
                            "real_known", "real_novel"}
    res = tr.validate(0, max_batches=1)
    for split in loaders:
        assert np.isfinite(res[split]["loss_net"])
        assert "rmse" in res[split]  # ClearGrasp protocol metrics ran

    # per-image CSV test path (≙ train_lidf.py:625-664)
    tr.test()
    for split in loaders:
        path = osp.join(tr.result_dir, f"{split}.csv")
        assert osp.exists(path)
        lines = open(path).read().strip().splitlines()
        assert lines[-1].startswith("MEAN")

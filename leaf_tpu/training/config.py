"""YAML experiment-config system.

Schema parity with reference utilities/config_parser.py: five sections
(frontend / model / opt / audio_config / data), the same compulsory keys
(config_parser.py:55-61), the same injected optional defaults
(config_parser.py:64-84), manifest paths resolved against ``meta_root``
(config_parser.py:6-52), and the contrastive-type proj_out_dim assertion
(config_parser.py:103-104).

Differences (knowingly): errors raise with messages instead of
``print(ex); exit(-1)``; the parsed config is not printed; the vestigial
LMDB branch maps to packed-dataset paths.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import yaml

__all__ = ["get_config", "parse_config", "get_data_info",
           "check_and_fill_optional_arguments"]


__compulsory_keys__ = {
    "frontend": ["name"],
    "model": ["arch", "type"],
    "opt": ["optimizer", "lr", "batch_size"],
    "audio_config": ["feature", "normalize", "sample_rate", "min_duration"],
    "data": ["meta_root", "is_lmdb", "label_map"],
}

__optional_arguments__ = {
    "frontend": {"default_args": False},
    "model": {"activation": "relu"},
    "opt": {
        "scheduler": "step",
        "agc_clip_factor": 0.01,
        "weight_decay": 0.0,
        "agc_clipping": True,
        "gamma": 0.1,
        "patience": 15,
        "step_size": 30,
        "warmup_epochs": 15,
    },
    "audio_config": {
        "random_clip_size": 2.5,
        "val_clip_size": 2.5,
        "mixup": False,
    },
    "data": {"background_noise_dir": None},
}


def get_data_info(cfg: Dict, augment: Optional[bool] = True) -> Dict:
    """Resolve manifest/label-map paths against meta_root
    (reference: config_parser.py:6-52)."""
    meta_root = cfg["meta_root"]
    label_map = cfg["label_map"]
    is_lmdb = cfg.get("is_lmdb", False)
    if not is_lmdb:
        train_manifest = os.path.join(meta_root, cfg["train_manifest"])
        val_manifest = os.path.join(meta_root, cfg["val_manifest"])
        label_map = os.path.join(meta_root, label_map)
        results = {
            "train": train_manifest,
            "val": val_manifest,
            "labels": label_map,
            "in_memory": cfg.get("in_memory", False),
        }
        test_manifest = cfg.get("test_manifest", None)
        if test_manifest and test_manifest != "None":
            results["test"] = os.path.join(meta_root, test_manifest)
        results["bg_files"] = cfg.get("bg_files", None)
        results["background_noise_dir"] = cfg.get("background_noise_dir", None)
    else:
        # The reference's LMDB branch is vestigial; here "lmdb" configs map
        # onto the packed-shard dataset (leaf_tpu.data.packed_dataset).
        label_map = (os.path.join(meta_root, label_map)
                     if not os.path.exists(label_map) else label_map)
        results = {
            "train": cfg["train_lmdb"],
            "val": cfg["val_lmdb"],
            "labels": label_map,
            "is_lmdb": True,
        }
        test = cfg.get("test_lmdb", None)
        if test and test != "None":
            results["test_lmdb"] = test
        results["background_noise_dir"] = cfg.get("background_noise_dir", None)
    return results


def check_and_fill_optional_arguments(cfg: Dict) -> Dict:
    for k in __compulsory_keys__:
        if k not in cfg:
            raise KeyError(f"config missing required section '{k}'")
    for k, v in cfg.items():
        if k not in __compulsory_keys__:
            raise KeyError(f"unknown config section '{k}'")
        for rkey in __compulsory_keys__[k]:
            if rkey not in v:
                raise KeyError(f"{rkey} not found in section '{k}'")
        for optk, optv in __optional_arguments__[k].items():
            v.setdefault(optk, optv)
    if cfg["model"]["type"] == "contrastive":
        assert "proj_out_dim" in cfg["model"], \
            "contrastive model type requires model.proj_out_dim"
    return cfg


def parse_config(config_file: str) -> Dict:
    with open(config_file, "r") as fd:
        return yaml.load(fd, yaml.FullLoader)


def get_config(config_file: str) -> Dict:
    cfg = parse_config(config_file)
    check_and_fill_optional_arguments(cfg)
    cfg["data"] = get_data_info(cfg["data"])
    return cfg

"""Config system: YAML -> typed sections.

Mirrors the reference's NeatConfig surface (reference: utils/neat_config.py:20-119):
four mandatory sections ``data/model/optimizer/device`` plus optional
``downstream/validate/misc``, glob expansion of ``train_file``/``val_file``/
``test_file``, and a single positional YAML CLI argument.

Differences from the reference (TPU-native rebuild):
  * no TPUClusterResolver / RunConfig — device setup is plain JAX
    (``jax.devices()`` / ``jax.sharding.Mesh``), handled in
    merlot_tpu.parallel.mesh from the ``device`` section.
  * sections stay plain dicts (the reference reads with .get(key, default)
    everywhere, providing an implicit schema; we keep that contract so every
    reference YAML loads unmodified).
"""

from __future__ import annotations

import argparse
import glob as _glob
from copy import deepcopy
from typing import Any, Dict, Optional

import yaml

MANDATORY_SECTIONS = ("data", "model", "optimizer", "device")
OPTIONAL_SECTIONS = ("downstream", "validate", "misc")


def _expand_glob(pattern: str):
    """Expand a comma-separated list of glob patterns (local or gs://...)."""
    out = []
    for piece in pattern.split(","):
        piece = piece.strip()
        if not piece:
            continue
        if "://" in piece:  # remote filesystems via fsspec (tf.gfile analogue)
            import fsspec
            fs, _, paths = fsspec.get_fs_token_paths(piece)
            proto = piece.split("://", 1)[0]
            out.extend(f"{proto}://{p}" for p in sorted(paths)
                       if fs.exists(p))
        else:
            out.extend(sorted(_glob.glob(piece)))
    return out


class NeatConfig:
    """YAML-backed config with dict sections.

    Attributes: data, model, optimizer, device, downstream, validate, misc.
    """

    def __init__(self) -> None:
        self.data: Dict[str, Any] = {}
        self.model: Dict[str, Any] = {}
        self.optimizer: Dict[str, Any] = {}
        self.device: Dict[str, Any] = {}
        self.downstream: Dict[str, Any] = {}
        self.validate: Dict[str, Any] = {}
        self.misc: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    @classmethod
    def from_yaml(cls, config_file: str) -> "NeatConfig":
        with open(config_file, "r") as f:
            config_dict = yaml.safe_load(f)
        return cls.from_dict(config_dict, orig_config_file=config_file)

    @classmethod
    def from_dict(cls, config_dict: Dict[str, Any],
                  orig_config_file: Optional[str] = None) -> "NeatConfig":
        config = deepcopy(config_dict)
        for key in MANDATORY_SECTIONS:
            if key not in config:
                raise ValueError(
                    f"Configuration {orig_config_file or config_dict} is missing '{key}'")
        config.setdefault("misc", {})

        if "output_dir" not in config["device"]:
            raise ValueError("Missing output directory (device.output_dir)")

        # Glob expansion for data files (reference: utils/neat_config.py:72-97)
        for x in ("train_file", "val_file", "test_file"):
            if x in config["data"] and isinstance(config["data"][x], str):
                config["data"][f"{x}_expanded"] = _expand_glob(config["data"][x])

        out = cls()
        for k, v in config.items():
            setattr(out, k, v)
        return out

    @classmethod
    def from_args(cls, help_message: str = "NeatConfig",
                  default_config_file: Optional[str] = None) -> "NeatConfig":
        parser = argparse.ArgumentParser(description=help_message)
        parser.add_argument("config_file", nargs="?", default=default_config_file,
                            help="Path to the config.yaml")
        args, _ = parser.parse_known_args()
        if not args.config_file:
            raise ValueError("No config file provided!")
        return cls.from_yaml(args.config_file)

    # ------------------------------------------------------------------
    def merged_data_model(self) -> Dict[str, Any]:
        """data-section dict updated with model keys (dataloaders read both;
        reference: model/dataloader.py:136-138)."""
        merged = deepcopy(self.data)
        merged.update(deepcopy(self.model))
        return merged

    def to_dict(self) -> Dict[str, Any]:
        return {k: deepcopy(getattr(self, k))
                for k in MANDATORY_SECTIONS + OPTIONAL_SECTIONS}

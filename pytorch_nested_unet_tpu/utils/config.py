"""Config helpers: str2bool (reference utils.py:4-10) and the YAML config capsule
(written at reference trains.py:206-207, reloaded by val.py:34-35 — the de-facto
checkpoint format that lets `val.py` reconstruct the exact model)."""

import argparse
import os

import yaml


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def save_config(config: dict, model_dir: str):
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.yml"), "w") as f:
        yaml.dump(config, f)


def load_config(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "config.yml")) as f:
        return yaml.safe_load(f)

"""Pickle-free checkpointing.

The reference pickles whole ``nn.Module`` objects plus the argparse
Namespace to ``model.pkl`` (``src/train.py:86-89,583-585``). Here the
checkpoint is (a) a msgpack blob of the train-state pytree (params, opt
state, batch stats, step, best metrics) via ``flax.serialization`` and
(b) a human-readable ``config.json`` of the hyperparameters — replacing
the pickled Namespace as the saved hyperparameter record.

Resume-with-overrides (``--change_lr`` / ``--change_alpha``,
``src/train.py:123-126``) is honored by the train driver: it loads the
saved config, then selectively overrides learning_rate / alpha.
"""

from __future__ import annotations

import json
import os

from flax import serialization

CKPT_NAME = "model.msgpack"
CONFIG_NAME = "config.json"


def save_checkpoint(save_dir: str, state, config: dict) -> str:
    os.makedirs(save_dir, exist_ok=True)
    blob = serialization.to_bytes(state)
    path = os.path.join(save_dir, CKPT_NAME)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    with open(os.path.join(save_dir, CONFIG_NAME), "w") as f:
        json.dump(config, f, indent=2, sort_keys=True, default=str)
    return path


def checkpoint_exists(save_dir: str) -> bool:
    return os.path.exists(os.path.join(save_dir, CKPT_NAME))


def load_config(save_dir: str) -> dict:
    """The saved hyperparameter record alone (no state template needed).

    Callers that must rebuild a STRUCTURE-matching state template before
    ``load_checkpoint`` (e.g. the optimizer layout under ``--flat_adam``)
    read this first. Empty dict when absent.
    """
    cfg_path = os.path.join(save_dir, CONFIG_NAME)
    if not os.path.exists(cfg_path):
        return {}
    with open(cfg_path) as f:
        return json.load(f)


def load_checkpoint(save_dir: str, state_template):
    """Restore a train state into ``state_template`` (same treedef).

    Returns (state, config). Raises FileNotFoundError when absent.
    """
    path = os.path.join(save_dir, CKPT_NAME)
    with open(path, "rb") as f:
        blob = f.read()
    state = serialization.from_bytes(state_template, blob)
    cfg_path = os.path.join(save_dir, CONFIG_NAME)
    config = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return state, config

"""YAML config system.

Preserves the reference's config contract (SURVEY.md §5.6):
  * task YAML (train/predict/benchmark/export) with ``dataset``/``model``/
    ``loss``/``training`` and optional ``prediction`` sections,
  * training dumps the fully-merged config to ``<output_dir>/params.yaml``
    (reference train.py:40-42),
  * every eval CLI re-reads ``params.yaml`` and overrides ``config['model']``
    so the exact model is rebuilt (reference benchmark.py:53-55).
"""
import copy
import os

import yaml

from .utils import dict_update


def load_yaml(path):
    with open(path, "r") as f:
        return yaml.safe_load(f)


def save_yaml(config, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.dump(config, f, default_flow_style=False)


def merge_model_params(config, model_dir, version=None):
    """Override config['model'] (and remember weight file) from a trained
    model directory containing ``params.yaml`` — reference benchmark.py:53-55.
    """
    params = load_yaml(os.path.join(model_dir, "params.yaml"))
    config = copy.deepcopy(config)
    config["model"] = params["model"]
    if version is not None:
        config.setdefault("prediction", {})["version"] = version
    return config


def with_defaults(default_config, config):
    """Deep-merge user config over a class default config (reference pattern
    used by every module: XPoint.py:65-71, ImagePairDataset.py:75-81, ...)."""
    merged = copy.deepcopy(default_config)
    if config:
        dict_update(merged, config)
    return merged

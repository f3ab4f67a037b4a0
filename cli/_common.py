"""Shared CLI plumbing: config merging, model+dataset construction, seeds."""
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def set_seeds(seed):
    random.seed(seed)
    np.random.seed(seed)


def load_eval_setup(args, single_image_override=None):
    """Config + params.yaml merge + model + dataset (reference
    benchmark.py:50-130 flow). Returns (config, module, variables, infer,
    dataset)."""
    from xpoint_tpu.config import load_yaml
    from xpoint_tpu.model_io import load_model
    from xpoint_tpu.data import get_dataset
    from xpoint_tpu.eval.infer import XPointInference
    from xpoint_tpu.utils import dict_update

    config = load_yaml(args.yaml_config)
    if getattr(args, "yaml_variable", None):
        dict_update(config, load_yaml(args.yaml_variable))

    # `-v none` + a host-side baseline model type: build the model straight
    # from the yaml and skip weight loading, like the reference
    # (benchmark.py:93 `getattr(models, type)(config)`; :94-96 loads weights
    # only when version != 'none')
    if (getattr(args, "version", None) == "none"
            and (config.get("model") or {}).get("type") == "ClassicDetectors"):
        from xpoint_tpu.models import get_model
        from xpoint_tpu.eval.infer import ClassicInference

        model, model_cfg = get_model(config["model"])
        config["model"] = model_cfg
        if single_image_override is not None:
            config.setdefault("dataset", {})["single_image"] = \
                single_image_override
        dataset = get_dataset(config["dataset"]) if config.get(
            "dataset", {}).get("filename") or config.get(
            "dataset", {}).get("foldername") else None
        infer = ClassicInference(model, config.get("prediction", {}))
        return config, model, None, infer, dataset

    # reference disables the homography head at eval time when the config
    # asks for it (benchmark.py:50-76, cipdp.yaml 'disable_hmhead')
    override = None
    if (config.get("prediction", {}) or {}).get("disable_hmhead"):
        override = {"homography_regression_head": {"check": False}}

    if (getattr(args, "version", None) == "none"
            and getattr(args, "model_dir", None) in (None, "none")
            and config.get("model")):
        # `-m none -v none` + a model section in the yaml: build the model
        # from the config with fresh random weights — the reference skips
        # weight loading for ANY model type when version == 'none'
        # (benchmark.py:93-96), not just the classical baselines
        import copy as _copy
        import jax
        import jax.numpy as jnp
        from xpoint_tpu.models import build_xpoint
        model_cfg = _copy.deepcopy(config["model"])
        if override:
            dict_update(model_cfg, override)
        module, model_cfg = build_xpoint(model_cfg)
        variables = jax.jit(lambda r: module.init(
            r, jnp.zeros((1, 64, 64, 1), jnp.float32),
            method=module.init_all))(jax.random.PRNGKey(0))
    else:
        module, variables, model_cfg = load_model(args.model_dir,
                                                  args.version,
                                                  model_override=override)
    config["model"] = model_cfg

    if single_image_override is not None:
        config.setdefault("dataset", {})["single_image"] = single_image_override
    dataset = get_dataset(config["dataset"]) if config.get("dataset", {}).get(
        "filename") or config.get("dataset", {}).get("foldername") else None

    infer = XPointInference(module, variables, config.get("prediction", {}))
    return config, module, variables, infer, dataset

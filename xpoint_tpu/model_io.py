"""Model loading for eval CLIs: rebuild the exact model from a trained
model dir (params.yaml + checkpoint), the reference contract
(benchmark.py:53-55,93-124).

Checkpoint resolution order for <model_dir>/<version>:
  1. <version>.ckpt       — orbax checkpoint written by this framework,
  2. <version>.model      — reference torch checkpoint, converted on load,
  3. version == 'none'    — fresh random init (parity with reference
                            'none for no weights').
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from .config import load_yaml
from .models import build_xpoint


def load_model(model_dir, version="latest", config=None, scan_backend=None,
               model_override=None):
    """Returns (module, variables, merged_config). model_override deep-merges
    over the stored model config (e.g. disabling the hm head at eval)."""
    params = load_yaml(os.path.join(model_dir, "params.yaml"))
    model_cfg = params["model"]
    if model_override:
        from .utils import dict_update
        import copy as _copy
        model_cfg = dict_update(_copy.deepcopy(model_cfg), model_override)
    if config is not None:
        config = dict(config)
        config["model"] = model_cfg

    mtype = model_cfg.get("type", "XPoint")
    if mtype != "XPoint":
        raise ValueError(
            f"load_model handles XPoint; use models.get_model for {mtype}")

    module, merged_cfg = build_xpoint(model_cfg, scan_backend=scan_backend)

    variables = jax.jit(lambda r: module.init(
        r, jnp.zeros((1, 64, 64, 1), jnp.float32),
        method=module.init_all))(jax.random.PRNGKey(0))

    if version and version != "none":
        ckpt_path = os.path.join(model_dir, f"{version}.ckpt")
        torch_path = os.path.join(model_dir, f"{version}.model")
        if os.path.exists(ckpt_path):
            import orbax.checkpoint as ocp
            with ocp.PyTreeCheckpointer() as cp:
                restored = cp.restore(os.path.abspath(ckpt_path))
            variables = {"params": restored["params"]}
            if restored.get("batch_stats"):
                variables["batch_stats"] = restored["batch_stats"]
        elif os.path.exists(torch_path):
            from .compat import load_torch_checkpoint
            variables = load_torch_checkpoint(torch_path, module, merged_cfg)
        else:
            raise FileNotFoundError(
                f"no checkpoint {version}(.ckpt|.model) in {model_dir}")

    variables = jax.tree.map(jnp.asarray, dict(variables))
    return module, variables, merged_cfg

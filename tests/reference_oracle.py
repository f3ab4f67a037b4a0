"""Import the PUBLIC reference implementation (read-only, /root/reference)
as a numerical test oracle, stubbing its unavailable GPU-era deps
(torchvision, timm). Used ONLY by tests — the framework itself never
touches torch."""
import sys
import types

import torch
import torch.nn as nn


def _install_stubs():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes = types.ModuleType("torchvision.ops.boxes")
    tvm = types.ModuleType("torchvision.models")
    ops.nms = lambda *a, **k: None
    boxes.batched_nms = lambda *a, **k: None
    tv.ops = ops
    ops.boxes = boxes
    tv.models = tvm
    sys.modules.update({"torchvision": tv, "torchvision.ops": ops,
                        "torchvision.ops.boxes": boxes,
                        "torchvision.models": tvm})

    timm = types.ModuleType("timm")
    tmm = types.ModuleType("timm.models")
    tml = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()
            self.p = p

        def forward(self, x):
            return x

    def to_2tuple(x):
        import collections.abc
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(int(v) for v in x)
        return (x, x)

    def trunc_normal_(t, std=1.0, **k):
        with torch.no_grad():
            t.normal_(0, std).clamp_(-2 * std, 2 * std)
        return t

    tml.DropPath = DropPath
    tml.to_2tuple = to_2tuple
    tml.trunc_normal_ = trunc_normal_
    tmm.layers = tml
    timm.models = tmm
    sys.modules.update({"timm": timm, "timm.models": tmm,
                        "timm.models.layers": tml})

    # fvcore: only FLOP counting, never on the forward path
    fv = types.ModuleType("fvcore")
    fvn = types.ModuleType("fvcore.nn")
    fvn.FlopCountAnalysis = object
    fvn.flop_count_str = lambda *a, **k: ""
    fvn.flop_count = lambda *a, **k: ({}, {})
    fvn.parameter_count = lambda *a, **k: {"": 0}
    fv.nn = fvn
    sys.modules.update({"fvcore": fv, "fvcore.nn": fvn})

    # yacs: minimal CfgNode good enough for MYCONFIG.get_config
    yacs = types.ModuleType("yacs")
    yconfig = types.ModuleType("yacs.config")

    class CfgNode(dict):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.__dict__["_frozen"] = False

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

        def __setattr__(self, name, value):
            self[name] = value

        def clone(self):
            import copy
            return copy.deepcopy(self)

        def defrost(self):
            pass

        def freeze(self):
            pass

        def merge_from_file(self, path):
            import yaml
            with open(path) as f:
                data = yaml.safe_load(f) or {}
            self._merge(self, data)

        def merge_from_list(self, lst):
            for k, v in zip(lst[0::2], lst[1::2]):
                node = self
                parts = k.split(".")
                for p in parts[:-1]:
                    node = node[p]
                node[parts[-1]] = v

        @staticmethod
        def _merge(node, data):
            for k, v in (data or {}).items():
                if isinstance(v, dict):
                    if k not in node or not isinstance(node[k], CfgNode):
                        node[k] = CfgNode()
                    CfgNode._merge(node[k], v)
                else:
                    node[k] = v

        def setdefault_nested(self, *a):
            pass

    yconfig.CfgNode = CfgNode
    yacs.config = yconfig
    sys.modules.update({"yacs": yacs, "yacs.config": yconfig})

    # triton: the reference's csm_triton.py applies @triton.jit at module
    # level unguarded, so it cannot even import without triton. Provide a
    # no-op stub; the torch fallback is forced post-import in get_reference.
    # Pre-import torch._dynamo FIRST: its lazy import (triggered e.g. by
    # torch.optim.Adam.__init__) does `import triton.backends.compiler`,
    # which explodes on a non-package stub. Importing it now lets torch's
    # triton detection observe the real (triton-less) environment once.
    try:
        import torch._dynamo  # noqa: F401
    except Exception:
        pass
    triton = types.ModuleType("triton")
    tl = types.ModuleType("triton.language")
    triton.jit = lambda fn=None, **k: (fn if fn is not None else (lambda f: f))

    def _decorator_factory(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f

    triton.__version__ = "2.2.0"
    triton.__getattr__ = lambda name: _decorator_factory  # autotune/heuristics/Config/...
    tl.__getattr__ = lambda name: object   # any tl.<attr> annotation resolves
    triton.language = tl
    sys.modules.update({"triton": triton, "triton.language": tl})


def get_reference():
    """Returns the reference `xpoint` package (imported once)."""
    _install_stubs()

    # the reference wraps device kernels in `with torch.cuda.device(...)`,
    # which rejects cpu devices — neutralize for CPU-only test runs
    class _AnyDevice:
        def __init__(self, device=None):
            pass

        def __enter__(self):
            return None

        def __exit__(self, *a):
            return False

    torch.cuda.device = _AnyDevice

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import xpoint  # noqa: F401
    try:
        # force the pure-torch fallbacks (stubbed triton can't execute)
        from xpoint.models.vmamba_src import csm_triton
        csm_triton.WITH_TRITON = False
    except Exception:
        pass
    from xpoint.models.XPoint import XPoint
    return XPoint

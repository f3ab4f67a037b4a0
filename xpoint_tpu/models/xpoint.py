"""XPoint model: encoder(s) + detector head + descriptor head
(+ optional homography-regression head), flax.linen / NHWC.

Parity target: /root/reference/xpoint/models/XPoint.py. Key behaviors kept:
  * multispectral mode holds two encoders routed by spectrum
    (XPoint.py:98-102, 283-305). TPU twist: routing is STATIC per call
    (spectrum='optical'|'thermal') when the batch is uniform — which is
    every takes_pair / eval call — and mask-select ('mixed') otherwise,
    so jit never sees data-dependent shapes.
  * encoder output fed to the HM head is gradient-stopped, matching the
    reference's .clone().detach() (XPoint.py:305,309).
  * detector head emits r^2+1 cell classes where r is the encoder
    downsample ratio (XPoint.py:109); heads output float32.
  * takes_pair forward returns (pred_optical, pred_thermal, pred_hm)
    (XPoint.py:186-214).

Config schema identical to the reference YAML `model:` section.
"""
import copy
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils import dict_update
from .heads import CNNEncoder, Head
from .regnet import RegNet
from .vssm import build_vssm_from_config


DEFAULT_CONFIG = {
    'multispectral': True,
    'descriptor_head': True,
    'intepolation_mode': 'bilinear',
    'descriptor_size': 256,
    'normalize_descriptors': True,
    'final_batchnorm': True,
    'reflection_pad': True,
    'bn_first': False,
    'double_convolution': True,
    'channel_version': 0,
    'mixed_precision': False,
    'takes_pair': False,
    # XPoint-TPU extension (default off = reference BN semantics): keep one
    # BN running-statistics set PER SPECTRUM so eval normalizes each
    # modality the way the separate-forward train step did — see
    # heads.SpectralBatchNorm for the measured train/eval collapse.
    'spectral_norm_stats': False,
    'homography_regression_head': {'check': False, 'type': 'HomographyNet'},
    'use_attention': {'check': False, 'type': 'SimpleViT',
                      'height': 256, 'width': 256,
                      'pretrained': {'check': True, 'type_dir': ''}},
}

_CHANNEL_VERSIONS = {
    0: ([1, 64, 64, 128, 128], 256),
    1: ([1, 32, 64, 96, 128], None),     # head = descriptor_size
    2: ([1, 8, 16, 32, 64], None),
}


class XPointNet(nn.Module):
    """The flax module. Construct via :func:`build_xpoint`."""
    encoder_type: str = "cnn"               # 'cnn' | 'vmamba' | 'swin'
    encoder_cfg: Any = None                 # hashable tuple of cfg items
    multispectral: bool = True
    descriptor_head: bool = True
    descriptor_size: int = 256
    normalize_descriptors: bool = True
    final_batchnorm: bool = True
    reflection_pad: bool = True
    bn_first: bool = False
    double_convolution: bool = True
    n_channels: Any = (1, 64, 64, 128, 128)
    head_channels: int = 256
    encoder_downsample_ratio: int = 8
    hm_head: str = ""                       # '' | 'RegNet' | 'HomographyNet'
    dtype: Any = jnp.float32
    scan_backend: str = "assoc"
    spectral_norm_stats: bool = False

    def _make_encoder(self, name):
        if self.encoder_type == "cnn":
            return CNNEncoder(tuple(self.n_channels), self.reflection_pad,
                              self.bn_first, self.double_convolution,
                              self.dtype, self.spectral_norm_stats,
                              name=name)
        if self.encoder_type == "vmamba":
            return build_vssm_from_config(dict(self.encoder_cfg),
                                          dtype=self.dtype,
                                          scan_backend=self.scan_backend).clone(name=name)
        if self.encoder_type == "swin":
            from .swinv2 import build_swin_from_config
            return build_swin_from_config(dict(self.encoder_cfg),
                                          dtype=self.dtype).clone(name=name)
        raise ValueError(f"unknown encoder type {self.encoder_type}")

    def setup(self):
        if self.multispectral:
            self.encoder_optical = self._make_encoder("encoder_optical")
            self.encoder_thermal = self._make_encoder("encoder_thermal")
        else:
            self.encoder = self._make_encoder("encoder")

        last_dim = self.encoder_downsample_ratio ** 2 + 1
        self.detector = Head(self.head_channels, last_dim,
                             self.final_batchnorm, self.reflection_pad,
                             self.bn_first, self.dtype,
                             self.spectral_norm_stats, name="detector_head")
        if self.descriptor_head:
            self.descriptor = Head(self.head_channels, self.descriptor_size,
                                   self.final_batchnorm, self.reflection_pad,
                                   self.bn_first, self.dtype,
                                   self.spectral_norm_stats,
                                   name="descriptor_head")
        if self.hm_head == "RegNet":
            self.hm_regressor = RegNet(dtype=self.dtype, name="hm_regressor")
        elif self.hm_head == "HomographyNet":
            from .homographynet import HomographyNet
            self.hm_regressor = HomographyNet(dtype=self.dtype, name="hm_regressor")

    def encode(self, image, spectrum, is_optical=None, train=False):
        """Run the right encoder. spectrum is STATIC: 'optical', 'thermal'
        or 'mixed' (per-sample mask select, needs is_optical)."""
        def run(enc):
            if self.encoder_type == "cnn":
                return enc(image, train=train, spectrum=spectrum)
            return enc(image, deterministic=not train)

        if not self.multispectral:
            return run(self.encoder)
        if spectrum == "optical":
            return run(self.encoder_optical)
        if spectrum == "thermal":
            return run(self.encoder_thermal)
        # mixed batch: evaluate both, select per sample (static shapes)
        xo = run(self.encoder_optical)
        xt = run(self.encoder_thermal)
        sel = is_optical.reshape(-1, 1, 1, 1)
        return jnp.where(sel, xo, xt)

    def forward_impl(self, image, spectrum="optical", is_optical=None,
                     train=False):
        """Single-spectrum forward: image (B, H, W, 1) -> dict of
        logits (B, Hc, Wc, r^2+1), desc (B, Hc, Wc, D), encoder_output."""
        x = self.encode(image, spectrum, is_optical, train)
        out = {"logits": self.detector(x, train=train, spectrum=spectrum)}
        if self.descriptor_head:
            desc = self.descriptor(x, train=train, spectrum=spectrum)
            if self.normalize_descriptors:
                desc = desc / jnp.maximum(
                    jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
            out["desc"] = desc
        # HM head consumes detached encoder features (XPoint.py:305,309)
        out["encoder_output"] = jax.lax.stop_gradient(x).astype(jnp.float32)
        return out

    def __call__(self, image, spectrum="optical", is_optical=None, train=False):
        return self.forward_impl(image, spectrum, is_optical, train)

    def init_all(self, image, train=False):
        """Forward that touches every submodule — use as the init method so
        all parameters materialize regardless of later routing."""
        pred_o = self.forward_impl(image, "optical", train=train)
        if self.multispectral:
            pred_t = self.forward_impl(image, "thermal", train=train)
        else:
            pred_t = pred_o
        if self.hm_head == "RegNet":
            self.hm_regressor(pred_o["encoder_output"],
                              pred_t["encoder_output"], train=train)
        elif self.hm_head == "HomographyNet":
            mo = pred_o["encoder_output"].mean(axis=-1, keepdims=True)
            self.hm_regressor(jnp.concatenate([mo, mo], axis=-1), train=train)
        return pred_o

    def forward_pair(self, optical_image, thermal_image, train=False,
                     optical_not_warped=None, is_optical_o=None,
                     is_optical_t=None):
        """takes_pair forward (XPoint.py:186-214). With multispectral
        encoders and random_pairs spectrum shuffling, per-sample
        is_optical_o/is_optical_t masks route each sample through the right
        encoder (reference XPoint.py:283-305)."""
        # Always two passes, even for a shared encoder in eval: stacking
        # optical+thermal into one 2B forward measured SLOWER on device
        # (38.0 vs 36.6 ms/batch @512^2 B=8, flagship VMamba — the larger
        # program schedules worse than two overlapped half-size programs;
        # docs/TPU_NOTES.md "Stacking independent half-batches").
        if self.multispectral and is_optical_o is not None:
            pred_o = self.forward_impl(optical_image, "mixed",
                                       is_optical_o, train=train)
        else:
            pred_o = self.forward_impl(optical_image, "optical",
                                       train=train)
        if self.multispectral and is_optical_t is not None:
            pred_t = self.forward_impl(thermal_image, "mixed",
                                       is_optical_t, train=train)
        else:
            pred_t = self.forward_impl(thermal_image, "thermal",
                                       train=train)
        pred_hm = None
        if self.hm_head == "RegNet":
            pred_hm = self.hm_regressor(pred_o["encoder_output"],
                                        pred_t["encoder_output"], train=train)
        elif self.hm_head == "HomographyNet":
            # channel-mean maps, order-swapped when the optical image was
            # the warped one (XPoint.py:194-208)
            mo = pred_o["encoder_output"].mean(axis=-1, keepdims=True)
            mt = pred_t["encoder_output"].mean(axis=-1, keepdims=True)
            if optical_not_warped is None:
                # default: the optical image is the unwarped one (reference
                # ordering when data['optical']['homography'] == I)
                sel = jnp.ones((mo.shape[0], 1, 1, 1), bool)
            else:
                sel = optical_not_warped.reshape(-1, 1, 1, 1)
            first = jnp.where(sel, mo, mt)
            second = jnp.where(sel, mt, mo)
            pred_hm = self.hm_regressor(
                jnp.concatenate([first, second], axis=-1), train=train)
        return pred_o, pred_t, pred_hm


def build_xpoint(config=None, dtype=None, scan_backend=None):
    """Build an XPointNet from the reference YAML `model:` config dict.

    Returns (module, merged_config). scan_backend defaults to the Pallas
    kernel on TPU and the associative scan elsewhere (the Pallas kernel
    still runs on CPU via interpret mode, just slower).
    """
    if scan_backend is None:
        import jax
        scan_backend = "pallas" if jax.default_backend() == "tpu" else "assoc"
    cfg = dict_update(copy.deepcopy(DEFAULT_CONFIG), config or {})
    n_channels, head_channels = _CHANNEL_VERSIONS.get(
        cfg['channel_version'], _CHANNEL_VERSIONS[0])
    if head_channels is None:
        head_channels = cfg['descriptor_size']

    encoder_type = "cnn"
    encoder_cfg = ()
    ratio = 8
    ua = cfg.get('use_attention', {})
    if ua.get('check'):
        if ua.get('type') == 'VMamba':
            encoder_type = "vmamba"
            # reference get_config (MYCONFIG.py:307-314): the pretrained
            # encoder's YAML is the base, inline model_parameters override
            base_model = {}
            pre = ua.get('pretrained', {}) or {}
            yaml_file = pre.get('yaml_file')
            import os as _os
            if pre.get('check') and not yaml_file:
                # reference falls back to the first .yaml in type_dir
                # (train.py:33-36, XPoint.py:443-445)
                tdir = pre.get('type_dir')
                if tdir and _os.path.isdir(tdir):
                    yamls = sorted(f for f in _os.listdir(tdir)
                                   if f.endswith('.yaml'))
                    if yamls:
                        yaml_file = _os.path.join(tdir, yamls[0])
            if pre.get('check') and yaml_file:
                if _os.path.exists(yaml_file):
                    from ..config import load_yaml as _load_yaml
                    base_model = (_load_yaml(yaml_file) or {}).get('MODEL', {})
            vssm = dict_update(copy.deepcopy(base_model),
                               (ua.get('model_parameters', {}) or {})
                               .get('MODEL', {}))
            merged = dict(vssm.get('VSSM', {}))
            merged['DROP_PATH_RATE'] = vssm.get('DROP_PATH_RATE', 0.2)
            encoder_cfg = tuple(sorted(
                (k, tuple(v) if isinstance(v, list) else v)
                for k, v in merged.items()))
            n_channels = list(n_channels)
            n_channels[4] = int(merged.get('EMBED_DIM', 96)) // 2
        elif ua.get('type') in ('Swinv2', 'SwinV2'):
            encoder_type = "swin"
            sw = (ua.get('model_parameters', {}) or {}).get('MODEL', {}).get('SWINV2', {})
            merged = dict(sw)
            merged['DROP_PATH_RATE'] = (ua.get('model_parameters', {}) or {}) \
                .get('MODEL', {}).get('DROP_PATH_RATE', 0.2)
            encoder_cfg = tuple(sorted(
                (k, tuple(v) if isinstance(v, list) else v)
                for k, v in merged.items()))
            embed = int(merged.get('EMBED_DIM', 96))
            depths = merged.get('DEPTHS', (2, 2, 6, 2))
            n_channels = list(n_channels)
            # Swin output dim: embed * 2^(n_stages-1) / 16 after depth_to_space(4)
            n_channels[4] = int(embed * 2 ** (len(depths) - 1) / 16)
            # overall ratio 2^(n-1)*4, /4 from depth_to_space (XPoint.py:408)
            ratio = 2 ** (len(depths) - 1)
        else:
            raise ValueError(f"unsupported attention encoder: {ua.get('type')}")

    hm_head = ""
    hm = cfg.get('homography_regression_head', {})
    if hm.get('check'):
        hm_head = hm.get('type', 'RegNet')

    if dtype is None:
        dtype = jnp.bfloat16 if cfg.get('mixed_precision') else jnp.float32

    module = XPointNet(
        encoder_type=encoder_type,
        encoder_cfg=encoder_cfg,
        multispectral=cfg['multispectral'],
        descriptor_head=cfg['descriptor_head'],
        descriptor_size=cfg['descriptor_size'],
        normalize_descriptors=cfg['normalize_descriptors'],
        final_batchnorm=cfg['final_batchnorm'],
        reflection_pad=cfg['reflection_pad'],
        bn_first=cfg['bn_first'],
        double_convolution=cfg['double_convolution'],
        n_channels=tuple(n_channels),
        head_channels=head_channels,
        encoder_downsample_ratio=ratio,
        hm_head=hm_head,
        dtype=dtype,
        scan_backend=scan_backend,
        spectral_norm_stats=cfg['spectral_norm_stats'],
    )
    return module, cfg

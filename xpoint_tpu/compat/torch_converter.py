"""PyTorch -> JAX checkpoint converter for reference XPoint weights.

Maps reference state_dict keys (torch, NCHW) onto this framework's flax
parameter/batch-stats trees (NHWC), replicating the reference's key surgery:
  * '__'-split renaming (utils.py:240-246),
  * 'backbone.'-prefix strip for pretrained VMamba encoders (train.py:108-129),
  * VSSM legacy renames patch_embed.proj->0 / ln_1->norm / self_attention->op
    (VMamba.py:1577-1586),
  * Linear2d weights stored as conv (VMamba.py:42-49) squeezed back to 2D.

Layout conversions: conv (O,I,kh,kw)->(kh,kw,I,O); linear (O,I)->(I,O);
BatchNorm weight/bias->scale/bias + running stats; LayerNorm weight->scale.

Reference CNN-encoder/head Sequential indices (XPoint.py:112-138, 452-466):
  encoder block b: convs at seq 9b+1, 9b+5; BNs at 9b+3, 9b+7 (maxpool 9b+8)
  heads: conv3 at 1, BN at 3, conv1 at 4, final BN at 5.
"""
import collections

import numpy as np


def _conv_w(w):
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _lin_w(w):
    w = np.asarray(w, np.float32)
    if w.ndim == 4:            # Linear2d stored as (O, I, 1, 1)
        w = w[:, :, 0, 0]
    return w.T


def _f32(w):
    return np.asarray(w, np.float32)


def normalize_torch_keys(state_dict, vssm_legacy=False):
    """Reference key surgery applied up front. The patch_embed/ln_1 legacy
    renames are VSSM-scoped (VMamba.py:1577-1586) — they must not touch
    SwinV2's native patch_embed.proj keys."""
    out = collections.OrderedDict()
    for key, value in state_dict.items():
        k = key.split('__')[-1]               # fix_model_weigth_keys
        if k.startswith('module.'):           # DataParallel unwrap
            k = k[len('module.'):]
        if k.startswith('backbone.'):         # pretrained VSSM prefix
            k = k[len('backbone.'):]
        if vssm_legacy:
            k = k.replace('patch_embed.proj.', 'patch_embed.0.')
            k = k.replace('patch_embed.norm.', 'patch_embed.2.')
            k = k.replace('.ln_1.', '.norm.')
            k = k.replace('.self_attention.', '.op.')
        out[k] = value
    return out


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_bn(params, stats, prefix_t, path, sd):
    _set(params, path + ('scale',), _f32(sd[prefix_t + '.weight']))
    _set(params, path + ('bias',), _f32(sd[prefix_t + '.bias']))
    _set(stats, path + ('mean',), _f32(sd[prefix_t + '.running_mean']))
    _set(stats, path + ('var',), _f32(sd[prefix_t + '.running_var']))


def _convert_ln(params, prefix_t, path, sd):
    _set(params, path + ('scale',), _f32(sd[prefix_t + '.weight']))
    _set(params, path + ('bias',), _f32(sd[prefix_t + '.bias']))


def _convert_conv(params, prefix_t, path, sd, bias=True):
    _set(params, path + ('kernel',), _conv_w(sd[prefix_t + '.weight']))
    if bias and prefix_t + '.bias' in sd:
        _set(params, path + ('bias',), _f32(sd[prefix_t + '.bias']))


def _convert_dense(params, prefix_t, path, sd, bias=True):
    _set(params, path + ('kernel',), _lin_w(sd[prefix_t + '.weight']))
    if bias and prefix_t + '.bias' in sd:
        _set(params, path + ('bias',), _f32(sd[prefix_t + '.bias']))


def _convert_cnn_encoder(params, stats, enc_t, enc_path, sd,
                         double_convolution=True):
    """Reference Sequential CNN encoder -> CNNEncoder submodule tree."""
    n_per_block = 2 if double_convolution else 1
    seq = 0
    cbr = 0
    for block in range(4):
        for _ in range(n_per_block):
            _convert_conv(params, f'{enc_t}.{seq + 1}',
                          enc_path + (f'ConvBNRelu_{cbr}', 'Conv_0'), sd)
            _convert_bn(params, stats, f'{enc_t}.{seq + 3}',
                        enc_path + (f'ConvBNRelu_{cbr}', 'BatchNorm_0'), sd)
            seq += 4
            cbr += 1
        if block < 3:
            seq += 1        # maxpool


def _convert_head(params, stats, head_t, head_path, sd, final_batchnorm=True):
    _convert_conv(params, f'{head_t}.1',
                  head_path + ('ConvBNRelu_0', 'Conv_0'), sd)
    _convert_bn(params, stats, f'{head_t}.3',
                head_path + ('ConvBNRelu_0', 'BatchNorm_0'), sd)
    _convert_conv(params, f'{head_t}.4', head_path + ('Conv_0',), sd)
    if final_batchnorm:
        _convert_bn(params, stats, f'{head_t}.5',
                    head_path + ('BatchNorm_0',), sd)


def _convert_vssm(params, stats, enc_t, enc_path, sd, depths):
    """Reference VSSM (patchembed v2 / downsample v3 / v05_noz) -> VSSM."""
    p = lambda *rest: enc_path + tuple(rest)
    # patch embed v2: convs at .0/.5, norms at .2/.7 (channel-last Sequential)
    _convert_conv(params, f'{enc_t}.patch_embed.0', p('patch_embed_conv1'), sd)
    _convert_ln(params, f'{enc_t}.patch_embed.2', p('patch_embed_norm1'), sd)
    _convert_conv(params, f'{enc_t}.patch_embed.5', p('patch_embed_conv2'), sd)
    _convert_ln(params, f'{enc_t}.patch_embed.7', p('patch_embed_norm2'), sd)

    for i, depth in enumerate(depths):
        for j in range(depth):
            bt = f'{enc_t}.layers.{i}.blocks.{j}'
            bp = f'layers_{i}_blocks_{j}'
            _convert_ln(params, f'{bt}.norm', p(bp, 'norm'), sd)
            op = f'{bt}.op'
            _convert_dense(params, f'{op}.in_proj', p(bp, 'op', 'in_proj'), sd)
            if f'{op}.conv2d.weight' in sd:
                # torch depthwise (D,1,k,k) -> flax (k,k,1,D)
                w = np.asarray(sd[f'{op}.conv2d.weight'], np.float32)
                _set(params, p(bp, 'op', 'conv2d', 'kernel'),
                     np.transpose(w, (2, 3, 1, 0)))
                if f'{op}.conv2d.bias' in sd:
                    _set(params, p(bp, 'op', 'conv2d', 'bias'),
                         _f32(sd[f'{op}.conv2d.bias']))
            is_xv = f'{op}.x_proj_weight' not in sd
            if not is_xv:
                _set(params, p(bp, 'op', 'x_proj_weight'),
                     _f32(sd[f'{op}.x_proj_weight']))
            if f'{op}.dt_projs_weight' in sd:
                dtw = _f32(sd[f'{op}.dt_projs_weight'])
                if is_xv:
                    # SS2Dv3 stores the weight plain
                    _set(params, p(bp, 'op', 'dt_projs_weight'), dtw)
                else:
                    # SS2D stores pre-shift: dt_w_c = dt_w - R^-0.5
                    R = dtw.shape[-1]
                    _set(params, p(bp, 'op', 'dt_projs_weight'),
                         dtw + R ** -0.5)
            _set(params, p(bp, 'op', 'dt_projs_bias'),
                 _f32(sd[f'{op}.dt_projs_bias']))
            _set(params, p(bp, 'op', 'A_logs'), _f32(sd[f'{op}.A_logs']))
            _set(params, p(bp, 'op', 'Ds'), _f32(sd[f'{op}.Ds']))
            if f'{op}.oconv2d.weight' in sd:
                w = np.asarray(sd[f'{op}.oconv2d.weight'], np.float32)
                _set(params, p(bp, 'op', 'oconv2d', 'kernel'),
                     np.transpose(w, (2, 3, 1, 0)))
                if f'{op}.oconv2d.bias' in sd:
                    _set(params, p(bp, 'op', 'oconv2d', 'bias'),
                         _f32(sd[f'{op}.oconv2d.bias']))
            if f'{op}.out_norm.weight' in sd:
                _convert_ln(params, f'{op}.out_norm',
                            p(bp, 'op', 'out_norm'), sd)
            elif f'{op}.out_norm.0.weight' in sd:
                # _oncnorm Sequential: LN at 0, dwconv at 2 (VMamba.py:686)
                _convert_ln(params, f'{op}.out_norm.0',
                            p(bp, 'op', 'out_norm'), sd)
                w = np.asarray(sd[f'{op}.out_norm.2.weight'], np.float32)
                _set(params, p(bp, 'op', 'out_norm_conv', 'kernel'),
                     np.transpose(w, (2, 3, 1, 0)))
            elif f'{op}.out_norm.1.weight' in sd:
                # _ondwconv3 Sequential: dwconv at 1 (VMamba.py:693)
                w = np.asarray(sd[f'{op}.out_norm.1.weight'], np.float32)
                _set(params, p(bp, 'op', 'out_norm_conv', 'kernel'),
                     np.transpose(w, (2, 3, 1, 0)))
            _convert_dense(params, f'{op}.out_proj', p(bp, 'op', 'out_proj'), sd)
            _convert_ln(params, f'{bt}.norm2', p(bp, 'norm2'), sd)
            _convert_dense(params, f'{bt}.mlp.fc1', p(bp, 'mlp', 'Dense_0'), sd)
            _convert_dense(params, f'{bt}.mlp.fc2', p(bp, 'mlp', 'Dense_1'), sd)
        if i < len(depths) - 1:
            # downsample v3 Sequential: conv at .1, norm at .3
            _convert_conv(params, f'{enc_t}.layers.{i}.downsample.1',
                          p(f'layers_{i}_downsample_conv'), sd)
            _convert_ln(params, f'{enc_t}.layers.{i}.downsample.3',
                        p(f'layers_{i}_downsample_norm'), sd)


def _convert_swin(params, stats, enc_t, enc_path, sd, depths):
    """Reference SwinTransformerV2 -> SwinTransformerV2 (flax)."""
    p = lambda *rest: enc_path + tuple(rest)
    _convert_conv(params, f'{enc_t}.patch_embed.proj', p('patch_embed'), sd)
    _convert_ln(params, f'{enc_t}.patch_embed.norm', p('patch_embed_norm'), sd)
    for i, depth in enumerate(depths):
        for j in range(depth):
            bt = f'{enc_t}.layers.{i}.blocks.{j}'
            bp = f'layers_{i}_blocks_{j}'
            _convert_ln(params, f'{bt}.norm1', p(bp, 'norm1'), sd)
            _convert_ln(params, f'{bt}.norm2', p(bp, 'norm2'), sd)
            at = f'{bt}.attn'
            _set(params, p(bp, 'attn', 'logit_scale'),
                 _f32(sd[f'{at}.logit_scale']))
            _set(params, p(bp, 'attn', 'qkv_kernel'),
                 _lin_w(sd[f'{at}.qkv.weight']))
            if f'{at}.q_bias' in sd:
                _set(params, p(bp, 'attn', 'q_bias'), _f32(sd[f'{at}.q_bias']))
                _set(params, p(bp, 'attn', 'v_bias'), _f32(sd[f'{at}.v_bias']))
            _convert_dense(params, f'{at}.cpb_mlp.0', p(bp, 'attn', 'cpb_fc1'), sd)
            _convert_dense(params, f'{at}.cpb_mlp.2', p(bp, 'attn', 'cpb_fc2'), sd)
            _convert_dense(params, f'{at}.proj', p(bp, 'attn', 'proj'), sd)
            _convert_dense(params, f'{bt}.mlp.fc1', p(bp, 'mlp_fc1'), sd)
            _convert_dense(params, f'{bt}.mlp.fc2', p(bp, 'mlp_fc2'), sd)
        if i < len(depths) - 1:
            dt = f'{enc_t}.layers.{i}.downsample'
            _convert_dense(params, f'{dt}.reduction',
                           p(f'layers_{i}_downsample', 'reduction'), sd)
            _convert_ln(params, f'{dt}.norm',
                        p(f'layers_{i}_downsample', 'norm'), sd)
    _convert_ln(params, f'{enc_t}.norm', p('norm'), sd)


def _convert_regnet(params, stats, sd):
    rp = ('hm_regressor',)
    _convert_conv(params, 'hm_regressor.layer1.0', rp + ('conv1',), sd, bias=False)
    _convert_bn(params, stats, 'hm_regressor.layer1.1', rp + ('bn1',), sd)
    _convert_conv(params, 'hm_regressor.layer1.3', rp + ('conv2',), sd, bias=False)
    _convert_bn(params, stats, 'hm_regressor.layer1.4', rp + ('bn2',), sd)
    _convert_dense(params, 'hm_regressor.fc.1', rp + ('fc1',), sd)
    _convert_dense(params, 'hm_regressor.fc.4', rp + ('fc2',), sd)


def convert_torch_state_dict(state_dict, module, model_cfg):
    """Convert a reference XPoint state_dict to {'params', 'batch_stats'}.

    Args:
        state_dict: torch state dict (tensors or numpy arrays).
        module: the XPointNet built from the same model config.
        model_cfg: merged model config dict.
    """
    sd = normalize_torch_keys({k: (v.numpy() if hasattr(v, 'numpy') else v)
                               for k, v in state_dict.items()},
                              vssm_legacy=(module.encoder_type == 'vmamba'))
    params, stats = {}, {}

    encoders = (['encoder_optical', 'encoder_thermal']
                if module.multispectral else ['encoder'])
    for enc in encoders:
        if module.encoder_type == 'cnn':
            _convert_cnn_encoder(params, stats, enc, (enc,), sd,
                                 module.double_convolution)
        elif module.encoder_type == 'vmamba':
            depths = dict(module.encoder_cfg).get('DEPTHS', (2, 2, 2, 2))
            _convert_vssm(params, stats, enc, (enc,), sd, depths)
        elif module.encoder_type == 'swin':
            depths = dict(module.encoder_cfg).get('DEPTHS', (2, 2, 6, 2))
            _convert_swin(params, stats, enc, (enc,), sd, depths)
        else:
            raise NotImplementedError(
                f"torch conversion for encoder {module.encoder_type}")

    _convert_head(params, stats, 'detector_head_convolutions',
                  ('detector_head',), sd, module.final_batchnorm)
    if module.descriptor_head:
        _convert_head(params, stats, 'descriptor_head_convolutions',
                      ('descriptor_head',), sd, module.final_batchnorm)
    if module.hm_head == 'RegNet' and 'hm_regressor.layer1.0.weight' in sd:
        _convert_regnet(params, stats, sd)

    return {'params': params, 'batch_stats': stats}


def convert_pretrained_encoder(state_dict, module, variables):
    """Bootstrap the encoder(s) from a pretrained backbone checkpoint
    (reference train.py:78-129: Swin rel-pos buffer removal, 'backbone.'
    prefix strip, VSSM legacy renames). Returns updated variables; converts
    whatever keys are present (classification heads etc. are ignored)."""
    sd = normalize_torch_keys({k: (v.numpy() if hasattr(v, 'numpy') else v)
                               for k, v in state_dict.items()},
                              vssm_legacy=(module.encoder_type == 'vmamba'))
    # re-prefix so the shared encoder converters can be reused
    sd = {f'encoder.{k}': v for k, v in sd.items()}
    params, stats = {}, {}
    depths = dict(module.encoder_cfg).get('DEPTHS', (2, 2, 2, 2)) \
        if module.encoder_cfg else None
    try:
        if module.encoder_type == 'vmamba':
            _convert_vssm(params, stats, 'encoder', ('encoder',), sd, depths)
        elif module.encoder_type == 'swin':
            _convert_swin(params, stats, 'encoder', ('encoder',), sd, depths)
        elif module.encoder_type == 'cnn':
            _convert_cnn_encoder(params, stats, 'encoder', ('encoder',), sd,
                                 module.double_convolution)
    except KeyError as e:
        raise KeyError(f"pretrained encoder checkpoint missing key {e}")

    import copy
    new_vars = copy.deepcopy(jax_to_mutable(variables))
    enc_names = (['encoder_optical', 'encoder_thermal']
                 if module.multispectral else ['encoder'])
    for enc in enc_names:
        new_vars['params'][enc] = params['encoder']
        if stats.get('encoder') and 'batch_stats' in new_vars:
            new_vars['batch_stats'][enc] = stats['encoder']
    return new_vars


def jax_to_mutable(tree):
    """Recursively convert Frozen/immutable mappings to plain dicts."""
    if hasattr(tree, 'items'):
        return {k: jax_to_mutable(v) for k, v in tree.items()}
    return tree


def load_torch_checkpoint(path, module, model_cfg):
    """torch.load a reference .model file and convert."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=True)
    if isinstance(sd, dict) and 'state_dict' in sd:
        sd = sd['state_dict']
    elif isinstance(sd, dict) and 'model' in sd and isinstance(sd['model'], dict):
        sd = sd['model']
    return convert_torch_state_dict(sd, module, model_cfg)

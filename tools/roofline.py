"""Per-stage roofline audit of the flagship 512² forward (VERDICT r4 #3).

The bench's fused pipeline spends 36.95 of 40.6 ms/batch in two_forward
(metrics/stage_table.json); round 4 proved only the stage-1 selective scan
is at its (VPU-transcendental) floor. This probe decomposes ONE encoder
pass into its stages — patch-embed, per-stage VSS blocks (and within them
the SS2D op vs the MLP), downsamples, heads — times each at the real
flagship geometry with the fenced never-repeated-input discipline
(.claude/skills/verify/SKILL.md), and states each stage's roofline bound:

  t_mxu  = flops / 197 TFLOP/s          (v5e bf16 MXU peak)
  t_hbm  = bytes accessed / 819 GB/s    (v5e HBM roof)
  t_vpu  = transcendentals / measured exp-rate (calibrated on-device)

bound = argmax(t_*); achieved = t_bound / t_measured. Reference comparator
for the decomposition idea: benchmark_evaluation.py:21-48 stage table.

    python tools/roofline.py [--out docs/roofline.json]

Run ALONE on the chip (no concurrent TPU jobs — bench numbers swing).
"""
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from xpoint_tpu.models.vssm import VSSM, VSSBlock, _StridedConv3x3
from xpoint_tpu.models import build_xpoint

V5E_BF16_PEAK = 197e12
V5E_HBM_BPS = 819e9

# flagship VSSM geometry (VMAMBA_MODEL_CFG): embed 96, depths 2222,
# d_state 1, ratio 1.0, v05_noz (scan_mode 0, no z gate), mlp 4.0
BLOCK_KW = dict(d_state=1, ssm_ratio=1.0, dt_rank="auto", ssm_conv=3,
                ssm_conv_bias=False, mlp_ratio=4.0, disable_z=True,
                disable_z_act=False, out_act=False, scan_mode=0,
                use_m0=False, dtype=jnp.bfloat16, scan_backend="assoc",
                xv_type="")


class _Blocks(nn.Module):
    """depth x VSSBlock at one stage's dim (drop_path off: deterministic)."""
    dim: int
    depth: int = 2
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        kw = dict(BLOCK_KW, mlp_ratio=self.mlp_ratio)
        for d in range(self.depth):
            x = VSSBlock(self.dim, 0.0, **kw, name=f"b{d}")(x, True)
        return x


class _PatchEmbed(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.concatenate([x, x, x], axis=-1).astype(jnp.bfloat16)
        x = _StridedConv3x3(48, dtype=jnp.bfloat16, name="c1")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="n1")(x).astype(jnp.bfloat16)
        x = nn.gelu(x)
        x = _StridedConv3x3(96, dtype=jnp.bfloat16, name="c2")(x)
        return nn.LayerNorm(dtype=jnp.float32, name="n2")(x).astype(jnp.bfloat16)


class _Down(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        x = _StridedConv3x3(self.dim_out, dtype=jnp.bfloat16, name="c")(x)
        return nn.LayerNorm(dtype=jnp.float32,
                            name="n")(x).astype(jnp.bfloat16)


def _costs(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    g = lambda k: float(c.get(k) or 0.0)
    return g("flops"), g("bytes accessed"), g("transcendentals")


def time_pipelined(fn, make_input, n=10):
    """Median-free pipelined ms/call: dispatch n fresh-input calls, fence
    once (device executes in dispatch order; amortizes the ~25 ms tunnel
    RTT). Inputs are device-generated and fenced BEFORE t0."""
    keys = jax.random.split(jax.random.PRNGKey(0), n + 1)
    inputs = [make_input(k) for k in keys]
    np.asarray(sum(jnp.sum(jnp.asarray(x, jnp.float32))
                   for inp in inputs for x in jax.tree.leaves(inp)))
    out = fn(*inputs[0])                       # warm (compile + load)
    np.asarray(out)
    t0 = time.time()
    for inp in inputs[1:]:
        out = fn(*inp)
    np.asarray(out)
    return (time.time() - t0) / n * 1000.0


def calibrate_exp_rate():
    """Measured elementwise-exp throughput (fp32, chained in-register so
    HBM traffic is amortized): the VPU-transcendental roof."""
    N, CHAIN = 1 << 24, 16

    @jax.jit
    def f(x):
        return jnp.sum(jax.lax.fori_loop(
            0, CHAIN, lambda i, v: jnp.exp(v * 1e-6), x))

    gen = jax.jit(lambda k: jax.random.uniform(k, (N,), jnp.float32))
    ms = time_pipelined(f, lambda k: (gen(k),), n=8)
    return N * CHAIN / (ms / 1000.0)           # transcendentals / s


def probe(name, module, shape, rows, exp_rate, n=10):
    x0 = jnp.zeros(shape, jnp.bfloat16 if shape[-1] != 1 else jnp.float32)
    params = jax.jit(module.init)(jax.random.PRNGKey(0), x0)
    fn = jax.jit(lambda p, x: jnp.sum(
        module.apply(p, x).astype(jnp.float32)))
    dt = jnp.bfloat16 if shape[-1] != 1 else jnp.float32
    gen = jax.jit(lambda k: jax.random.uniform(k, shape, dt))
    ms = time_pipelined(lambda x: fn(params, x), lambda k: (gen(k),), n=n)
    flops, bytes_, trans = _costs(fn, params, x0)
    t_mxu = flops / V5E_BF16_PEAK * 1e3
    t_hbm = bytes_ / V5E_HBM_BPS * 1e3
    t_vpu = trans / exp_rate * 1e3
    bound, t_bound = max(
        (("MXU", t_mxu), ("HBM", t_hbm), ("VPU-exp", t_vpu)),
        key=lambda kv: kv[1])
    rows.append(dict(
        stage=name, ms=round(ms, 3), gflop=round(flops / 1e9, 2),
        mb=round(bytes_ / 1e6, 1), transc_m=round(trans / 1e6, 2),
        t_mxu_ms=round(t_mxu, 3), t_hbm_ms=round(t_hbm, 3),
        t_vpu_ms=round(t_vpu, 3), bound=bound,
        achieved=round(t_bound / ms, 3) if ms > 0 else None))
    print(f"{name:24s} {ms:8.3f} ms  roof[{bound}] "
          f"{t_bound:7.3f} ms  -> {100 * t_bound / ms:5.1f}% of roof  "
          f"({flops / 1e9:8.2f} GF, {bytes_ / 1e6:8.1f} MB, "
          f"{trans / 1e6:7.2f} Mexp)", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/roofline.json")
    ap.add_argument("-B", type=int, default=8)
    args = ap.parse_args()
    B = args.B

    print("# calibrating VPU exp rate...", flush=True)
    exp_rate = calibrate_exp_rate()
    print(f"# measured exp throughput: {exp_rate / 1e9:.1f} Gexp/s",
          flush=True)

    rows = []
    dims = [96, 192, 384, 768]
    res = [128, 64, 32, 16]

    probe("patch_embed", _PatchEmbed(), (B, 512, 512, 1), rows, exp_rate)
    total_blocks = 0.0
    for i, (d, r) in enumerate(zip(dims, res)):
        total_blocks += probe(f"stage{i}_blocks(2)", _Blocks(d),
                              (B, r, r, d), rows, exp_rate)
        # within-stage split: the SS2D op alone vs the MLP alone
        probe(f"stage{i}_ss2d_x1", _Blocks(d, depth=1, mlp_ratio=0.0),
              (B, r, r, d), rows, exp_rate)
        if i < 3:
            probe(f"down{i}", _Down(dims[i + 1]), (B, r, r, d),
                  rows, exp_rate)

    # heads by subtraction: full forward_impl minus encoder-only
    from __graft_entry__ import VMAMBA_MODEL_CFG
    module, _ = build_xpoint(VMAMBA_MODEL_CFG)
    variables = jax.jit(lambda r: module.init(
        r, jnp.zeros((1, 64, 64, 1), jnp.float32),
        method=module.init_all))(jax.random.PRNGKey(0))
    full = jax.jit(lambda v, x: sum(
        jnp.sum(o.astype(jnp.float32))
        for o in jax.tree.leaves(module.apply(v, x))))
    enc = jax.jit(lambda v, x: jnp.sum(module.apply(
        v, x, "optical", method=module.encode).astype(jnp.float32)))
    gen = jax.jit(lambda k: jax.random.uniform(k, (B, 512, 512, 1)))
    ms_full = time_pipelined(lambda x: full(variables, x),
                             lambda k: (gen(k),))
    ms_enc = time_pipelined(lambda x: enc(variables, x),
                            lambda k: (gen(k),))
    f_f, b_f, t_f = _costs(full, variables, jnp.zeros((B, 512, 512, 1)))
    f_e, b_e, t_e = _costs(enc, variables, jnp.zeros((B, 512, 512, 1)))
    t_mxu = (f_f - f_e) / V5E_BF16_PEAK * 1e3
    t_hbm = (b_f - b_e) / V5E_HBM_BPS * 1e3
    t_vpu = (t_f - t_e) / exp_rate * 1e3
    ms_h = ms_full - ms_enc
    bound, t_bound = max((("MXU", t_mxu), ("HBM", t_hbm),
                          ("VPU-exp", t_vpu)), key=lambda kv: kv[1])
    rows.append(dict(stage="heads(=full-enc)", ms=round(ms_h, 3),
                     gflop=round((f_f - f_e) / 1e9, 2),
                     mb=round((b_f - b_e) / 1e6, 1),
                     transc_m=round((t_f - t_e) / 1e6, 2),
                     t_mxu_ms=round(t_mxu, 3), t_hbm_ms=round(t_hbm, 3),
                     t_vpu_ms=round(t_vpu, 3), bound=bound,
                     achieved=round(t_bound / ms_h, 3) if ms_h > 0 else None))
    print(f"{'heads(=full-enc)':24s} {ms_h:8.3f} ms  roof[{bound}] "
          f"{t_bound:7.3f} ms", flush=True)
    rows.append(dict(stage="one_full_forward", ms=round(ms_full, 3),
                     gflop=round(f_f / 1e9, 2), mb=round(b_f / 1e6, 1),
                     transc_m=round(t_f / 1e6, 2)))
    print(f"{'one_full_forward':24s} {ms_full:8.3f} ms "
          f"(x2 passes/pair-batch)", flush=True)

    out = dict(B=B, exp_rate_gexps=round(exp_rate / 1e9, 2), stages=rows)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"written to {args.out}", flush=True)


if __name__ == "__main__":
    main()

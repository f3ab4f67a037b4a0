"""Committed apples-to-apples stage timing table for the flagship model.

Mirrors the reference's published speed measurement — per-stage mean ms and
Hz for two_forward / nms / interpolate plus total (reference
benchmark.py:151-164, benchmark_evaluation.py:16-134, cuda-synchronized) —
in two forms:

  host-staged  the reference's exact decomposition: each stage fenced by a
               device->host fetch at batch size 1 (eval/benchmark.py::
               timing_harness). Under the axon dev tunnel every fence pays
               a ~25 ms round trip, so these numbers OVERSTATE stage cost
               by up to that much each; the caveat travels in the JSON.

  on-device    the production decomposition: cumulative sub-pipelines of
               the fused jit program (two_forward -> +nms/top-k ->
               +interpolate -> +match), each timed PIPELINED over fresh
               inputs at the bench batch size, stage cost = delta between
               consecutive prefixes. No per-stage round trips — this is
               how the framework actually runs (bench.py).

Writes metrics/stage_table.json and prints both tables in the reference's
"stage: X ms, Y Hz" format. Run on the TPU with nothing else using the
chip (serialize vs tests/bench — see .claude/skills/verify/SKILL.md).
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def _fresh_inputs(rng, n, B, H, W):
    ins = [(jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32)),
            jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32)))
           for _ in range(n)]
    for a, b in ins:                          # force transfers up front
        np.asarray(jnp.sum(a) + jnp.sum(b))
    return ins


def host_staged_table(module, variables, H, W, n_samples=5, seed=0):
    """Reference benchmark.py harness on synthetic samples: stage-by-stage,
    each stage fenced by the device->host fetch (batch size 1)."""
    from xpoint_tpu.eval.infer import XPointInference
    from xpoint_tpu.eval.benchmark import timing_harness

    infer = XPointInference(module, variables, {
        "nms": 8, "detection_threshold": 0.015, "topk": 0,
        "matching": {"method": "bfmatcher",
                     "method_kwargs": {"crossCheck": True},
                     "knn_matches": False}})

    rng = np.random.default_rng(seed)

    class _SynthPairs:
        def __getitem__(self, i):
            o = rng.uniform(size=(H, W, 1)).astype(np.float32)
            t = rng.uniform(size=(H, W, 1)).astype(np.float32)
            ones = np.ones((H, W), np.float32)
            return {"optical": {"image": o, "valid_mask": ones},
                    "thermal": {"image": t, "valid_mask": ones}}

        def __len__(self):
            return n_samples

    cfg = {"prediction": {"nms": 8}}
    return timing_harness(infer, _SynthPairs(), list(range(n_samples)), cfg)


def on_device_table(module, variables, B, H, W, k=1024, n_iters=10, seed=1):
    """Fused-pipeline stage deltas, pipelined (the production numbers)."""
    from xpoint_tpu.ops.detector import prob_from_logits
    from xpoint_tpu.ops.nms import box_nms_extract
    from xpoint_tpu.ops.descriptor import interpolate_descriptors
    from xpoint_tpu.ops.matching import mnn_match

    ratio = module.encoder_downsample_ratio
    nmsx = partial(box_nms_extract, size=8, min_prob=0.015, iou=0.1, k=k,
                   max_candidates=4096)
    interp = partial(interpolate_descriptors, image_shape=(H, W))

    def _forward(variables, img_o, img_t):
        pred_o = module.apply(variables, img_o, "optical")
        pred_t = module.apply(variables, img_t, "thermal")
        prob_o = prob_from_logits(pred_o["logits"], ratio)
        prob_t = prob_from_logits(pred_t["logits"], ratio)
        return pred_o, pred_t, prob_o, prob_t

    @jax.jit
    def p_forward(variables, img_o, img_t):
        pred_o, pred_t, prob_o, prob_t = _forward(variables, img_o, img_t)
        # scalar-reduce every output so nothing is dead code but the fetch
        # stays one word
        return (prob_o.sum() + prob_t.sum()
                + pred_o["desc"].sum() + pred_t["desc"].sum())

    def _nms_stage(variables, img_o, img_t):
        pred_o, pred_t, prob_o, prob_t = _forward(variables, img_o, img_t)
        kps_o, sc_o, m_o = jax.vmap(nmsx)(prob_o)
        kps_t, sc_t, m_t = jax.vmap(nmsx)(prob_t)
        return pred_o, pred_t, kps_o, m_o, kps_t, m_t, sc_o, sc_t

    @jax.jit
    def p_nms(variables, img_o, img_t):
        pred_o, pred_t, kps_o, m_o, kps_t, m_t, sc_o, sc_t = _nms_stage(
            variables, img_o, img_t)
        return (kps_o.sum() + kps_t.sum() + sc_o.sum() + sc_t.sum()
                + pred_o["desc"].sum() + pred_t["desc"].sum())

    def _interp_stage(variables, img_o, img_t):
        pred_o, pred_t, kps_o, m_o, kps_t, m_t, _, _ = _nms_stage(
            variables, img_o, img_t)
        d_o = jax.vmap(interp)(kps_o.astype(jnp.float32), pred_o["desc"])
        d_t = jax.vmap(interp)(kps_t.astype(jnp.float32), pred_t["desc"])
        return d_o, d_t, m_o, m_t, kps_o, kps_t

    @jax.jit
    def p_interp(variables, img_o, img_t):
        d_o, d_t, m_o, m_t, kps_o, kps_t = _interp_stage(
            variables, img_o, img_t)
        return d_o.sum() + d_t.sum() + kps_o.sum() + kps_t.sum()

    @jax.jit
    def p_match(variables, img_o, img_t):
        d_o, d_t, m_o, m_t, kps_o, kps_t = _interp_stage(
            variables, img_o, img_t)
        idx2, dist, matched = jax.vmap(
            partial(mnn_match, threshold=None, cross_check=True))(
                d_o, d_t, m_o, m_t)
        return jnp.where(matched, dist, 0.0).sum() + kps_o.sum() + kps_t.sum()

    rng = np.random.default_rng(seed)
    prefixes = [("two_forward", p_forward), ("nms", p_nms),
                ("interpolate", p_interp), ("match", p_match)]
    cumulative = {}
    for name, fn in prefixes:
        warm = _fresh_inputs(rng, 1, B, H, W)[0]
        np.asarray(fn(variables, *warm))                 # compile + drain
        ins = _fresh_inputs(rng, n_iters, B, H, W)
        t0 = time.time()
        outs = [fn(variables, a, b) for a, b in ins]
        np.asarray(outs[-1])                             # fence the stream
        cumulative[name] = (time.time() - t0) / n_iters
    stages = {}
    prev = 0.0
    for name, _ in prefixes:
        stages[name] = max(cumulative[name] - prev, 0.0)
        prev = cumulative[name]
    return stages, cumulative


def main():
    from xpoint_tpu.models import build_xpoint
    from xpoint_tpu.eval.benchmark import print_timing
    from __graft_entry__ import VMAMBA_MODEL_CFG

    B = int(os.environ.get("XPOINT_BENCH_B", "8"))
    H = W = 512
    module, _ = build_xpoint(VMAMBA_MODEL_CFG)
    variables = jax.jit(lambda r: module.init(
        r, jnp.zeros((1, 64, 64, 1), jnp.float32),
        method=module.init_all))(jax.random.PRNGKey(0))

    print(f"== host-staged (reference decomposition, B=1, each stage "
          f"fenced by a fetch; ~25 ms tunnel RTT per fence) @{H}^2 ==")
    host = host_staged_table(module, variables, H, W)
    print_timing(host)

    print(f"\n== on-device (fused pipeline, pipelined deltas, B={B}) "
          f"@{H}^2 ==")
    stages, cumulative = on_device_table(module, variables, B, H, W)
    per_pair = {}
    total = 0.0
    for name, dt in stages.items():
        per_pair[name] = dt / B
        total += dt / B
        hz = B / dt if dt > 0 else float("inf")
        print(f"{name}: {dt * 1000:.2f} ms/batch "
              f"({dt / B * 1000:.3f} ms/pair), {hz:.2f} Hz")
    print(f"total: {total * B * 1000:.2f} ms/batch, {B / total / B:.2f} Hz "
          f"({1.0 / total:.1f} pairs/s)")

    out = {
        "model": "XPoint VMamba-tiny v05_noz (flagship, random init)",
        "image_size": [H, W],
        "host_staged": {
            "batch_size": 1,
            "caveat": ("each stage fenced by a device->host fetch; under "
                       "the axon dev tunnel a fence costs ~25 ms RTT, so "
                       "stage means are inflated by up to that much — "
                       "mirrors reference benchmark.py:151-164 semantics"),
            "stage_seconds": {k: list(map(float, v))
                              for k, v in host.items()},
            "stage_ms_mean": {k: float(np.mean(v)) * 1000
                              for k, v in host.items()},
        },
        "on_device": {
            "batch_size": B,
            "method": ("cumulative fused sub-pipelines timed pipelined "
                       "over fresh inputs; stage = delta between "
                       "consecutive prefixes (production execution mode, "
                       "bench.py)"),
            "stage_ms_per_batch": {k: float(v) * 1000
                                   for k, v in stages.items()},
            "stage_ms_per_pair": {k: float(v) * 1000
                                  for k, v in per_pair.items()},
            "cumulative_ms_per_batch": {k: float(v) * 1000
                                        for k, v in cumulative.items()},
            "pairs_per_sec_full_chain": float(B / cumulative["match"]),
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "metrics", "stage_table.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwritten to {path}")


if __name__ == "__main__":
    main()

"""Driver benchmark: optical-thermal pairs/sec (detect+describe+match) at 512².

Runs the fused pipeline (two forwards + cell-softmax + box-NMS + top-k +
descriptor sampling + MNN matching) as one jit program on the flagship
VMamba-encoder XPoint model, reproducing the reference's timed chain
(benchmark.py:151-164: two_forward + nms + interpolate, cuda-synchronized).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from xpoint_tpu.models import build_xpoint
    from xpoint_tpu.eval import make_pair_pipeline
    from __graft_entry__ import VMAMBA_MODEL_CFG

    import os as _os
    B, H, W = int(_os.environ.get("XPOINT_BENCH_B", "8")), 512, 512
    module, _ = build_xpoint(VMAMBA_MODEL_CFG)
    rng = np.random.default_rng(0)
    img_o = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    img_t = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))

    t0 = time.time()
    # params are resolution-independent: init on a small image for speed
    variables = jax.jit(lambda r: module.init(
        r, jnp.zeros((1, 64, 64, 1), jnp.float32),
        method=module.init_all))(jax.random.PRNGKey(0))
    print(f"# init: {time.time()-t0:.1f}s", flush=True)

    pipeline = make_pair_pipeline(module, (H, W), k=1024, nms_size=8,
                                  detection_threshold=0.015)

    t0 = time.time()
    out = pipeline(variables, img_o, img_t)
    jax.block_until_ready(out)
    print(f"# compile+first run: {time.time()-t0:.1f}s", flush=True)

    # optional profiler trace (XPOINT_PROFILE_DIR=/path): captures a few
    # pipelined iterations for xprof/tensorboard analysis
    import os
    profile_dir = os.environ.get("XPOINT_PROFILE_DIR")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            for _ in range(3):
                out = pipeline(variables, img_o, img_t)
            np.asarray(out["match_dist"])
        print(f"# profiler trace written to {profile_dir}", flush=True)

    # Measurement notes (see .claude/skills/verify/SKILL.md):
    #  * block_until_ready is NOT an execution fence under the axon tunnel —
    #    only a device->host fetch is;
    #  * identical re-executions are cached by the runtime — every timed
    #    iteration must see a never-repeated input;
    #  * each dispatch+fetch pays a ~25 ms tunnel round trip, so production
    #    throughput is measured PIPELINED: dispatch a stream of batches and
    #    fence once at the end (single-device programs execute in dispatch
    #    order), amortizing the round trip away.
    n_iters = 12
    n_lat = 4
    # +1 drain, +n_lat latency probes, +n_iters pipelined — all DISTINCT
    # (already-executed inputs would be served from the runtime cache)
    inputs = [(jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32)),
               jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32)))
              for _ in range(1 + n_lat + n_iters)]
    for a, b in inputs:                      # force input transfers now
        np.asarray(jnp.sum(a) + jnp.sum(b))

    # single-shot latency (one batch, fenced)
    np.asarray(pipeline(variables, *inputs[0])["match_dist"])   # drain
    lat = []
    for a, b in inputs[1:1 + n_lat]:
        t0 = time.time()
        out = pipeline(variables, a, b)
        np.asarray(out["match_dist"])
        lat.append(time.time() - t0)
    latency = float(np.median(lat))

    # pipelined throughput (the production number) on FRESH inputs only
    stream = inputs[1 + n_lat:]
    t0 = time.time()
    outs = [pipeline(variables, a, b) for a, b in stream]
    np.asarray(outs[-1]["match_dist"])       # fence the whole stream
    dt = (time.time() - t0) / len(stream)
    pairs_per_sec = B / dt
    print(f"# single-shot latency: {latency*1000:.1f} ms/batch of {B} pairs",
          flush=True)
    print(f"# pipelined steady-state: {dt*1000:.1f} ms/batch of {B} pairs "
          f"({int(outs[-1]['matched'].sum())} matches)", flush=True)

    # Reference-chain comparison. The reference repo publishes no numbers
    # (BASELINE.md) and no GPU exists in this environment; the only locally
    # measurable reference number is its own flagship two_forward chain on
    # the host CPU: 14.42 s/pair = 0.069 pairs/s @512^2 (torch 2.x, eager,
    # fp32; measured via tests/reference_oracle.py on 2026-08-16 — NMS and
    # matching stages EXCLUDED, which favors the reference). vs_baseline is
    # our full-chain TPU-chip throughput over that number; see README
    # "Benchmarks" for the GPU-target arithmetic.
    ref_cpu_pairs_s = 0.069
    print(json.dumps({
        "metric": "optical-thermal pairs/sec (detect+describe+match) at 512^2",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / ref_cpu_pairs_s, 1),
        "baseline": ("reference torch eager fp32 on host CPU, 0.069 pairs/s"
                     " (two_forward chain only; NMS/matching excluded, which"
                     " favors the reference) — no GPU in this environment;"
                     " see README 'Benchmarks' for the GPU-target estimate"
                     " (~3-6x over the 5x-GPU bar at 8 chips)"),
    }))


if __name__ == "__main__":
    main()

"""Driver benchmark: optical-thermal pairs/sec (detect+describe+match) at 512².

Runs the fused pipeline (two forwards + cell-softmax + box-NMS + top-k +
descriptor sampling + MNN matching) as one jit program on the flagship
VMamba-encoder XPoint model, reproducing the reference's timed chain
(benchmark.py:151-164: two_forward + nms + interpolate, cuda-synchronized).

Self-defending measurement: the axon tunnel occasionally degrades
(multi-second stalls on fetches), which historically shipped a 3x-low
number. Each measured stream is sanity-checked — single-shot latency must
be physically consistent with the pipelined batch time — and on violation
the stream is re-run (up to 3x); the JSON reports the best stable stream
plus a `stability` verdict so a degraded capture is visible, not silent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# persistent compilation cache: the 512^2 flagship pipeline compile costs
# ~9 min through the TPU tunnel; repeat bench runs in the same container
# skip it entirely (harmless no-op if the PJRT backend can't serialize)
try:
    _cache = os.environ.get("XPOINT_JAX_CACHE", "/tmp/xpoint_jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

# TPU v5e (v5 lite) single-chip peak: 197 TFLOP/s bf16.
V5E_BF16_PEAK_FLOPS = 197e12


def _program_flops(jitted, *args):
    """Total FLOPs of one invocation from XLA's compiled cost model
    (replaces the reference's fvcore counting, VMamba.py:1527-1548)."""
    try:
        costs = jitted.lower(*args).compile().cost_analysis()
        if isinstance(costs, list):
            costs = costs[0]
        f = costs.get("flops")
        return float(f) if f and np.isfinite(f) else None
    except Exception as e:            # cost model unavailable on this PJRT
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}",
              flush=True)
        return None


def _measure_stream(pipeline, variables, key, B, H, W,
                    n_lat=4, n_iters=12):
    """One full measurement stream on never-repeated device-generated
    inputs. Returns (latency_ms, pipelined_ms).

    Measurement notes (see .claude/skills/verify/SKILL.md):
      * block_until_ready is NOT an execution fence under the axon tunnel —
        only a device->host fetch is;
      * identical re-executions are cached by the runtime — every timed
        iteration must see a never-repeated input;
      * each dispatch+fetch pays a ~25 ms tunnel round trip, so production
        throughput is measured PIPELINED: dispatch a stream of batches and
        fence once at the end (single-device programs execute in dispatch
        order), amortizing the round trip away.
    """
    gen = jax.jit(lambda k: jax.random.uniform(k, (B, H, W, 1)))
    keys = jax.random.split(key, 2 * (1 + n_lat + n_iters))
    inputs = [(gen(keys[2 * i]), gen(keys[2 * i + 1]))
              for i in range(1 + n_lat + n_iters)]
    # force input generation to complete before any timing window
    total = sum(jnp.sum(a) + jnp.sum(b) for a, b in inputs)
    np.asarray(total)

    # single-shot latency (one batch, fenced)
    np.asarray(pipeline(variables, *inputs[0])["match_dist"])   # drain
    lat = []
    for a, b in inputs[1:1 + n_lat]:
        t0 = time.time()
        out = pipeline(variables, a, b)
        np.asarray(out["match_dist"])
        lat.append(time.time() - t0)
    latency_ms = float(np.median(lat)) * 1000.0

    # pipelined throughput (the production number) on FRESH inputs only
    stream = inputs[1 + n_lat:]
    t0 = time.time()
    outs = [pipeline(variables, a, b) for a, b in stream]
    np.asarray(outs[-1]["match_dist"])       # fence the whole stream
    pipelined_ms = (time.time() - t0) / len(stream) * 1000.0
    n_match = int(outs[-1]["matched"].sum())
    return latency_ms, pipelined_ms, n_match


def _stream_stable(latency_ms, pipelined_ms):
    """A healthy tunnel shows single-shot = pipelined + O(25 ms RTT).
    The r03 failure mode (latency 1200 ms vs pipelined 128 ms) violates
    this by an order of magnitude."""
    return (np.isfinite(latency_ms) and np.isfinite(pipelined_ms)
            and pipelined_ms > 0
            and latency_ms <= 3.0 * pipelined_ms + 100.0)


def select_stream(streams):
    """Pick the stream of record from [(stable, latency_ms, pipelined_ms)].

    Best (fastest pipelined) STABLE stream wins; with no stable stream the
    least-bad capture is reported but flagged "degraded" so the driver's
    record carries the health verdict (tests/test_bench_stability.py)."""
    stable = [s for s in streams if s[0]]
    stability = "ok" if stable else "degraded"
    _, latency_ms, pipelined_ms = min(stable or streams, key=lambda s: s[2])
    return stability, latency_ms, pipelined_ms


def main():
    from xpoint_tpu.models import build_xpoint
    from xpoint_tpu.eval import make_pair_pipeline
    from __graft_entry__ import VMAMBA_MODEL_CFG

    B = int(os.environ.get("XPOINT_BENCH_B", "8"))
    H = W = 512
    module, _ = build_xpoint(VMAMBA_MODEL_CFG)

    t0 = time.time()
    # params are resolution-independent: init on a small image for speed
    variables = jax.jit(lambda r: module.init(
        r, jnp.zeros((1, 64, 64, 1), jnp.float32),
        method=module.init_all))(jax.random.PRNGKey(0))
    init_s = time.time() - t0
    print(f"# init: {init_s:.1f}s", flush=True)

    pipeline = make_pair_pipeline(module, (H, W), k=1024, nms_size=8,
                                  detection_threshold=0.015)

    rng = np.random.default_rng(0)
    img_o = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    img_t = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    # Split the cold-start account (VERDICT r4 #4): compile_s is the real
    # XLA (client-side) compile — ~16 s cold, <1 s warm via the persistent
    # cache above. first_exec_s is the axon runtime's per-process program
    # load on first execution (server-side Mosaic/TPU work the jax cache
    # cannot capture; measured 409 s on a FULLY cache-warm compile —
    # docs/TPU_NOTES.md 'Cold-start anatomy'). On a non-tunneled TPU
    # runtime first_exec_s collapses into compile_s.
    t0 = time.time()
    compiled = pipeline.lower(variables, img_o, img_t).compile()
    compile_s = time.time() - t0
    print(f"# XLA compile (client): {compile_s:.1f}s", flush=True)
    t0 = time.time()
    out = pipeline(variables, img_o, img_t)
    np.asarray(out["match_dist"])
    first_exec_s = time.time() - t0
    print(f"# first execution (program load): {first_exec_s:.1f}s",
          flush=True)

    flops = _program_flops(pipeline, variables, img_o, img_t)

    # optional profiler trace (XPOINT_PROFILE_DIR=/path): captures a few
    # pipelined iterations for xprof/tensorboard analysis
    profile_dir = os.environ.get("XPOINT_PROFILE_DIR")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            for _ in range(3):
                out = pipeline(variables, img_o, img_t)
            np.asarray(out["match_dist"])
        print(f"# profiler trace written to {profile_dir}", flush=True)

    # measured streams, re-run on instability (max 3)
    streams = []
    for attempt in range(3):
        latency_ms, pipelined_ms, n_match = _measure_stream(
            pipeline, variables, jax.random.PRNGKey(100 + attempt), B, H, W)
        ok = _stream_stable(latency_ms, pipelined_ms)
        streams.append((ok, latency_ms, pipelined_ms))
        print(f"# stream {attempt}: single-shot {latency_ms:.1f} ms, "
              f"pipelined {pipelined_ms:.1f} ms/batch of {B} pairs "
              f"({n_match} matches) — {'ok' if ok else 'UNSTABLE'}",
              flush=True)
        if ok:
            break
    stability, latency_ms, pipelined_ms = select_stream(streams)
    pairs_per_sec = B / (pipelined_ms / 1000.0)

    mfu = achieved_tflops = flops_per_pair = None
    if flops:
        flops_per_pair = flops / B
        achieved_tflops = flops / (pipelined_ms / 1000.0) / 1e12
        mfu = achieved_tflops * 1e12 / V5E_BF16_PEAK_FLOPS
        print(f"# fused pipeline: {flops_per_pair/1e9:.2f} GFLOP/pair, "
              f"{achieved_tflops:.1f} TFLOP/s achieved = "
              f"{100*mfu:.1f}% of v5e bf16 peak", flush=True)

    # train-step MFU on the flagship model at training resolution (256²,
    # the cmt.yaml shape) — the second number the roofline story needs
    train = {}
    if os.environ.get("XPOINT_BENCH_TRAIN", "1") == "1":
        try:
            train = _train_step_mfu(module, variables, B=8, size=256)
            print(f"# train step: {train['train_step_ms']:.1f} ms/step, "
                  f"{train['train_achieved_tflops']:.1f} TFLOP/s = "
                  f"{100 * train['train_mfu']:.1f}% of v5e bf16 peak"
                  if train.get("train_mfu") is not None else
                  "# train step: cost model unavailable", flush=True)
        except Exception as e:
            print(f"# train-step bench failed: {type(e).__name__}: {e}",
                  flush=True)
            train = {}
    # opt-in: flagship train step at the 512² production resolution with
    # the SPARSE descriptor loss (the dense hinge is O(Hc^4)=64^4/sample
    # there — the reference's own memory hot spot, losses.py:706-713; the
    # sparse path, reference losses.py:613-685, is the production setting
    # at that shape). Off by default to keep driver bench runs short.
    if os.environ.get("XPOINT_BENCH_TRAIN512", "0") == "1":
        try:
            t512 = _train_step_mfu(module, variables, B=4, size=512,
                                   sparse=True)
            train.update({f"train512_{k[6:]}": v for k, v in t512.items()})
            print(f"# train step @512² B=4 sparse: "
                  f"{t512['train_step_ms']:.1f} ms/step, "
                  f"{t512.get('train_achieved_tflops', float('nan'))} "
                  f"TFLOP/s", flush=True)
        except Exception as e:
            print(f"# 512² train bench failed: {type(e).__name__}: {e}",
                  flush=True)

    # Reference-chain comparison. The reference repo publishes no numbers
    # (BASELINE.md) and no GPU exists in this environment; the only locally
    # measurable reference number is its own flagship two_forward chain on
    # the host CPU: 14.42 s/pair = 0.069 pairs/s @512^2 (torch 2.x, eager,
    # fp32; measured via tests/reference_oracle.py on 2026-08-16 — NMS and
    # matching stages EXCLUDED, which favors the reference). vs_baseline is
    # our full-chain TPU-chip throughput over that number; README
    # "Benchmarks" derives the GPU-target claim from the MFU numbers below.
    ref_cpu_pairs_s = 0.069
    print(json.dumps({
        "metric": "optical-thermal pairs/sec (detect+describe+match) at 512^2",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / ref_cpu_pairs_s, 1),
        "stability": stability,
        "streams_run": len(streams),
        # raw per-stream captures (stable?, single-shot ms, pipelined ms):
        # a tunnel degradation that slows single-shot and pipelined
        # PROPORTIONALLY passes _stream_stable, so the driver record keeps
        # every raw capture visible rather than only the selected stream
        "streams_raw": [[bool(s[0]), round(s[1], 1), round(s[2], 1)]
                        for s in streams],
        "latency_ms": round(latency_ms, 1),
        "pipelined_ms": round(pipelined_ms, 1),
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "first_exec_s": round(first_exec_s, 1),
        "flops_per_pair": flops_per_pair,
        "achieved_tflops": (round(achieved_tflops, 2)
                            if achieved_tflops else None),
        "mfu": round(mfu, 4) if mfu else None,
        **train,
        "baseline": ("reference torch eager fp32 on host CPU, 0.069 pairs/s"
                     " (two_forward chain only; NMS/matching excluded, which"
                     " favors the reference) — no GPU in this environment;"
                     " see README 'Benchmarks' for the MFU-derived"
                     " GPU-target arithmetic"),
    }))


def _train_step_mfu(module, variables, B=8, size=256, sparse=False):
    """Time the flagship pair train step (forward+backward+adam) and
    report achieved FLOP/s vs the v5e bf16 peak."""
    import optax
    from xpoint_tpu.losses import XPointLoss
    from xpoint_tpu.parallel import make_train_step, TrainState

    loss_fn = XPointLoss({
        "detector_loss_function": "cross_entropy",
        "detector_handle_multiple_keypoints": "soft_assignment",
        "detector_dustbin_loss_weight": 0.025,
        "lambda": 1.0, "descriptor_loss_threshold": 4.0,
        "descriptor_loss": True, "lambda_d": 250,
        "positive_margin": 1.0, "negative_margin": 0.2,
        "sparse_descriptor_loss": sparse,
        "sparse_descriptor_loss_num_cell_divisor": 64,
    })
    tx = optax.adam(1e-4)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"), tx)
    step = make_train_step(module, loss_fn, takes_pair=True, donate=False)

    rng = np.random.default_rng(1)
    eye = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))

    def fresh_batch():
        return {
            "optical": {
                "image": jnp.asarray(rng.uniform(
                    size=(B, size, size, 1)).astype(np.float32)),
                "keypoints": jnp.asarray((rng.uniform(
                    size=(B, size, size)) > 0.995).astype(np.float32)),
                "valid_mask": jnp.ones((B, size, size), jnp.float32),
                "homography": jnp.asarray(eye),
            },
            "thermal": {
                "image": jnp.asarray(rng.uniform(
                    size=(B, size, size, 1)).astype(np.float32)),
                "keypoints": jnp.asarray((rng.uniform(
                    size=(B, size, size)) > 0.995).astype(np.float32)),
                "valid_mask": jnp.ones((B, size, size), jnp.float32),
                "homography": jnp.asarray(eye),
            },
        }

    key = jax.random.PRNGKey(7)
    state, comps = step(state, fresh_batch(), key)       # compile + warm
    np.asarray(comps["loss"])

    flops = None
    try:
        costs = (step.lower(state, fresh_batch(), key).compile()
                 .cost_analysis())
        if isinstance(costs, list):
            costs = costs[0]
        f = costs.get("flops")
        flops = float(f) if f and np.isfinite(f) else None
    except Exception:
        pass

    n = 8
    batches = [fresh_batch() for _ in range(n)]
    # force the host->device transfers to COMPLETE before the timing
    # window (same discipline as _measure_stream): without this fence the
    # loop times the tunnel's transfer bandwidth, not the step — measured
    # 127 ms/step unfenced vs 31 ms fenced on identical programs
    total = sum(jnp.sum(v) for b in batches for v in jax.tree.leaves(b))
    np.asarray(total)
    t0 = time.time()
    for b in batches:
        state, comps = step(state, b, key)
    np.asarray(comps["loss"])                            # fence the stream
    ms = (time.time() - t0) / n * 1000.0
    out = {"train_step_ms": round(ms, 1)}
    if flops:
        tf = flops / (ms / 1000.0) / 1e12
        out.update(train_flops_per_step=flops,
                   train_achieved_tflops=round(tf, 2),
                   train_mfu=round(tf * 1e12 / V5E_BF16_PEAK_FLOPS, 4))
    return out


if __name__ == "__main__":
    main()

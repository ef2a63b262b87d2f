"""Benchmark: full-scene EMIT-equivalent matched-filter latency on TPU.

Prints ONE JSON line:
  {"metric": "emit_full_scene_mag1c_latency", "value": <seconds>,
   "unit": "s", "vs_baseline": <speedup over the CPU float64 reference>,
   "extras": {eval_tiles_per_sec[_bf16w][_bf16w_b32][_median],
              emit_granule_to_mask_ms, train_steps_per_sec[_bf16][_median],
              mag1c_device_ms / mag1c_tflops / mag1c_pct_peak_bf16_mxu /
              mag1c_hbm_gbps, serve_scenes_per_sec[_median] /
              serve_mpx_per_sec / serve_stage_*_ms,
              unet_scene_forward[_bf16w]_ms, full_scene_mag1c_median_ms,
              synthetic_f1[_at_500], oracle_mask_agreement}}

The extras are BASELINE.md's target metrics plus the repo's best configs
(bf16-resident-weights inference / bf16 training / u12-upload serving), the
resident kernel's device-time roofline accounting, and the serving
pipeline's steady-state throughput with per-stage attribution, measured by
benchmarks/harness.py on the same chip in the same process. Headlines are
best-chain; *_median companions record the shared-host spread. Before any
headline is printed, the timed kernel's output must pass a threshold-mask
agreement guard against the float64 reference oracle on the sampled blocks.

The headline target (BASELINE.md): >= 10x the CPU reference's full-scene EMIT
matched-filter throughput. The scene is a synthetic EMIT-granule-sized cube
(1280 x 1242 px, ~50 bands in the 2122-2488 nm window) with injected plumes,
run at the reference's production settings (30 iterations, alpha 1e-4).

Baseline denominator: the float64 numpy restatement of the reference math
(starcop_tpu.ops.mag1c.reference_oracle_acrwl1mf — the same algorithm the
reference runs in torch float64 on CPU), timed on a slice of the scene's
column blocks and scaled linearly to the full block count (the reference
processes blocks sequentially, so per-block cost is additive). Extra context
(TPU tiles/sec, pixel throughput) goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from starcop_tpu.utils import enable_persistent_compilation_cache

    # Remote-attached TPU compiles are 20 s - 10+ min; persist executables
    # so driver re-runs (and the extras' many programs) pay once.
    enable_persistent_compilation_cache()

    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.ops.ch4_template import generate_template_from_bands
    from starcop_tpu.ops.mag1c import mag1c_column_blocks, reference_oracle_acrwl1mf

    # EMIT-like band set inside the matched-filter window (~7.4 nm sampling).
    centers = np.arange(2122.0, 2488.0, 7.4)
    fwhm = np.full_like(centers, 8.0)
    template = generate_template_from_bands(centers, fwhm)[:, 1]

    H, W = 1280, 1242
    COLUMN_STEP = 54  # 1242 = 23 blocks of 54: EMIT-granule-scale blocks
    NUM_ITER, ALPHA = 30, 1e-4

    rng = np.random.default_rng(0)
    scene = synthetic_scene(rng, H, W, n_plumes=6, template=template)
    cube = scene["radiance"]
    print(f"scene {cube.shape}, column_step {COLUMN_STEP}", file=sys.stderr)

    import functools

    x = jnp.asarray(cube)
    tpl = jnp.asarray(template)
    # mag1c_column_blocks is ITSELF jitted (static column_step/num_iter/
    # alpha); calling it directly — not through an outer jax.jit wrapper —
    # populates its own jit cache, which the harness roofline section and
    # the synthetic_f1 quality probe then hit for free. (An outer wrapper
    # compiles a SEPARATE program; with no cross-process persistent-cache
    # hits on the remote-attached backend, that cost a redundant multi-
    # minute compile per section.)
    jitted = functools.partial(
        mag1c_column_blocks, column_step=COLUMN_STEP, num_iter=NUM_ITER, alpha=ALPHA
    )

    # Pipelined timing: the remote (axon) tunnel has a ~33 ms host-sync round
    # trip (and block_until_ready returns early), so per-run syncs measure
    # RTT, not device time. Production serving pipelines scenes without
    # per-scene syncs; time N back-to-back scenes with ONE host-visible
    # scalar at the end and report per-scene latency. Depth 32 leaves <1 ms
    # of amortized RTT in the per-scene number (measured sweep: 13.6 / 10.5 /
    # 9.1 / 8.3 / 8.0 ms at depth 4 / 8 / 16 / 32 / 64 — pure RTT/depth).
    PIPELINE = 32
    t0 = time.time()
    mf, _alb = jitted(x, tpl, None)
    _ = float(jnp.sum(mf))
    compile_s = time.time() - t0
    times = []
    for _ in range(5):  # 5 chains (see harness._timed_stats): best-chain
        t0 = time.time()  # stability under shared-host scheduling noise
        acc = None
        for _ in range(PIPELINE):
            mf, _alb = jitted(x, tpl, None)
            s = jnp.sum(mf)
            acc = s if acc is None else acc + s
        _ = float(acc)
        times.append((time.time() - t0) / PIPELINE)
    # Best chain: the shared build host intermittently steals the dispatch
    # thread (see benchmarks/harness.py:_timed_stats) — steady state is the
    # uncontended chain; the median rides along in the extras as the spread
    # record.
    tpu_s = float(np.min(times))
    tpu_s_median = float(np.median(times))
    mf = np.asarray(mf)
    # Numerics guard: TPU-only precision behavior can diverge from the CPU
    # test suite (seen once: default bf16 matmul passes NaN-ing the Woodbury
    # glue). A benchmark of garbage is not a benchmark — fail loudly.
    if not np.isfinite(mf).all():  # not assert: must survive python -O
        raise RuntimeError("matched-filter output contains non-finite values")
    print(
        f"TPU: compile {compile_s:.1f}s, steady {tpu_s:.4f}s/scene pipelined x{PIPELINE} "
        f"({H * W / tpu_s / 1e6:.1f} Mpx/s), mf max {mf.max():.0f}",
        file=sys.stderr,
    )

    # CPU float64 reference baseline on a subset of blocks, scaled linearly.
    # Sample the two MOST plume-bearing column blocks (by true-label pixels):
    # blocks 0-1 of this scene carry no plumes, so sampling them would make
    # the detection guard below vacuous (all-zero mask vs all-zero mask).
    nb = -(-W // COLUMN_STEP)
    conc = scene["concentration"]
    block_true = np.array([
        (conc[:, b * COLUMN_STEP : (b + 1) * COLUMN_STEP] > 500.0).sum()
        for b in range(nb)
    ])
    sample_idx = np.argsort(block_true)[-2:]
    sample_blocks = len(sample_idx)
    xb = (
        np.pad(cube, ((0, 0), (0, nb * COLUMN_STEP - W), (0, 0)))
        .reshape(H, nb, COLUMN_STEP, len(template))
        .transpose(1, 0, 2, 3)
        .reshape(nb, H * COLUMN_STEP, len(template))
    )
    t0 = time.time()
    mf_oracle, _alb_oracle = reference_oracle_acrwl1mf(
        xb[sample_idx].astype(np.float64), template, num_iter=NUM_ITER, alpha=ALPHA
    )
    cpu_s = (time.time() - t0) * (nb / sample_blocks)
    print(f"CPU f64 reference (scaled from {sample_blocks}/{nb} blocks): {cpu_s:.1f}s", file=sys.stderr)

    # Detection-equivalence guard: the TIMED kernel's output must agree with
    # the float64 reference on the sampled column blocks before any headline
    # is printed — the driver can never record a number from an unverified
    # kernel path. Column blocks are independent, so mf restricted to a
    # block IS the full-scene run's result for those pixels (block b's
    # pixels are p = h*step + j at columns j + b*step).
    mf_blocks = np.stack(
        [mf[:, b * COLUMN_STEP : (b + 1) * COLUMN_STEP] for b in sample_idx]
    ).reshape(sample_blocks, H * COLUMN_STEP)
    oracle = np.asarray(mf_oracle).reshape(sample_blocks, H * COLUMN_STEP)
    n_oracle_det = int((oracle > 500.0).sum())
    if n_oracle_det == 0:  # the guard must never silently become vacuous
        raise RuntimeError(
            "guard sampled blocks contain no oracle detections — "
            "threshold-mask agreement would be vacuous"
        )
    agree = float(((mf_blocks > 500.0) == (oracle > 500.0)).mean())
    if agree < 0.999:  # f32-vs-f64 contract of the pinned kernel tests
        raise RuntimeError(
            f"kernel/oracle threshold-mask agreement {agree:.6f} < 0.999 — "
            "the timed matched-filter path diverges from the f64 reference"
        )
    print(
        f"detection-equivalence guard: mask agreement {agree:.6f} on blocks "
        f"{sorted(int(b) for b in sample_idx)} ({n_oracle_det} oracle detections)",
        file=sys.stderr,
    )

    # BASELINE.md's other target metrics, on the same chip. Each section is
    # skipped past the deadline (remote compiles vary 20-650 s; never risk
    # the driver's bench timeout for the extras).
    extras = {}
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from benchmarks.harness import collect

        budget_s = float(os.environ.get("STARCOP_BENCH_EXTRAS_BUDGET_S", "420"))
        for r in collect(quick=False, deadline_ts=time.time() + budget_s):
            extras[r["metric"]] = r["value"]
            print(f"extra: {r['metric']} = {r['value']} {r.get('unit', '')}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — extras must never break the headline
        print(f"extras failed: {e}", file=sys.stderr)

    extras["full_scene_mag1c_median_ms"] = round(tpu_s_median * 1e3, 2)
    extras["oracle_mask_agreement"] = round(agree, 6)
    print(
        json.dumps(
            {
                "metric": "emit_full_scene_mag1c_latency",
                "value": round(tpu_s, 4),
                "unit": "s",
                "vs_baseline": round(cpu_s / tpu_s, 2),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark harness: the BASELINE.md target metrics beyond the headline.

    python benchmarks/harness.py [--quick]

Reports (JSON lines to stdout, one per metric):
  * eval_tiles_per_sec[_bf16w][_bf16w_b32] — 512x512 4-channel tiles/sec through the
    flagship U-Net forward (the reference's batch_size=1 run_validation hot
    loop, batched here); _bf16w_b32 is the production-best config, _bf16w the
    bf16-resident-weights config (variables cast once, no per-layer casts);
  * emit_granule_to_mask_ms — raw granule -> plume mask, one fused program;
  * train_steps_per_sec[_bf16] — batch-32 128x128 training steps/sec (f32
    and the bf16-compute best config);
  * mag1c_device_ms / mag1c_tflops / mag1c_pct_peak_bf16_mxu /
    mag1c_hbm_gbps — device-time + roofline accounting for the headline
    resident matched filter (two pipeline depths isolate dispatch RTT);
  * serve_scenes_per_sec / serve_mpx_per_sec + serve_stage_{read,
    upload_compute,write}_ms — steady-state throughput and per-stage
    attribution of N granules through the overlapped serving pipeline
    (h5 read + u12-quantized upload + compute + GeoTIFF write);
  * unet_scene_forward[_bf16w]_ms — one reflect-padded whole-scene forward.

Headline values are best-chain; ``*_median`` companions carry the observed
shared-host spread. All timings are pipelined (N executions, ONE
host-visible scalar at the end, total/N — see ``_timed_stats``): the remote
TPU tunnel costs ~33 ms per host sync and its block_until_ready returns
early, so per-run syncs measure RTT.
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def _timed_stats(fn, repeats=5, pipeline=32, warm=True):
    """Per-run seconds, pipelined: enqueue ``pipeline`` dependent executions
    and force ONE host-visible scalar at the end.

    The remote (axon) TPU tunnel has a ~33 ms host-sync round trip; timing
    with a sync per run reports RTT, not device time (and production serving
    pipelines scenes without per-scene syncs). Executions on one device
    serialize, so total/pipeline is the true per-run device latency plus
    amortized dispatch. ``fn`` must return a jax array (NOT force a host
    sync itself).

    Returns ``(best, median)`` chain times. Headline numbers use the BEST
    chain: the first chain after compile is reliably slow (buffer/donation
    setup), and the shared build host intermittently steals the dispatch
    thread — measured e.g. bf16 train repeats of [52, 108, 107, 109, 109]
    steps/s, so a small-N median was reporting host noise. Five chains
    (round 5; was 3) give the best chain a better shot at an uncontended
    window — cross-run best-chain spread of the f32 train metric was
    53-68 steps/s at 3 repeats. The median rides along in the reported
    extras so the record carries the observed spread.
    """
    import jax.numpy as jnp

    if warm:
        float(jnp.sum(fn()))  # warm/compile
    times = []
    for _ in range(repeats):
        t0 = time.time()
        acc = None
        for _ in range(pipeline):
            s = jnp.sum(fn())
            acc = s if acc is None else acc + s
        float(acc)  # one sync for the whole chain
        times.append((time.time() - t0) / pipeline)
    return float(np.min(times)), float(np.median(times))


def _timed(fn, repeats=3, pipeline=32):
    return _timed_stats(fn, repeats=repeats, pipeline=pipeline)[0]


def collect(quick: bool = False, deadline_ts: float = None):
    """Measure all harness metrics; returns a list of result dicts (no
    printing — ``bench.py`` embeds these in the driver JSON line).

    ``deadline_ts``: absolute time.time() budget — remote-tunnel compiles
    vary 20-650 s, so each section is skipped once past the deadline rather
    than risking the driver's bench timeout.
    """

    class _Args:
        pass

    args = _Args()
    args.quick = quick

    t_start = time.time()

    def past_deadline():
        late = deadline_ts is not None and time.time() > deadline_ts
        if late:
            print(f"[harness] deadline hit at +{time.time() - t_start:.0f}s", file=_sys.stderr)
        return late

    import jax
    import jax.numpy as jnp

    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.train.loop import create_train_state, make_train_step

    results = []

    def _mark(name):
        print(f"[harness] {name} at +{time.time() - t_start:.0f}s", file=_sys.stderr)

    # ---- eval tiles/sec: 512x512 batched forward --------------------------
    _mark("eval")
    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="unet_semseg",
    )
    rng = np.random.default_rng(0)
    batch_eval = 4 if args.quick else 8
    x_eval = jnp.asarray(rng.uniform(0, 100, (batch_eval, 4, 512, 512)), jnp.float32)
    # jit(init): eager init is ~600 tiny dispatches = ~2 min over the tunnel.
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_eval[:1])

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def run_eval():
        return fwd(variables, x_eval)

    t, t_med = _timed_stats(run_eval)
    results.append({"metric": "eval_tiles_per_sec", "value": round(batch_eval / t, 2), "unit": "tiles/s"})
    results.append({"metric": "eval_tiles_per_sec_median", "value": round(batch_eval / t_med, 2), "unit": "tiles/s"})

    # bf16-RESIDENT-weights eval: the variables pytree is cast to bf16 once,
    # so no per-layer f32->bf16 casts exist (plain bf16-COMPUTE eval was
    # measured SLOWER than f32 because those casts dominate a DMA-bound
    # forward — docs/PROFILE.md). Detection equivalence pinned by
    # tests/test_models.py::test_bf16_resident_weights_inference.
    from starcop_tpu.models import cast_variables_for_inference

    model_bf16w = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="unet_semseg",
        model_dtype=jnp.bfloat16,
    )
    v_bf16 = cast_variables_for_inference(variables)
    fwd_bf16 = jax.jit(lambda v, x: model_bf16w.apply(v, x, train=False))

    def run_eval_bf16():
        return fwd_bf16(v_bf16, x_eval)

    if not past_deadline():  # this section compiles a second whole U-Net
        t = _timed(run_eval_bf16)
        results.append({"metric": "eval_tiles_per_sec_bf16w", "value": round(batch_eval / t, 2), "unit": "tiles/s"})

    # Production-best eval config: bf16-resident weights AND the larger
    # batch together. The components were answered separately (batch 32
    # amortization +10% in round 3, bf16w +6% in round 4 — docs/PROFILE.md);
    # this is the config a deployment would run, so it is the number the
    # record should carry.
    if not args.quick and not past_deadline():
        x_eval32 = jnp.asarray(rng.uniform(0, 100, (32, 4, 512, 512)), jnp.float32)

        def run_eval32():
            return fwd_bf16(v_bf16, x_eval32)

        t = _timed(run_eval32, pipeline=4)
        results.append({"metric": "eval_tiles_per_sec_bf16w_b32", "value": round(32 / t, 2), "unit": "tiles/s"})

    # ---- steady-state serving throughput (pipeline overlap, N granules) ---
    # Runs IMMEDIATELY after the eval section on purpose: measured in round
    # 5, the same serve flow records 1.5-1.6 scenes/s here but ~0.8 when run
    # after the granule/train/roofline sections (accumulated in-process
    # state roughly halves the recorded flagship number; isolated-process
    # and after-eval-only runs agree at ~1.5). Early placement also keeps
    # the serve record safe from the extras deadline.
    _mark("serve")
    if past_deadline():
        return results
    try:
        serve_res = _serve_throughput(model, variables, quick=args.quick)
        results.extend(serve_res)
    except Exception as e:  # noqa: BLE001 — optional h5py dependency
        print(f"serve bench skipped: {e}", file=_sys.stderr)

    # ---- raw granule -> plume mask, end to end (mag1c + renorm + U-Net) ---
    _mark("granule")
    if past_deadline():
        return results
    from starcop_tpu.data.emit import renormalize_emit_to_aviris
    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.ops.ch4_template import generate_template_from_bands
    from starcop_tpu.ops.mag1c import NODATA, mag1c_column_blocks

    centers = np.arange(2122.0, 2488.0, 7.4)
    template = generate_template_from_bands(centers, np.full_like(centers, 8.0))[:, 1]
    h_s, w_s = (640, 624) if args.quick else (1280, 1242)
    emit = synthetic_scene(np.random.default_rng(1), h_s, w_s, n_plumes=4, template=template)
    cube_d = jnp.asarray(emit["radiance"])
    rgb_d = np.moveaxis(emit["rgb"], -1, 0)
    tpl_d = jnp.asarray(template, jnp.float32)

    from starcop_tpu.scenes.emit_pipeline import emit_granule_to_mask

    rgb_dev = jnp.asarray(rgb_d)

    granule_fused = jax.jit(
        lambda c, r: emit_granule_to_mask(
            c, r, tpl_d, lambda b: model.apply(variables, b, train=False)
        )
    )

    def run_granule():
        pred, mf = granule_fused(cube_d, rgb_dev)
        return pred

    t = _timed(run_granule)
    results.append({"metric": "emit_granule_to_mask_ms", "value": round(t * 1e3, 1), "unit": "ms"})

    # ---- train steps/sec: batch 32 @ 128x128 ------------------------------
    _mark("train_f32")
    if past_deadline():
        return results
    bsz = 8 if args.quick else 32
    x_tr = jnp.asarray(rng.uniform(0, 100, (bsz, 4, 128, 128)), jnp.float32)
    batch = {
        "input": x_tr,
        "output": jnp.asarray((rng.uniform(size=(bsz, 1, 128, 128)) > 0.9).astype(np.float32)),
        "weight_loss": jnp.ones((bsz, 1, 128, 128), jnp.float32),
    }
    state, tx = create_train_state(model, jax.random.PRNGKey(0), x_tr[:1])
    train_step = make_train_step(model, tx)
    lr = jnp.asarray(1e-4, jnp.float32)

    state_holder = {"state": state}

    def run_train():
        new_state, loss = train_step(state_holder["state"], batch, lr)
        state_holder["state"] = new_state
        return loss  # real steps chain through the carried state

    t, t_med = _timed_stats(run_train)
    results.append({"metric": "train_steps_per_sec", "value": round(1.0 / t, 2),
                    "unit": f"steps/s (batch {bsz})"})
    results.append({"metric": "train_steps_per_sec_median", "value": round(1.0 / t_med, 2),
                    "unit": f"steps/s (batch {bsz})"})

    # ---- bf16 training steps/sec (the repo's best training config) --------
    _mark("train_bf16")
    if past_deadline():
        return results
    model_bf16 = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="unet_semseg",
        model_dtype=jnp.bfloat16,
    )
    state_bf16, tx_bf16 = create_train_state(model_bf16, jax.random.PRNGKey(0), x_tr[:1])
    train_step_bf16 = make_train_step(model_bf16, tx_bf16)
    holder_bf16 = {"state": state_bf16}

    def run_train_bf16():
        new_state, loss = train_step_bf16(holder_bf16["state"], batch, lr)
        holder_bf16["state"] = new_state
        return loss

    t, t_med = _timed_stats(run_train_bf16)
    results.append({"metric": "train_steps_per_sec_bf16", "value": round(1.0 / t, 2),
                    "unit": f"steps/s (batch {bsz})"})
    results.append({"metric": "train_steps_per_sec_bf16_median", "value": round(1.0 / t_med, 2),
                    "unit": f"steps/s (batch {bsz})"})

    # ---- matched-filter device-time / roofline accounting -----------------
    # (replaces the retired full_scene_mag1c_bf16_ms extra: bf16 streaming is
    # superseded by the VMEM-resident kernel — DESIGN.md §7.) Two pipeline
    # depths isolate device time from amortized dispatch RTT:
    #   t(d) = device + rtt/d  =>  device = (d2*t(d2) - d1*t(d1)) / (d2 - d1).
    _mark("mag1c_roofline")
    if past_deadline():
        return results
    import functools

    # Direct call (no outer jit wrapper): shares mag1c_column_blocks' own
    # jit cache with bench.py's headline and the synthetic_f1 probe below.
    mf_f32 = functools.partial(mag1c_column_blocks, column_step=54, num_iter=30, alpha=1e-4)

    def run_mf():
        mf, _ = mf_f32(cube_d, tpl_d, None)
        return mf

    # Validity guard: a benchmark of garbage is not a benchmark. bench.py's
    # oracle-agreement guard covers the driver flow; harness-only runs still
    # need at least a finiteness check on the timed output.
    mf_probe = np.asarray(run_mf())
    if not np.isfinite(mf_probe).all():
        raise RuntimeError("mag1c roofline: matched filter produced non-finite output")

    d1, d2 = 8, 32
    t1, _ = _timed_stats(run_mf, pipeline=d1)
    t2, _ = _timed_stats(run_mf, pipeline=d2, warm=False)
    dev_s = max((d2 * t2 - d1 * t1) / (d2 - d1), 1e-9)
    h_px, w_px = cube_d.shape[:2]
    s_bands = cube_d.shape[2]
    n_iter = 30
    # Useful work (not counting padding): the resident filter's per-iteration
    # body is 3 (S,P)-shaped matvec passes over every pixel, plus the init
    # pass's mean+covariance (S+1 fused passes).
    flops = 2.0 * h_px * w_px * s_bands * (3 * n_iter + (s_bands + 1))
    # HBM traffic: TWO f32 reads of the cube (init stats + resident filter —
    # the direct-swh path's design point) + mf/albedo outputs.
    hbm_bytes = 2.0 * h_px * w_px * s_bands * 4 + 2.0 * h_px * w_px * 4
    results.append({"metric": "mag1c_device_ms", "value": round(dev_s * 1e3, 2), "unit": "ms"})
    results.append({"metric": "mag1c_tflops", "value": round(flops / dev_s / 1e12, 2),
                    "unit": "TFLOP/s (useful)"})
    # v5e peaks: 394 TFLOP/s bf16 MXU, ~819 GB/s HBM. The kernel's dots are
    # (S~56)-deep matvecs — MXU tiles are 128x128, so the shape ceiling is
    # ~56/128 *1/128 of peak; %-of-peak is reported against the hardware
    # number to keep the record honest about headroom.
    results.append({"metric": "mag1c_pct_peak_bf16_mxu", "value": round(100 * flops / dev_s / 394e12, 3),
                    "unit": "% of 394 TFLOP/s"})
    results.append({"metric": "mag1c_hbm_gbps", "value": round(hbm_bytes / dev_s / 1e9, 1),
                    "unit": "GB/s (of ~819 peak)"})

    # ---- synthetic detection quality (validation-harness F1) --------------
    # A QUALITY metric alongside the agreement guard: the production filter
    # computes the eval set's mag1c on-device, then the real validation
    # harness sweeps mag1c-scaled thresholds — a kernel-numerics regression
    # moves this driver-visible F1, not just a mask-agreement ratio.
    # Runs at the PINNED-FIXTURE geometry (2 x 256x216 — the exact set
    # tests/test_data_train_eval.py::test_synthetic_detection_f1_pinned
    # bounds to [0.955, 0.985] / [0.94, 0.975]), so the driver record is
    # directly comparable to the committed band. Full-granule geometry was
    # measured at ~205 s of fresh validation-program compiles (r5), which
    # starved the sections after it; the canary's job is numerics, not
    # throughput, and the fixture geometry compiles in seconds. Ahead of
    # scene_fwd on purpose: the quality record must survive the extras
    # deadline; scene_fwd compiles two whole-scene U-Nets and is the
    # sacrificial tail.
    _mark("synthetic_f1")
    if past_deadline():
        return results
    try:
        from starcop_tpu.eval.synthetic_eval import synthetic_detection_f1

        sf1 = synthetic_detection_f1(n_tiles=2, height=256, width=216)
        results.append({"metric": "synthetic_f1", "value": sf1["synthetic_f1"],
                        "unit": "best-F1 (mag1c baseline, fixed synthetic eval set)"})
        results.append({"metric": "synthetic_f1_at_500", "value": sf1["synthetic_f1_at_500"],
                        "unit": "F1 at the 500 ppm*m operating point"})
    except Exception as e:  # noqa: BLE001 — quality probe must not break the bench
        print(f"synthetic_f1 skipped: {e}", file=_sys.stderr)

    # ---- whole-scene forward ----------------------------------------------
    _mark("scene_fwd")
    if past_deadline():
        return results
    from starcop_tpu.ops.padding import padded_apply

    scene = jnp.asarray(rng.uniform(0, 100, (4, 1280, 1242)), jnp.float32)

    @jax.jit
    def scene_fwd(s):
        return padded_apply(s, lambda b: model.apply(variables, b, train=False))

    def run_scene():
        return scene_fwd(scene)

    t = _timed(run_scene)
    results.append({"metric": "unet_scene_forward_ms", "value": round(t * 1e3, 1), "unit": "ms"})

    # bf16-resident-weights whole-scene forward (same config as
    # eval_tiles_per_sec_bf16w).
    if past_deadline():
        return results

    @jax.jit
    def scene_fwd_bf16(s):
        return padded_apply(s, lambda b: model_bf16w.apply(v_bf16, b, train=False))

    def run_scene_bf16():
        return scene_fwd_bf16(scene)

    t = _timed(run_scene_bf16)
    results.append({"metric": "unet_scene_forward_bf16w_ms", "value": round(t * 1e3, 1), "unit": "ms"})
    return results


def _competing_python_procs():
    """Count OTHER python processes on this host, and how many are runnable.

    Shared-host contention pre-flight (CLAUDE.md gotcha: concurrent python
    processes on the TPU tunnel serialize and inflate timings up to ~8x; the
    round-4 driver record's 285 ms write stage vs 19 ms uncontended was this).
    Reads /proc directly — no shelling out, no pattern-kill risk. Returns
    (n_python_other, n_runnable_other).
    """
    me = _os.getpid()
    n_py = n_run = 0
    for pid in _os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                stat = fh.read()
        except OSError:
            continue
        # comm rides in parens (may contain spaces); state follows it.
        lparen, rparen = stat.find("("), stat.rfind(")")
        comm = stat[lparen + 1 : rparen]
        state = stat[rparen + 2 : rparen + 3]
        if "python" in comm:
            n_py += 1
            if state == "R":
                n_run += 1
    return n_py, n_run


def _serve_throughput(model, variables, quick: bool = False, upload: str = "u10"):
    """Steady-state serving throughput: N synthetic EMIT granules (h5) through
    ``emit_serving_pipeline`` — read/compute/write stages overlapped, so this
    driver-verifies the serving runtime's overlap claim (VERDICT r2 #7).
    Reports scenes/s and Mpx/s over the whole batch (includes h5 read +
    GeoTIFF write, i.e. the number a deployment would see)."""
    import shutil
    import tempfile

    import h5py
    import jax
    import jax.numpy as jnp

    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.ops.ch4_template import generate_template_from_bands
    from starcop_tpu.serve.pipeline import emit_serving_pipeline

    n_scenes = 4 if quick else 8
    h_s, w_s = (320, 312) if quick else (640, 624)
    wl = np.arange(2100.0, 2490.0, 7.4)
    fwhm = np.full_like(wl, 8.5)
    swir = (wl >= 2122) & (wl <= 2488)
    template = generate_template_from_bands(wl[swir], fwhm[swir])[:, 1]

    tmp = tempfile.mkdtemp(prefix="starcop_serve_bench_")
    try:
        paths = []
        base = synthetic_scene(np.random.default_rng(0), h_s, w_s,
                               n_plumes=4, template=template)
        filler = np.random.default_rng(9).uniform(
            1, 8, size=(h_s, w_s, len(wl))
        ).astype(np.float32)
        for i in range(n_scenes):
            cube = filler.copy()
            cube[..., swir] = np.roll(base["radiance"], i, axis=1)
            path = _os.path.join(tmp, f"EMIT_bench_{i}.nc")
            with h5py.File(path, "w") as f:
                d = f.create_dataset("radiance", data=cube)
                d.attrs["_FillValue"] = [-9999.0]
                g = f.create_group("sensor_band_parameters")
                g.create_dataset("wavelengths", data=wl)
                g.create_dataset("fwhm", data=fwhm)
            paths.append(path)

        out_dir = _os.path.join(tmp, "out")
        # A packed-upload codec is the production config for this link: the
        # host->device upload is the dominant per-scene cost (measured ~25-30
        # MB/s tunnel; 80 MB f32 cube). Default u10 ships 31.25% of the f32
        # bytes at pinned detection fidelity (serve/pipeline.py docstring);
        # the upload IS the serve wall once writes went uncompressed, so the
        # last bits are the throughput (docs/PROFILE.md stage table).
        pipeline = emit_serving_pipeline(
            lambda x: model.apply(variables, x, train=False),
            out_dir,
            column_step=52 if quick else 54,
            num_iter=30,
            upload_dtype=upload,
        )
        # Contention pre-flight (VERDICT r4 #2): the host stages share CPUs
        # with whatever else runs on the build host, which measured up to
        # ~2.6x run-to-run swing (and a 15x write-stage inflation in the r4
        # driver record). Record the competing-process count so the official
        # BENCH line carries the contention context for its own numbers.
        n_py, n_run = _competing_python_procs()
        print(f"[serve] pre-flight: {n_py} other python procs "
              f"({n_run} runnable) on this host", file=_sys.stderr)

        pipeline.run(paths[:1])  # warm the fused program (compile outside timing)
        # Best + median of 7 timed passes: steady-state throughput is the
        # uncontended pass, the median rides along as the spread record
        # (shared-host scheduling noise makes single passes swing ~2x, and
        # 7 passes cost ~15 s more than 5 for a better uncontended shot).
        walls, stage_meds = [], []
        for _ in range(7):
            t0 = time.time()
            results = pipeline.run(paths)
            walls.append(time.time() - t0)
            ok = [r for r in results if r.error is None]
            if len(ok) != n_scenes:
                raise RuntimeError(f"{n_scenes - len(ok)} scenes failed")
            stage_meds.append({
                k: float(np.median([r.timings[k] for r in ok]))
                for k in ("read_s", "compute_s", "write_s")
            })
        wall = min(walls)
        stages = stage_meds[int(np.argmin(walls))]
        return [
            {"metric": "serve_competing_python_procs", "value": n_py,
             "unit": f"other python procs at pre-flight ({n_run} runnable); "
                     "contention inflates host stages up to ~2.6x"},
            {"metric": "serve_scenes_per_sec", "value": round(n_scenes / wall, 2),
             "unit": f"scenes/s ({h_s}x{w_s}, {upload} upload, incl. h5 read + tif write)"},
            {"metric": "serve_scenes_per_sec_median", "value": round(n_scenes / float(np.median(walls)), 2),
             "unit": "scenes/s"},
            {"metric": "serve_mpx_per_sec", "value": round(n_scenes * h_s * w_s / wall / 1e6, 1),
             "unit": "Mpx/s"},
            # Per-stage attribution (median over scenes, best pass): compute_s
            # includes waiting on the scene's own host->device upload — the
            # dominant stage on this link.
            {"metric": "serve_stage_read_ms", "value": round(stages["read_s"] * 1e3, 0), "unit": "ms"},
            {"metric": "serve_stage_upload_compute_ms", "value": round(stages["compute_s"] * 1e3, 0), "unit": "ms"},
            {"metric": "serve_stage_write_ms", "value": round(stages["write_s"] * 1e3, 0), "unit": "ms"},
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)
    for r in collect(quick=args.quick):
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    _sys.exit(main())

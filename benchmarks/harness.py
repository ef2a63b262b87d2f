"""Benchmark harness: the BASELINE.md target metrics beyond the headline.

    python benchmarks/harness.py [--quick]

Reports (JSON lines to stdout, one per metric):
  * emit_full_scene_mag1c_latency (s) — same as bench.py's headline;
  * eval_tiles_per_sec — 512x512 4-channel tiles/sec through the flagship
    U-Net forward (the reference's batch_size=1 run_validation hot loop,
    batched here);
  * train_steps_per_sec — batch-32 128x128 training steps/sec;
  * unet_scene_forward_ms — one reflect-padded whole-scene forward.

All timings force completion with a host-visible scalar (the remote TPU
tunnel's block_until_ready returns early).
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def _timed(fn, repeats=3):
    fn()  # warm
    times = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return float(np.median(times))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.train.loop import create_train_state, make_train_step

    results = []

    # ---- eval tiles/sec: 512x512 batched forward --------------------------
    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="unet_semseg",
    )
    rng = np.random.default_rng(0)
    batch_eval = 4 if args.quick else 8
    x_eval = jnp.asarray(rng.uniform(0, 100, (batch_eval, 4, 512, 512)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_eval[:1])

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def run_eval():
        return float(jnp.sum(fwd(variables, x_eval)))

    t = _timed(run_eval)
    results.append({"metric": "eval_tiles_per_sec", "value": round(batch_eval / t, 2), "unit": "tiles/s"})

    # ---- train steps/sec: batch 32 @ 128x128 ------------------------------
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
        return float(loss)

    t = _timed(run_train)
    results.append({"metric": "train_steps_per_sec", "value": round(1.0 / t, 2),
                    "unit": f"steps/s (batch {bsz})"})

    # ---- whole-scene forward ----------------------------------------------
    from starcop_tpu.ops.padding import padded_apply

    scene = jnp.asarray(rng.uniform(0, 100, (4, 1280, 1242)), jnp.float32)

    @jax.jit
    def scene_fwd(s):
        return padded_apply(s, lambda b: model.apply(variables, b, train=False))

    def run_scene():
        return float(jnp.sum(scene_fwd(scene)))

    t = _timed(run_scene)
    results.append({"metric": "unet_scene_forward_ms", "value": round(t * 1e3, 1), "unit": "ms"})

    for r in results:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    _sys.exit(main())

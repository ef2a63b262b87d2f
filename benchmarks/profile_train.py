"""Train/eval step-time attribution -> docs/PROFILE.md.

VERDICT r2 #2/#8: back the steps/s numbers with a committed breakdown.
Components are measured as separately-jitted programs with the same pipelined
timing as the harness (one host sync per chain — per-run syncs measure tunnel
RTT, see benchmarks/harness.py:_timed):

  * h2d_batch_ms     — host->device upload of one training batch;
  * fwd_ms           — loss forward only;
  * fwd_bwd_ms       — jax.value_and_grad (forward + backward);
  * full_step_ms     — the production train step (grads + optimizer + BN);

so bwd ~= fwd_bwd - fwd and opt/update ~= full_step - fwd_bwd. The residual
between steps/s and 1000/full_step_ms is host-side dispatch. Optionally
captures a jax.profiler trace (--trace DIR) for deeper inspection.

Run on the TPU: python benchmarks/profile_train.py [--quick] [--bf16]
[--trace DIR] [--write-doc]
"""

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from benchmarks.harness import _timed


def profile(bf16: bool = False, quick: bool = False, trace_dir: str = None):
    import jax
    import jax.numpy as jnp

    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.train.loop import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    bsz = 8 if quick else 32
    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="unet_semseg",
        model_dtype=jnp.bfloat16 if bf16 else None,
    )
    x_np = rng.uniform(0, 100, (bsz, 4, 128, 128)).astype(np.float32)
    batch_np = {
        "input": x_np,
        "output": (rng.uniform(size=(bsz, 1, 128, 128)) > 0.9).astype(np.float32),
        "weight_loss": np.ones((bsz, 1, 128, 128), np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch["input"][:1])
    train_step = make_train_step(model, tx)
    lr = jnp.asarray(1e-4, jnp.float32)

    out = {}

    # h2d upload (per batch; ~3.1 MB input + 2x 0.8 MB aux)
    def run_upload():
        return jax.device_put(x_np)

    out["h2d_batch_ms"] = _timed(run_upload) * 1e3

    # forward only — the production train-mode loss graph without grads
    # (mirrors make_train_step's loss_fn so the derived bwd cost is real).
    dropout_rng = jax.random.PRNGKey(0)

    def loss_value(params, b):
        variables = {"params": params, "batch_stats": state.batch_stats}
        logits, _updates = model.apply(
            variables, b["input"], train=True, rngs={"dropout": dropout_rng}
        )
        return model.loss_fn(logits, b["output"], b.get("weight_loss"))

    fwd = jax.jit(loss_value)

    def run_fwd():
        return fwd(state.params, batch)

    out["fwd_ms"] = _timed(run_fwd) * 1e3

    # forward + backward
    grad_fn = jax.jit(jax.value_and_grad(loss_value))

    def run_fwd_bwd():
        loss, grads = grad_fn(state.params, batch)
        return loss

    out["fwd_bwd_ms"] = _timed(run_fwd_bwd) * 1e3

    # full production step (grads + optimizer + batch-stats update)
    holder = {"state": state}

    def run_step():
        new_state, loss = train_step(holder["state"], batch, lr)
        holder["state"] = new_state
        return loss

    if trace_dir:
        import jax.profiler

        float(jnp.sum(run_step()))  # warm
        with jax.profiler.trace(trace_dir):
            for _ in range(8):
                s = run_step()
            float(jnp.sum(s))
    out["full_step_ms"] = _timed(run_step) * 1e3
    out["steps_per_sec"] = 1e3 / out["full_step_ms"]
    out["batch"] = bsz
    return out


def render_doc(f32, bf16):
    lines = [
        "# Train-step time attribution (TPU v5e, batch 32, 128x128, MobileNetV2-UNet)",
        "",
        "Measured by `benchmarks/profile_train.py` (pipelined timing, one host",
        "sync per chain — see `benchmarks/harness.py:_timed`). Components are",
        "separately-jitted programs; `bwd ~= fwd_bwd - fwd`,",
        "`opt+BN ~= full_step - fwd_bwd`, residual = host dispatch.",
        "",
        "| component | f32 (ms) | bf16 (ms) |",
        "|---|---|---|",
    ]

    def row(name, key):
        return f"| {name} | {f32[key]:.2f} | {bf16[key]:.2f} |"

    lines += [
        row("h2d upload (off the step's critical path; overlapped by the loader)", "h2d_batch_ms"),
        row("forward", "fwd_ms"),
        row("forward + backward", "fwd_bwd_ms"),
        f"| backward (derived) | {f32['fwd_bwd_ms'] - f32['fwd_ms']:.2f} | {bf16['fwd_bwd_ms'] - bf16['fwd_ms']:.2f} |",
        row("full step (grads + opt + BN)", "full_step_ms"),
        f"| opt + BN update (derived) | {f32['full_step_ms'] - f32['fwd_bwd_ms']:.2f} | {bf16['full_step_ms'] - bf16['fwd_bwd_ms']:.2f} |",
        f"| **steps/s** | **{f32['steps_per_sec']:.1f}** | **{bf16['steps_per_sec']:.1f}** |",
        "",
    ]
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--trace", default=None, help="jax.profiler trace output dir")
    p.add_argument("--write-doc", action="store_true",
                   help="render docs/PROFILE.md from f32 + bf16 runs")
    args = p.parse_args(argv)

    f32 = profile(bf16=False, quick=args.quick, trace_dir=args.trace)
    print({k: round(v, 2) for k, v in f32.items()})
    bf16 = profile(bf16=True, quick=args.quick)
    print({k: round(v, 2) for k, v in bf16.items()})
    if args.write_doc:
        doc = render_doc(f32, bf16)
        path = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "docs", "PROFILE.md",
        )
        with open(path, "w") as fh:
            fh.write(doc)
        print(f"wrote {path}", file=_sys.stderr)
    return 0


if __name__ == "__main__":
    _sys.exit(main())

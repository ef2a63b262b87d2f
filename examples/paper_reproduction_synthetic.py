"""Reproduce the paper's claim shape on synthetic data: the learned
HyperSTARCOP model (mag1c + RGB U-Net) beats the classical matched-filter
baseline on F1 / FPR.

The reference's headline numbers (README.md:37: >+25% F1 over the mag1c
baseline, -41.8% FPR) come from real AVIRIS data; this script demonstrates the
same comparison machinery end-to-end hermetically: real matched-filter chips
(30-iteration acrwl1mf over synthetic radiance), HyperSTARCOP training, and
the run_validation harness scoring both the model and Mag1cBaseline.

    python examples/paper_reproduction_synthetic.py [out_dir]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import tempfile

import jax
import numpy as np

PRODUCTS = ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"]


def main(out_dir=None, n_train=12, n_test=6, epochs=12):
    from starcop_tpu.data.datamodule import DataModule
    from starcop_tpu.data.synthetic import write_synthetic_chip_dataset
    from starcop_tpu.eval.validation import run_validation
    from starcop_tpu.models import Mag1cBaseline, SegmentationModel
    from starcop_tpu.train import Trainer

    out_dir = out_dir or tempfile.mkdtemp(prefix="starcop_paper")
    rng = np.random.default_rng(0)
    train_dir, test_dir = os.path.join(out_dir, "train"), os.path.join(out_dir, "test")
    print("generating chips (real matched filter)...")
    write_synthetic_chip_dataset(train_dir, rng, n_tiles=n_train, size=256,
                                 run_matched_filter=True, max_confounders=3)
    write_synthetic_chip_dataset(test_dir, np.random.default_rng(1), n_tiles=n_test, size=256,
                                 run_matched_filter=True, max_confounders=3)

    dm = DataModule(
        os.path.join(train_dir, "index.csv"),
        os.path.join(test_dir, "index.csv"),
        input_products=PRODUCTS,
        batch_size=16,
        num_workers=2,
    )

    model = SegmentationModel(PRODUCTS, model_type="unet_semseg", pos_weight=1.0)
    trainer = Trainer(model, learning_rate=1e-3, max_epochs=epochs, val_check_interval=1.0)
    print("training HyperSTARCOP...")
    state = trainer.fit(
        lambda: dm.train_loader(),
        lambda: dm.test_loader(batch_size=8),
        rng=jax.random.PRNGKey(0),
    )

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print("validating model...")
    _, m_model = run_validation(
        lambda b: model.batch_with_preds(variables, b),
        iter(dm.test_loader()),
        path_save_results=os.path.join(out_dir, "val_model"),
    )
    print("validating mag1c baseline...")
    baseline = Mag1cBaseline(PRODUCTS)
    _, m_base = run_validation(
        baseline.batch_with_preds,
        iter(dm.test_loader()),
        apply_threshold=baseline.apply_threshold,
        path_save_results=os.path.join(out_dir, "val_baseline"),
    )

    summary = {
        "model": {k: m_model[k] for k in ("f1score", "precision", "recall", "FPR_no_plume", "classification_f1score") if k in m_model},
        "baseline": {k: m_base[k] for k in ("f1score", "precision", "recall", "FPR_no_plume", "classification_f1score") if k in m_base},
    }
    if m_base.get("f1score"):
        summary["f1_gain_pct"] = 100 * (m_model["f1score"] - m_base["f1score"]) / m_base["f1score"]
    print(json.dumps(summary, indent=2))
    with open(os.path.join(out_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    return summary


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

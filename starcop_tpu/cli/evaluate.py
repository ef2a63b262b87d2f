"""Standalone evaluation CLI: checkpoint + index CSV -> validation artifacts.

    python -m starcop_tpu.cli.evaluate --checkpoint exp/best.npz \
        --test-csv /data/chips/test.csv [--baseline mag1c|varon|sanchez]

Runs the full validation harness (threshold sweep, difficulty split,
results.csv / results_agg.json) for a trained model or a classical baseline.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test-csv", required=True)
    p.add_argument("--checkpoint", default=None, help=".npz/.ckpt weights (omit for baselines)")
    p.add_argument("--baseline", default=None, choices=["mag1c", "varon", "sanchez"])
    p.add_argument("--input-products", nargs="+", default=[
        "mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"])
    p.add_argument("--model-type", default="unet_semseg")
    p.add_argument("--pos-weight", type=float, default=1.0)
    p.add_argument("--output", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args(argv)

    from starcop_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from starcop_tpu.data.datamodule import BatchLoader, prefetch_to_device
    from starcop_tpu.data.dataset import ChipDataset, read_index_csv
    from starcop_tpu.eval.validation import run_validation

    rows = read_index_csv(args.test_csv)
    ds = ChipDataset(rows, args.input_products, ["labelbinary"], "weight_mag1c")
    loader = BatchLoader(ds, batch_size=args.batch_size)

    apply_threshold = None
    if args.baseline:
        from starcop_tpu.models import Mag1cBaseline, SanchezBaseline, VaronBaseline

        bl = {
            "mag1c": Mag1cBaseline,
            "varon": VaronBaseline,
            "sanchez": SanchezBaseline,
        }[args.baseline](args.input_products)
        bwp = bl.batch_with_preds
        apply_threshold = bl.apply_threshold
    else:
        if not args.checkpoint:
            p.error("Provide --checkpoint or --baseline")
        import jax

        from starcop_tpu.models import SegmentationModel
        from starcop_tpu.setup_shims import load_pretrained_variables

        model = SegmentationModel(
            args.input_products, model_type=args.model_type, pos_weight=args.pos_weight
        )
        variables = load_pretrained_variables(args.checkpoint)
        bwp = lambda b: model.batch_with_preds(variables, b)  # noqa: E731

    # Double-buffered host->device prefetch: the chip reads + transfer of the
    # next batch overlap the current batch's forward + CM program.
    rows_out, metrics = run_validation(
        bwp,
        prefetch_to_device(iter(loader)),
        apply_threshold=apply_threshold,
        path_save_results=args.output,
    )
    print(json.dumps({k: metrics[k] for k in ("f1score", "precision", "recall",
                                              "classification_f1score") if k in metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

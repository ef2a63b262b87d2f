"""Model demo (reference notebooks/model_demos_AVIRIS.ipynb as a script).

Generates a synthetic chip dataset, loads/initializes the flagship model,
runs batch_with_preds over the test loader, renders the plot grids, and runs
the full validation harness. Swap the synthetic dataset for a real chip index
CSV and a ported checkpoint for the real workflow.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import tempfile

import jax
import numpy as np

from starcop_tpu.data.datamodule import DataModule
from starcop_tpu.data.synthetic import write_synthetic_chip_dataset
from starcop_tpu.eval.plot import plot_batch
from starcop_tpu.eval.validation import run_validation
from starcop_tpu.models import SegmentationModel

PRODUCTS = ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"]


def main(checkpoint: str = None, out_dir: str = None):
    out_dir = out_dir or tempfile.mkdtemp(prefix="starcop_demo")
    data_dir = os.path.join(out_dir, "chips")
    write_synthetic_chip_dataset(data_dir, np.random.default_rng(0), n_tiles=4, size=256)
    index = os.path.join(data_dir, "index.csv")

    dm = DataModule(index, index, input_products=PRODUCTS)
    model = SegmentationModel(PRODUCTS, model_type="unet_semseg", pos_weight=1.0)

    if checkpoint:
        from starcop_tpu.setup_shims import load_pretrained_variables

        variables = load_pretrained_variables(checkpoint)
    else:
        first = next(iter(dm.test_loader(batch_size=2)))
        variables = model.init(jax.random.PRNGKey(0), jax.numpy.asarray(first["input"]))

    def bwp(batch):
        return model.batch_with_preds(variables, batch)

    # Plot grid for one batch (reference plot_batch protocol).
    batch = bwp(next(iter(dm.test_loader(batch_size=2))))
    fig = plot_batch(batch, PRODUCTS, ["rgb_aviris", "mag1c", "label", "pred", "differences"])
    fig.savefig(os.path.join(out_dir, "demo_grid.png"), dpi=80)

    rows, metrics = run_validation(
        bwp, iter(dm.test_loader()), path_save_results=os.path.join(out_dir, "validation")
    )
    print(f"tiles: {len(rows)}  F1: {metrics['f1score']:.4f}  "
          f"classification F1: {metrics['classification_f1score']:.4f}")
    print(f"artifacts in {out_dir}")


if __name__ == "__main__":
    main(checkpoint=sys.argv[1] if len(sys.argv) > 1 else None)

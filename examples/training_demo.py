"""Training demo (reference notebooks/(bonus)_training_demo.ipynb):
a short end-to-end training run on a small synthetic dataset.

    python examples/training_demo.py [epochs]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import tempfile

import numpy as np

from starcop_tpu.cli.train import main as train_main
from starcop_tpu.data.synthetic import write_synthetic_chip_dataset


def main(epochs: int = 2):
    root = tempfile.mkdtemp(prefix="starcop_train_demo")
    write_synthetic_chip_dataset(root, np.random.default_rng(0), n_tiles=6, size=256)
    return train_main(
        [
            f"dataset.root_folder={root}",
            "dataset.train_csv=index.csv",
            "dataset.test_csv=index.csv",
            "experiment_name=training_demo",
            f"training.max_epochs={epochs}",
            "dataloader.batch_size=8",
            "dataloader.num_workers=2",
            "model.lr=0.001",
            "training.val_check_interval=1.0",
        ]
    )


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 2))

"""Training CLI.

Re-design of the reference training entry point
(/root/reference/scripts/train.py:23-170) with the same override style:

    python -m starcop_tpu.cli.train dataset.root_folder=/data model.lr=1e-4 ...

Flow: config + overrides -> experiment dir -> datamodule -> model -> Trainer
(plateau LR, early stopping, best checkpoint) -> final checkpoint ->
run_validation on test and on non-tiled train, writing results.csv /
results_agg.json per split.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import numpy as np


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    logger = logging.getLogger("starcop_tpu.cli.train")
    argv = sys.argv[1:] if argv is None else argv

    from starcop_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from starcop_tpu.config import Config

    cfg = Config()
    yaml_args = [a for a in argv if a.endswith((".yaml", ".yml"))]
    overrides = [a for a in argv if "=" in a]
    if yaml_args:
        cfg = Config.from_yaml(yaml_args[0])
    cfg.apply_overrides(overrides)

    timestamp = time.strftime("%Y-%m-%d_%H-%M")
    exp_dir = os.path.join("experiments", cfg.experiment_name, timestamp)
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "config.json"), "w") as fh:
        fh.write(cfg.to_json())
    logger.info("experiment dir: %s", exp_dir)

    import jax

    from starcop_tpu.data.datamodule import DataModule
    from starcop_tpu.eval.validation import run_validation
    from starcop_tpu.train import Trainer, save_checkpoint

    np.random.seed(cfg.seed)

    root = cfg.dataset.root_folder
    dm = DataModule(
        train_csv=os.path.join(root, cfg.dataset.train_csv),
        test_csv=os.path.join(root, cfg.dataset.test_csv) if cfg.dataset.test_csv else None,
        input_products=cfg.dataset.input_products,
        output_products=cfg.dataset.output_products,
        weight_loss_product=cfg.dataset.weight_loss if cfg.dataset.use_weight_loss else None,
        training_size=cfg.dataset.training_size[0],
        training_overlap=cfg.dataset.training_size_overlap[0],
        batch_size=cfg.dataloader.batch_size,
        weight_sampling=cfg.dataset.weight_sampling,
        num_workers=cfg.dataloader.num_workers,
        seed=cfg.seed,
    )

    from starcop_tpu.setup_shims import get_model

    model = get_model(cfg)

    from starcop_tpu.train.logging import make_logger

    metric_logger = make_logger(
        exp_dir, wandb_project=cfg.wandb.project if cfg.wandb.entity else "",
        wandb_entity=cfg.wandb.entity, config=cfg.to_dict(),
    )

    callbacks = []
    if cfg.wandb.images_logging and cfg.products_plot:
        # Epoch-end image grids on one fixed test batch (reference ImageLogger).
        from starcop_tpu.eval.plot import ImageLogger

        try:
            fixed_batch = next(iter(dm.test_loader(batch_size=min(cfg.plot_samples, 8))))
            callbacks.append(
                ImageLogger(model, fixed_batch, cfg.dataset.input_products,
                            cfg.products_plot, os.path.join(exp_dir, "images"))
            )
        except StopIteration:
            pass

    trainer = Trainer(
        model,
        learning_rate=cfg.model.lr,
        lr_decay=cfg.model.lr_decay,
        lr_patience=cfg.model.lr_patience,
        early_stopping_patience=cfg.model.early_stopping_patience,
        max_epochs=cfg.training.max_epochs,
        val_check_interval=cfg.training.val_check_interval,
        n_devices=cfg.training.devices if cfg.training.devices > 0 else None,
        checkpoint_dir=exp_dir,
        log_every_n_steps=cfg.training.train_log_every_n_steps,
        metric_logger=metric_logger,
        callbacks=callbacks,
    )

    state = None
    if cfg.model.train:
        resume_path = None
        if cfg.resume_from_checkpoint:
            # resume from the newest best/final checkpoint under experiments/{name}
            import glob

            candidates = sorted(
                glob.glob(os.path.join("experiments", cfg.experiment_name, "*", "*.npz"))
            )
            if candidates:
                resume_path = candidates[-1]
                logger.info("resuming from %s", resume_path)
        state = trainer.fit(
            lambda: dm.train_loader(),
            lambda: dm.test_loader(batch_size=cfg.dataloader.batch_size),
            rng=jax.random.PRNGKey(cfg.seed),
            resume_from=resume_path,
        )
        save_checkpoint(exp_dir, state, name="final_checkpoint_model", extra={"config": cfg.to_dict()})
        with open(os.path.join(exp_dir, "history.json"), "w") as fh:
            json.dump(trainer.history, fh, indent=2)

    if cfg.model.test and state is not None:
        from starcop_tpu.data.datamodule import prefetch_to_device

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        _, metrics = run_validation(
            lambda b: model.batch_with_preds(variables, b),
            prefetch_to_device(iter(dm.test_loader())),
            path_save_results=os.path.join(exp_dir, "test"),
        )
        logger.info("test F1 %.4f", metrics.get("f1score", float("nan")))

        # Reference also validates on the non-tiled train split (train.py:152-164).
        from starcop_tpu.data.datamodule import BatchLoader
        from starcop_tpu.data.dataset import ChipDataset

        train_full = ChipDataset(
            dm.train_rows, dm.input_products, dm.output_products, dm.weight_loss_product
        )
        _, metrics_train = run_validation(
            lambda b: model.batch_with_preds(variables, b),
            prefetch_to_device(iter(BatchLoader(train_full, batch_size=1))),
            path_save_results=os.path.join(exp_dir, "train"),
        )
        logger.info("train F1 %.4f", metrics_train.get("f1score", float("nan")))

    if cfg.upload_path:
        # Best-effort artifact upload through the storage seam (the reference
        # wraps its gs:// upload in a broad try/except — train.py:146-150).
        from starcop_tpu.utils import storage

        try:
            dest = os.path.join(cfg.upload_path, cfg.experiment_name, timestamp)
            storage.put(exp_dir, dest, recursive=True)
            logger.info("uploaded experiment artifacts to %s", dest)
        except Exception as e:  # noqa: BLE001 — upload failure must not fail the run
            logger.warning("artifact upload failed: %s", e)
    return 0


if __name__ == "__main__":
    sys.exit(main())

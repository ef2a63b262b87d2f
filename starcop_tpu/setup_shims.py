"""Setup shims: config -> datamodule / model construction.

Parity with the reference's tiny glue modules
(/root/reference/starcop/dataset_setup.py:3-7, model_setup.py:5-20):
``get_dataset(cfg)`` builds the DataModule; ``get_model(cfg, name)`` builds
the segmentation or regression wrapper and optionally loads pretrained weights
from ``model.model_folder/{name}``.
"""

from __future__ import annotations

import os
from typing import Optional, Union

from starcop_tpu.config import Config


def get_dataset(cfg: Config):
    from starcop_tpu.data.datamodule import DataModule
    from starcop_tpu.data.features import configure_learned_ratio_from_config

    # Wire the learned-ratio product's regression checkpoint from the config
    # (reference loads its pretrained model lazily inside the product fn —
    # feature_extration.py:127-147; here the path comes from the config and
    # the lazy load lives in data/features.py).
    configure_learned_ratio_from_config(cfg)

    root = cfg.dataset.root_folder
    return DataModule(
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


def get_model(cfg: Config, name: Optional[str] = None):
    """Build the model wrapper for cfg.model.model_mode; if ``name`` is given
    and ``model.model_folder`` is set, also load + return pretrained variables:
    (model, variables) instead of model."""
    if cfg.model.model_mode == "segmentation_output":
        from starcop_tpu.models import SegmentationModel

        model = SegmentationModel(
            cfg.dataset.input_products,
            cfg.dataset.output_products,
            model_type=cfg.model.model_type,
            num_classes=cfg.model.num_classes,
            pos_weight=cfg.model.pos_weight,
            use_weight_loss=cfg.dataset.use_weight_loss,
            loss_name=cfg.model.loss,
            model_dtype=cfg.model.resolve_dtype(),
            encoder_weights=(
                None
                if cfg.model.encoder_weights in ("none", "")
                else cfg.model.encoder_weights
            ),
        )
    elif cfg.model.model_mode == "regression_output":
        from starcop_tpu.models.regression import RegressionModel

        model = RegressionModel(
            cfg.dataset.input_products,
            cfg.dataset.output_products,
            model_type=cfg.model.model_type,
            num_outputs=cfg.model.num_classes,
            loss_name=cfg.model.loss,
        )
    else:
        raise ValueError(f"Unknown model_mode: {cfg.model.model_mode}")

    if name and cfg.model.model_folder:
        variables = load_pretrained_variables(os.path.join(cfg.model.model_folder, name))
        return model, variables
    return model


def load_pretrained_variables(folder_or_file: str):
    """Load model variables from a torch checkpoint (.ckpt/.pt — ported via
    torch_port) or a framework npz checkpoint."""
    path = folder_or_file
    if os.path.isdir(path):
        for candidate in ("final_checkpoint_model.ckpt", "model.pt", "best.npz", "final_checkpoint_model.npz"):
            p = os.path.join(path, candidate)
            if os.path.exists(p):
                path = p
                break
    if path.endswith((".ckpt", ".pt")):
        from starcop_tpu.models.torch_port import load_torch_checkpoint, port_smp_mobilenetv2_unet

        return port_smp_mobilenetv2_unet(load_torch_checkpoint(path))
    if path.endswith(".npz"):
        import numpy as np

        with np.load(path) as data:
            flat = {k: data[k] for k in data.files}
        params: dict = {}
        stats: dict = {}
        for key, arr in flat.items():
            if key == "step" or key.startswith("opt_state/"):
                continue
            target = params if key.startswith("params/") else stats if key.startswith("batch_stats/") else None
            if target is None:
                continue
            parts = key.split("/")[1:]
            node = target
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
        out = {"params": params}
        if stats:
            out["batch_stats"] = stats
        return out
    raise ValueError(f"Pretrained weights not found at: {folder_or_file}")

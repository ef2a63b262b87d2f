"""Zero-shot EMIT inference CLI: raw .nc granule -> plume probability mask.

The notebook pipeline (inference_on_raw_EMIT_nc_file.ipynb) as a command:

    python -m starcop_tpu.cli.infer_emit EMIT_L1B_RAD_xxx.nc \
        --checkpoint model.ckpt --output out_dir [--georeference]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("granule", help="EMIT L1B radiance .nc file")
    p.add_argument("--checkpoint", required=True, help=".ckpt/.pt (torch, ported) or .npz weights")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--column-step", type=int, default=32)
    p.add_argument("--num-iter", type=int, default=30)
    p.add_argument("--georeference", action="store_true")
    p.add_argument("--model-dtype", choices=("bf16", "f32"), default="bf16",
                   help="bf16 = bf16-RESIDENT U-Net weights (variables cast "
                        "once at load; detection equivalence vs f32 pinned by "
                        "tests/test_models.py)")
    args = p.parse_args(argv)

    from starcop_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import jax.numpy as jnp

    from starcop_tpu.data.emit import EMITRawScene
    from starcop_tpu.models import SegmentationModel, cast_variables_for_inference
    from starcop_tpu.scenes.emit_pipeline import emit_inference
    from starcop_tpu.setup_shims import load_pretrained_variables
    from starcop_tpu.utils.profiling import StageTimer

    # bf16-resident weights are the default inference config (cast once at
    # load; detection equivalence vs f32 pinned by tests/test_models.py).
    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="unet_semseg",
        model_dtype=jnp.bfloat16 if args.model_dtype == "bf16" else None,
    )
    variables = load_pretrained_variables(args.checkpoint)
    if args.model_dtype == "bf16":
        variables = cast_variables_for_inference(variables)

    timer = StageTimer()
    with timer.stage("total"):
        scene = EMITRawScene(args.granule)
        transform, crs_epsg = scene.transform, scene.crs_epsg
        out = emit_inference(
            scene,
            lambda x: model.apply(variables, x, train=False),
            column_step=args.column_step,
            num_iter=args.num_iter,
            georeference=args.georeference,
        )
        scene.close()

    from starcop_tpu.data.geotiff import write_geotiff

    os.makedirs(args.output, exist_ok=True)
    for name, arr in out.items():
        # The granule transform describes the GLT-mapped (ortho) grid; only
        # georeferenced products carry it (reference notebook cells 22-24).
        on_ortho_grid = name.endswith("_geo")
        write_geotiff(
            os.path.join(args.output, f"{name}.tif"),
            np.asarray(arr, np.float32),
            transform=transform if on_ortho_grid else None,
            crs_epsg=crs_epsg if on_ortho_grid else None,
            descriptions=["CH4 Absorption (ppm x m)" if "mag1c" in name else name],
        )
    times = timer.report(log=False)
    print(f"EMIT inference {os.path.basename(args.granule)}: {times['total']:.2f}s; "
          f"pred mean {float(out['prediction'].mean()):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

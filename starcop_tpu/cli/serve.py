"""Batch serving CLI: process a directory/queue of EMIT granules.

    python -m starcop_tpu.cli.serve --granules-dir /data/emit \
        --checkpoint model.npz --output /data/out [--watch 30]

Runs the three-stage pipelined runtime (host read | device compute | host
write) so the TPU never waits on IO. ``--watch N`` polls the directory every N
seconds and processes new granules as they land (a minimal production loop).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--granules-dir", required=True)
    p.add_argument("--pattern", default="*.nc")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--column-step", type=int, default=32)
    p.add_argument("--num-iter", type=int, default=30)
    p.add_argument("--georeference", action="store_true")
    p.add_argument("--watch", type=int, default=0, help="poll interval seconds (0 = one pass)")
    p.add_argument("--bf16-stream", action="store_true",
                   help="bf16 matched-filter streaming (~15%% faster scenes; "
                        "detection fidelity pinned by tests/test_mag1c.py)")
    p.add_argument("--upload", choices=("f32", "u12", "u10", "u16", "bf16"), default="f32",
                   help="radiance upload codec: u12 = per-band affine 12-bit "
                        "packed 2-per-3-bytes (37.5%% of f32 bytes — the "
                        "recommended production config on bandwidth-limited "
                        "links, u16-grade error, fidelity pinned by "
                        "tests/test_serve.py), u10 = 10-bit pixel quads "
                        "packed 4-per-5-bytes (31.25%% of f32 bytes, one "
                        "less bit of headroom — for links where the upload "
                        "is the measured wall), u16 = per-band affine "
                        "quantization, bf16 = plain rounding — both halve the "
                        "per-scene host->device bytes. bf16 trades ~1%% "
                        "borderline-pixel flips for zero host-side "
                        "quantization work")
    p.add_argument("--download", choices=("f16", "f32"), default="f16",
                   help="result download wire format: f16 (default) ships "
                        "(prediction, mag1c) as ONE stacked half-precision "
                        "transfer (<= 2^-11 relative error, NODATA restored "
                        "exactly; pinned by tests/test_serve.py), f32 = "
                        "bit-exact results, double the download bytes")
    p.add_argument("--model-dtype", choices=("bf16", "f32"), default="bf16",
                   help="bf16 = bf16-RESIDENT U-Net weights (variables cast "
                        "once at load; whole-scene forward 15.7 -> 14.5 ms, "
                        "detection equivalence pinned by tests/test_models.py)")
    p.add_argument("--devices", type=int, default=1,
                   help="serve scenes round-robin across N chips (scene-level "
                        "data parallelism; linear scaling, zero collectives)")
    p.add_argument("--compress-outputs", type=int, default=0, metavar="LEVEL",
                   choices=range(0, 10),
                   help="DEFLATE level (1-9) for the output GeoTIFFs; default "
                        "0 = uncompressed. f32 plume rasters are mostly "
                        "zlib-incompressible, so level 6 costs ~400 ms/scene "
                        "of writer CPU for ~10-40%% size — compress offline "
                        "if archiving")
    args = p.parse_args(argv)

    from starcop_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp

    from starcop_tpu.models import SegmentationModel, cast_variables_for_inference
    from starcop_tpu.serve.pipeline import emit_serving_pipeline
    from starcop_tpu.setup_shims import load_pretrained_variables

    # bf16-resident weights are the default serving config (cast once at
    # load; detection equivalence vs f32 pinned by tests/test_models.py).
    model = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="unet_semseg",
        model_dtype=jnp.bfloat16 if args.model_dtype == "bf16" else None,
    )
    variables = load_pretrained_variables(args.checkpoint)
    if args.model_dtype == "bf16":
        variables = cast_variables_for_inference(variables)

    pipeline = emit_serving_pipeline(
        lambda x: model.apply(variables, x, train=False),
        args.output,
        column_step=args.column_step,
        num_iter=args.num_iter,
        georeference=args.georeference,
        stream_dtype=jnp.bfloat16 if args.bf16_stream else None,
        devices=jax.devices()[: args.devices] if args.devices > 1 else None,
        upload_dtype={"f32": None, "u12": "u12", "u10": "u10",
                      "u16": jnp.uint16, "bf16": jnp.bfloat16}[args.upload],
        download_dtype={"f16": "f16", "f32": None}[args.download],
        compress_outputs=args.compress_outputs,
    )

    processed = set()

    def pending():
        files = sorted(glob.glob(os.path.join(args.granules_dir, args.pattern)))
        return [f for f in files if f not in processed]

    while True:
        batch = pending()
        if batch:
            results = pipeline.run(batch)
            for r in results:
                status = "ERROR " + r.error if r.error else (
                    f"ok read {r.timings.get('read_s', 0):.2f}s "
                    f"compute {r.timings.get('compute_s', 0):.2f}s "
                    f"write {r.timings.get('write_s', 0):.2f}s"
                )
                print(f"{os.path.basename(r.name)}: {status}")
            processed.update(batch)
        if not args.watch:
            return 0
        time.sleep(args.watch)


if __name__ == "__main__":
    sys.exit(main())

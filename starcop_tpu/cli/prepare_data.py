"""Dataset production CLI: scenes -> matched filter -> sensor sims -> chips.

Re-design of the reference end-to-end prep sweep
(/root/reference/scripts/preprocessing/starcop_aviris_data_prep.py:1-232):
for each scene — matched filter, S2A/S2B/WV3 simulation, window statistics,
negative mining, chip caching — skipping existing outputs (idempotent).

The network-ingest stage (AVIRIS FTP download, JPL page scraping —
process_aviris.py:244-312, process_data_jpl_4corners.py) is environment-gated:
this command consumes scenes already on disk as .npy cubes (or ENVI via the
native reader); `--synthetic N` generates N synthetic scenes instead so the
full pipeline is runnable hermetically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def process_scene(scene_dir: str, name: str, cube: np.ndarray, wavelengths, fwhm,
                  label_rgba=None, column_step: int = 32,
                  transform=None, crs_epsg=None) -> dict:
    """Matched filter + sensor sims for one scene; writes {scene_dir}/{product}.tif
    GeoTIFFs with the scene transform/CRS and wavelength tags (reference
    run_mag1c COG outputs, process_aviris.py:224-241)."""
    import jax.numpy as jnp

    from starcop_tpu.data import sensors
    from starcop_tpu.data.geotiff import write_geotiff
    from starcop_tpu.ops.ch4_template import generate_template_from_bands, get_mask_bad_bands
    from starcop_tpu.ops.mag1c import mag1c_column_blocks

    os.makedirs(scene_dir, exist_ok=True)
    outputs = {}
    geo = {"transform": transform, "crs_epsg": crs_epsg}

    mf_path = os.path.join(scene_dir, "mag1c.tif")
    if not os.path.exists(mf_path):
        keep = get_mask_bad_bands(wavelengths)
        keep &= (wavelengths >= 2122) & (wavelengths <= 2488)
        template = generate_template_from_bands(wavelengths[keep], fwhm[keep])[:, 1]
        mf, albedo = mag1c_column_blocks(
            jnp.asarray(cube[..., keep], jnp.float32), jnp.asarray(template), None,
            column_step=column_step, num_iter=30, alpha=1e-4,
        )
        wave_tag = ",".join(f"{w:.1f}" for w in np.asarray(wavelengths)[keep])
        write_geotiff(mf_path, np.asarray(mf, np.float32), nodata=-9999.0,
                      tags={"wavelengths": wave_tag, "mag1c": "acfwl1mf"},
                      descriptions=["CH4 Absorption (ppm x m)"], **geo)
        write_geotiff(os.path.join(scene_dir, "albedo.tif"),
                      np.asarray(albedo, np.float32), nodata=-9999.0,
                      tags={"wavelengths": wave_tag, "mag1c": "acfwl1mf"},
                      descriptions=["Albedo"], **geo)
    outputs["mag1c"] = mf_path

    wv3_bands = sensors.covered_bands(wavelengths, sensors.WV3_SWIR_CENTERS_FWHM)
    wv3_path = os.path.join(scene_dir, "wv3.tif")
    if wv3_bands and not os.path.exists(wv3_path):
        wv3, _ = sensors.transform_to_worldview_3(
            jnp.asarray(cube, jnp.float32), wavelengths, bands=wv3_bands
        )
        write_geotiff(wv3_path, np.asarray(wv3, np.float32),
                      descriptions=list(wv3_bands), **geo)
        with open(os.path.join(scene_dir, "wv3_bands.json"), "w") as fh:
            json.dump(wv3_bands, fh)
    outputs["wv3"] = wv3_path

    s2_bands = sensors.covered_bands(wavelengths, sensors.S2_BAND_CENTERS_FWHM)
    for sensor in ("S2A", "S2B"):
        s2_path = os.path.join(scene_dir, f"{sensor.lower()}.tif")
        if s2_bands and not os.path.exists(s2_path):
            s2, _ = sensors.transform_to_sentinel_2(
                jnp.asarray(cube, jnp.float32), wavelengths, bands=s2_bands, sensor=sensor
            )
            write_geotiff(s2_path, np.asarray(s2, np.float32),
                          descriptions=list(s2_bands), **geo)
        outputs[sensor] = s2_path

    if label_rgba is not None:
        write_geotiff(os.path.join(scene_dir, "label_rgba.tif"),
                      label_rgba.astype(np.float32),
                      descriptions=["r", "g", "b", "a"], **geo)
    return outputs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenes-dir", default=None, help="directory of {name}.npy radiance cubes")
    p.add_argument("--synthetic", type=int, default=0, help="generate N synthetic scenes instead")
    p.add_argument("--output", required=True, help="output root for scene products + chips")
    p.add_argument("--chip-size", type=int, default=512)
    p.add_argument("--stats-overlap", type=int, default=256)
    p.add_argument("--n-hard", type=int, default=2)
    p.add_argument("--n-random", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    from starcop_tpu.data.geotiff import find_raster, load_raster, write_geotiff
    from starcop_tpu.data.mining import mag1c_window_stats, sampling_no_plumes
    from starcop_tpu.data.synthetic import aviris_swir_bands, synthetic_scene

    os.makedirs(args.output, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    scenes = []
    if args.synthetic:
        # Synthetic cubes span only the matched-filter window; that's the band
        # set the filter uses, and the sensor sims use their SWIR overlap.
        # Each synthetic scene gets a plausible Permian-basin UTM-13N grid
        # (5 m pixels) so the geo plumbing is exercised end to end.
        centers, fwhm = aviris_swir_bands()
        for i in range(args.synthetic):
            s = synthetic_scene(rng, 1024, 640, n_plumes=int(rng.integers(0, 4)))
            if s["label"].sum() > 0:
                rgba = np.zeros((4,) + s["label"].shape, np.float32)
                rgba[3] = s["label"]
            else:
                # Plume-free scenes stay unlabeled: they are the negative-
                # mining population (like the reference's no-plume flights).
                rgba = None
            geo = ((5.0, 0.0, 500000.0 + 10000.0 * i, 0.0, -5.0, 3540000.0), 32613)
            scenes.append((f"synth{i:03d}", s["radiance"], centers, fwhm, rgba, s["rgb"], geo))
    elif args.scenes_dir:
        for name in sorted(os.listdir(args.scenes_dir)):
            if not name.endswith(".npy") or name.endswith(("_wl.npy", "_fwhm.npy", "_label.npy")):
                continue
            base = name[:-4]
            cube = np.load(os.path.join(args.scenes_dir, name))
            wl_p = os.path.join(args.scenes_dir, f"{base}_wl.npy")
            fw_p = os.path.join(args.scenes_dir, f"{base}_fwhm.npy")
            wl = np.load(wl_p) if os.path.exists(wl_p) else np.linspace(2122, 2488, cube.shape[-1])
            fw = np.load(fw_p) if os.path.exists(fw_p) else np.full(len(wl), 5.5)
            lb_p = os.path.join(args.scenes_dir, f"{base}_label.npy")
            rgba = np.load(lb_p) if os.path.exists(lb_p) else None
            rgb_p = os.path.join(args.scenes_dir, f"{base}_rgb.npy")
            rgb = np.load(rgb_p) if os.path.exists(rgb_p) else None
            geo_p = os.path.join(args.scenes_dir, f"{base}_geo.json")
            geo = (None, None)
            if os.path.exists(geo_p):
                with open(geo_p) as fh:
                    g = json.load(fh)
                geo = (tuple(g["transform"]) if g.get("transform") else None,
                       g.get("crs_epsg"))
            scenes.append((base, cube, wl, fw, rgba, rgb, geo))
    else:
        p.error("Provide --scenes-dir or --synthetic N")

    all_stats = []
    scene_geo = {}
    for name, cube, wl, fw, rgba, rgb, geo in scenes:
        t0 = time.time()
        transform, crs_epsg = geo
        scene_geo[name] = geo
        scene_dir = os.path.join(args.output, "scenes", name)
        process_scene(scene_dir, name, cube, np.asarray(wl, np.float64),
                      np.asarray(fw, np.float64), rgba,
                      transform=transform, crs_epsg=crs_epsg)
        if rgb is not None and find_raster(scene_dir, "rgb") is None:
            # (H, W, 3) visible bands (640/550/460 nm picks or synthetic RGB):
            # becomes the TOA_AVIRIS_{640,550,460}nm chip products.
            write_geotiff(os.path.join(scene_dir, "rgb.tif"),
                          np.moveaxis(np.asarray(rgb, np.float32), -1, 0),
                          transform=transform, crs_epsg=crs_epsg,
                          descriptions=["640nm", "550nm", "460nm"])
        mf = load_raster(find_raster(scene_dir, "mag1c"))
        stats = mag1c_window_stats(mf, size=args.chip_size, overlap=args.stats_overlap)
        for s in stats:
            s["name"] = name
        all_stats.extend(stats)
        print(f"scene {name}: {time.time() - t0:.1f}s ({len(stats)} windows)")

    with open(os.path.join(args.output, "stats_mag1c.json"), "w") as fh:
        json.dump(all_stats, fh)

    # Negative mining runs ONLY over unlabeled scenes (the reference feeds
    # sampling_no_plumes scenes without plumes — sampling_dataset.py:408);
    # labeled scenes' high-mag1c windows are the plumes themselves.
    def scene_labeled(name: str) -> bool:
        return find_raster(os.path.join(args.output, "scenes", name), "label_rgba") is not None

    unlabeled_stats = [s for s in all_stats if not scene_labeled(s["name"])]
    negatives = sampling_no_plumes(unlabeled_stats, args.n_hard, args.n_random, seed=args.seed)

    # Chip cache: plume candidates (high-mag1c windows of labeled scenes) +
    # mined negatives; ids deduplicated (one folder per window).
    from starcop_tpu.data.chip_cache import cache_dataset

    rows = []
    for s in all_stats:
        if s["max"] >= 200 and scene_labeled(s["name"]):
            r = dict(s)
            r["kind"] = "plume_candidate"
            rows.append(r)
    for s in negatives:
        r = dict(s)
        r["kind"] = "negative"
        rows.append(r)
    seen_ids = set()
    deduped = []
    for r in rows:
        r["id"] = f"{r['name']}_r{r['window_row_off']}_c{r['window_col_off']}"
        if r["id"] not in seen_ids:
            seen_ids.add(r["id"])
            deduped.append(r)
    rows = deduped

    from starcop_tpu.data.geo import window_transform

    def read_products(row):
        scene_dir = os.path.join(args.output, "scenes", row["name"])
        window = (row["window_col_off"], row["window_row_off"],
                  row["window_width"], row["window_height"])
        products = {"mag1c": load_raster(find_raster(scene_dir, "mag1c"), window=window)}
        wv3_path = find_raster(scene_dir, "wv3")
        if wv3_path:
            wv3 = load_raster(wv3_path, window=window)
            if wv3.ndim == 2:  # single covered band comes back squeezed
                wv3 = wv3[None]
            bands_path = os.path.join(scene_dir, "wv3_bands.json")
            if os.path.exists(bands_path):
                with open(bands_path) as fh:
                    wv3_bands = json.load(fh)
            else:
                wv3_bands = [f"SWIR{i}" for i in range(1, wv3.shape[0] + 1)]
            for i, band in enumerate(wv3_bands):
                products[f"TOA_WV3_{band}"] = wv3[i]
        rgb_path = find_raster(scene_dir, "rgb")
        if rgb_path:
            if rgb_path.endswith(".npy"):  # legacy channels-last layout
                c, r, w, h = window
                rgb_hw3 = np.load(rgb_path, mmap_mode="r")[r : r + h, c : c + w]
                rgb = np.moveaxis(np.asarray(rgb_hw3), -1, 0)
            else:
                rgb = load_raster(rgb_path, window=window)  # (3, h, w)
            for i, wl_name in enumerate(("640", "550", "460")):
                products[f"TOA_AVIRIS_{wl_name}nm"] = rgb[i]
        rgba_path = find_raster(scene_dir, "label_rgba")
        rgba = None
        if rgba_path and row.get("kind") == "plume_candidate":
            rgba = load_raster(rgba_path, window=window)
        s_transform, s_epsg = scene_geo.get(row["name"], (None, None))
        chip_geo = {}
        if s_transform is not None:
            chip_geo = {
                "transform": window_transform(
                    s_transform, row["window_col_off"], row["window_row_off"]
                ),
                "crs_epsg": s_epsg,
            }
        return products, rgba, chip_geo

    index = cache_dataset(
        os.path.join(args.output, "chips"), rows, read_products,
        output_size=(args.chip_size, args.chip_size),
    )
    print(f"cached {len(rows)} chips -> {index}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

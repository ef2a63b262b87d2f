"""SRF-simulation validation demo: AVIRIS -> Sentinel-2 / WorldView-3.

Executable re-design of the reference's ``simulate_aviris_2_sentinel2.ipynb``
(SRF simulation checked against a real S2 SAFE scene — unavailable offline):
builds a synthetic full-VSWIR AVIRIS-like cube with known spectral structure,
simulates S2A/S2B/WV3 views through the shipped tabulated SRFs, and renders

  * the SRF curves per sensor (tabulated vs the Gaussian fallback),
  * simulated band images,
  * a per-band consistency check: a spectrally flat scene must map to the
    same constant in every band (normalized weights), and the S2A/S2B B12
    responses must differ (per-unit tables).

    python examples/srf_simulation_demo.py [out_dir]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(_sys.argv[0] if __name__ == "__main__" else __file__))))

import os
import sys
import tempfile

import numpy as np


def main(out_dir=None):
    import matplotlib

    matplotlib.use("Agg")
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from starcop_tpu.data import sensors
    from starcop_tpu.data.srf import get_srf, srf_table_weights

    out_dir = out_dir or tempfile.mkdtemp(prefix="starcop_srf")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)

    # Synthetic AVIRIS-like cube: smooth continuum + absorption features,
    # 5 nm sampling over the full VSWIR range.
    wl = np.arange(400.0, 2500.0, 5.0)
    h = w = 96
    continuum = 2.0 + 1.5 * np.exp(-((wl - 800.0) ** 2) / (2 * 500.0**2))
    absorption = 1.0 - 0.35 * np.exp(-((wl - 2200.0) ** 2) / (2 * 60.0**2))
    albedo = rng.uniform(0.4, 1.6, size=(h, w, 1))
    cube = (albedo * (continuum * absorption)[None, None, :]).astype(np.float32)

    # --- SRF curves -------------------------------------------------------
    fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
    for ax, sensor in zip(axes, ("S2A", "S2B", "WV3")):
        swl, svals, names = get_srf(sensor)
        for j, name in enumerate(names):
            ax.plot(swl, svals[:, j], lw=0.8)
        ax.set_ylabel(sensor)
    axes[-1].set_xlabel("wavelength [nm]")
    fig.suptitle("Shipped tabulated SRFs (super-Gaussian, per-unit centers)")
    fig.tight_layout()
    srf_png = os.path.join(out_dir, "srf_curves.png")
    fig.savefig(srf_png, dpi=110)
    plt.close(fig)

    # --- Simulations ------------------------------------------------------
    s2a, s2a_bands = sensors.transform_to_sentinel_2(jnp.asarray(cube), wl, sensor="S2A")
    wv3, wv3_bands = sensors.transform_to_worldview_3(jnp.asarray(cube), wl)
    s2a, wv3 = np.asarray(s2a), np.asarray(wv3)
    print(f"S2A bands {s2a_bands}: {s2a.shape}")
    print(f"WV3 bands {wv3_bands}: {wv3.shape}")

    fig, axes = plt.subplots(2, 8, figsize=(18, 5))
    for j in range(8):
        axes[0, j].imshow(s2a[j], cmap="viridis")
        axes[0, j].set_title(f"S2A {s2a_bands[j]}", fontsize=8)
        axes[1, j].imshow(wv3[j], cmap="viridis")
        axes[1, j].set_title(f"WV3 {wv3_bands[j]}", fontsize=8)
        for ax in (axes[0, j], axes[1, j]):
            ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    bands_png = os.path.join(out_dir, "simulated_bands.png")
    fig.savefig(bands_png, dpi=110)
    plt.close(fig)

    # --- Consistency checks ----------------------------------------------
    flat = jnp.full((8, 8, len(wl)), 3.0, jnp.float32)
    wv3_flat, _ = sensors.transform_to_worldview_3(flat, wl)
    assert np.allclose(np.asarray(wv3_flat), 3.0, rtol=1e-5), "weights not normalized"
    w_a, _ = srf_table_weights(wl, "S2A", bands=["B12"])
    w_b, _ = srf_table_weights(wl, "S2B", bands=["B12"])
    com_a = float((wl * w_a[:, 0]).sum())
    com_b = float((wl * w_b[:, 0]).sum())
    print(f"B12 center of mass: S2A {com_a:.1f} nm vs S2B {com_b:.1f} nm "
          f"(per-unit split: {com_a - com_b:+.1f} nm)")
    assert com_a > com_b
    # The 2200 nm absorption must depress the bands covering it (WV3 SWIR6)
    # relative to a band outside it (SWIR2 at 1571 nm), beyond the albedo
    # ratio of a feature-free spectrum.
    i6, i2 = wv3_bands.index("SWIR6"), wv3_bands.index("SWIR2")
    ratio = float((wv3[i6] / wv3[i2]).mean())
    print(f"SWIR6/SWIR2 mean ratio {ratio:.3f} (absorption visible: < continuum ratio)")
    print(f"wrote {srf_png} and {bands_png}")
    return out_dir


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

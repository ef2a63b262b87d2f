"""Test configuration: run everything on an 8-virtual-device CPU mesh.

Must set XLA flags before jax initializes so multi-chip sharding paths are
exercised without TPU hardware.
"""

import os

# Force CPU. Note: a sitecustomize may import jax at interpreter startup with
# JAX_PLATFORMS pointing at a TPU tunnel, so the env alone is not enough — the
# jax.config update below is the authoritative override.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # oracles run in float64
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_radiance():
    """Synthetic (B, P, S) radiance with injected CH4-like absorption.

    Smooth background spectra + spatially-sparse absorption along a known
    template direction, mimicking plume pixels over a bright/dark albedo field.
    Uses its OWN generator: the shared session ``rng`` is mutated by whichever
    tests run first, which made this fixture's data depend on test selection
    (observed as order-dependent flakiness in the Pallas parity test).
    """
    rng = np.random.default_rng(0)
    b, p, s = 2, 512, 50
    template = -np.abs(np.sin(np.linspace(0, 3 * np.pi, s))) * 1e-5  # absorption-like
    albedo = rng.uniform(0.5, 2.0, size=(b, p, 1))
    base = rng.uniform(2.0, 6.0, size=(1, 1, s)) + 0.3 * np.sin(np.linspace(0, 2, s))
    noise = rng.normal(0, 0.02, size=(b, p, s))
    conc = np.zeros((b, p, 1))
    plume_idx = rng.choice(p, size=p // 20, replace=False)
    conc[:, plume_idx, 0] = rng.uniform(500, 4000, size=(b, len(plume_idx)))
    x = albedo * base * np.exp(conc * template[None, None, :] / 1e5 * 1e5) + noise
    x = np.clip(x, 0.1, None)
    return x.astype(np.float64), (template * 1e5).astype(np.float64)

"""Plot-registry breadth: every reference PLOTTING_FUNCTIONS entry renders.

The reference registers ~35 named products (/root/reference/starcop/plot.py:
98-188). This test enumerates them one for one and smoke-renders a grid for
EVERY registered product in the rebuild's registry.
"""

import numpy as np
import pytest

from starcop_tpu.eval.plot import (
    _REFERENCE_NAMED_ENTRIES,
    PLOTTING_FUNCTIONS,
    plot_batch,
)

REFERENCE_NAMED = [
    "rgb_aviris", "rgb_s2a", "swirnirred_s2a",
    "aviris_ratios_first", "aviris_ratios_second", "aviris_ratios_third",
    "wv3_ratios_varon_b7b5", "wv3_ratios_varon_b8b5", "wv3_ratios_varon_b7b6",
    "wv3_ratios_sanchez_b7b7mlr", "wv3_ratios_sanchez_b8b8mlr",
    "wv3_ratios_sanchez_b7b7mlr_v2", "wv3_ratios_sanchez_b8b8mlr_v2",
    "wv3_lrn_bands2band8only_60ep_512_l1",
    "wv3_mixSanchez_b7b7mlr_fromS2_9b", "wv3_mixSanchez_b7b7mlr_fromS2_5b",
    "wv3_mixSanchez_b8b8mlr_fromS2_9b", "wv3_mixSanchez_b8b8mlr_fromS2_5b",
    "s2_b1", "s2_b2", "s2_b3", "s2_b4",
    "wv3_b1", "wv3_b2", "wv3_b3", "wv3_b4",
    "wv3_b5", "wv3_b6", "wv3_b7", "wv3_b8",
    "mag1c", "label", "pred", "pred_binary", "weight_loss", "differences",
]


def test_every_reference_entry_registered():
    missing = [n for n in REFERENCE_NAMED if n not in PLOTTING_FUNCTIONS]
    assert not missing, f"reference plot products not registered: {missing}"


def _product_inputs(name):
    entry = PLOTTING_FUNCTIONS[name]
    if "input_products" in entry:
        return list(entry["input_products"])
    if name == "rgb_aviris":
        return ["TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"]
    return []


def _make_batch(rng, input_products, n=1, hw=24):
    c = len(input_products)
    batch = {
        "input": rng.uniform(0, 2, (n, c, hw, hw)).astype(np.float32),
        "input_norm": rng.uniform(0, 1, (n, c, hw, hw)).astype(np.float32),
        "output": (rng.uniform(size=(n, 1, hw, hw)) > 0.8).astype(np.float32),
        "output_norm": (rng.uniform(size=(n, 1, hw, hw)) > 0.8).astype(np.float32),
        "weight_loss": rng.uniform(0.1, 1, (n, 1, hw, hw)).astype(np.float32),
        "prediction": rng.uniform(0, 1, (n, 1, hw, hw)).astype(np.float32),
        "pred_binary": (rng.uniform(size=(n, 1, hw, hw)) > 0.5).astype(np.float32),
        "differences": rng.integers(0, 4, (n, 1, hw, hw)).astype(np.float32),
        "loss_per_pixel": rng.uniform(0, 1, (n, 1, hw, hw)).astype(np.float32),
        "id": ["t0"] * n,
    }
    return batch


@pytest.mark.parametrize("chunk", range(0, len(REFERENCE_NAMED), 12))
def test_reference_products_render(chunk, rng):
    matplotlib = pytest.importorskip("matplotlib")
    names = REFERENCE_NAMED[chunk : chunk + 12]
    inputs = sorted({p for n in names for p in _product_inputs(n)} | {"mag1c"})
    batch = _make_batch(np.random.default_rng(0), inputs)
    fig = plot_batch(batch, inputs, names)
    # every requested product got a populated axis (plot_batch blanks axes it
    # cannot resolve; none of these should be blank)
    axes = fig.get_axes()
    assert len(axes) == len(names)
    populated = [bool(ax.images) for ax in axes]
    assert all(populated), f"blank plots for {[n for n, p in zip(names, populated) if not p]}"
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_full_registry_smoke(rng):
    """Everything registered (incl. all normalizer products) renders."""
    pytest.importorskip("matplotlib")
    import matplotlib.pyplot as plt

    all_names = sorted(PLOTTING_FUNCTIONS)
    inputs = sorted(
        {p for n in all_names for p in _product_inputs(n)}
        | {n for n in all_names if not _product_inputs(n)} - {"rgb_aviris"}
    )
    batch = _make_batch(np.random.default_rng(1), inputs)
    for start in range(0, len(all_names), 25):
        fig = plot_batch(batch, inputs, all_names[start : start + 25])
        plt.close(fig)


def test_image_logger_writes_epoch_grid(tmp_path):
    """ImageLogger (reference data_logger.py:26-62): holds a fixed batch, on
    epoch end runs batch_with_preds and writes out_dir/epoch_{n}.png."""
    pytest.importorskip("matplotlib")
    import types

    import jax
    import jax.numpy as jnp

    from starcop_tpu.eval.plot import ImageLogger
    from starcop_tpu.models import SegmentationModel

    r = np.random.default_rng(3)
    products = ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"]
    batch = {
        "input": jnp.asarray(r.uniform(0, 100, size=(2, 4, 32, 32)), jnp.float32),
        "output": jnp.asarray((r.uniform(size=(2, 1, 32, 32)) > 0.9).astype(np.float32)),
        "weight_loss": jnp.ones((2, 1, 32, 32), jnp.float32),
        "has_plume": jnp.asarray([1.0, 0.0]),
        "id": ["a", "b"],
    }
    model = SegmentationModel(products, model_type="single", pos_weight=1.0)
    variables = model.init(jax.random.PRNGKey(0), batch["input"])
    state = types.SimpleNamespace(
        params=variables["params"], batch_stats=variables.get("batch_stats", {})
    )
    logger = ImageLogger(
        model, batch, products, ["rgb_aviris", "mag1c", "output", "prediction"],
        str(tmp_path),
    )
    logger.on_epoch_end(trainer=None, state=state, epoch=3)
    assert (tmp_path / "epoch_3.png").exists()
    assert (tmp_path / "epoch_3.png").stat().st_size > 1000

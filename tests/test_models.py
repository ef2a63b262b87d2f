"""Model-layer tests: architectures, segmenter protocol, baselines, padding,
loss parity vs torch BCEWithLogitsLoss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starcop_tpu.models import (
    Mag1cBaseline,
    MobileNetV2UNet,
    SanchezBaseline,
    SegmentationModel,
    SingleConv,
    UNet,
    VaronBaseline,
    configure_architecture,
    differences,
    pred_classification,
)
from starcop_tpu.models.segmenter import weighted_bce_with_logits
from starcop_tpu.ops.padding import find_padding, padded_apply


@pytest.fixture(scope="module")
def small_batch(rng=None):
    r = np.random.default_rng(7)
    b, c, h, w = 2, 4, 64, 64
    return {
        "input": jnp.asarray(r.uniform(0, 100, size=(b, c, h, w)), jnp.float32),
        "output": jnp.asarray((r.uniform(size=(b, 1, h, w)) > 0.9).astype(np.float32)),
        "weight_loss": jnp.ones((b, 1, h, w), jnp.float32),
        "has_plume": jnp.asarray([1, 0]),
        "id": ["tile_a", "tile_b"],
    }


def test_mobilenet_unet_shapes():
    model = MobileNetV2UNet(num_classes=1)
    x = jnp.zeros((1, 64, 64, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 1)
    # Encoder feature channels must match the smp layout for weight porting.
    enc = variables["params"]["encoder"]
    assert enc["features_0"]["conv"]["kernel"].shape == (3, 3, 4, 32)
    assert enc["features_18"]["conv"]["kernel"].shape == (1, 1, 320, 1280)
    # Param count close to the reference's ~6.6M mobilenet_v2 U-Net.
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert 4e6 < n_params < 9e6, n_params


def test_mobilenet_unet_train_mode_updates_stats():
    model = MobileNetV2UNet(num_classes=1)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 32, 32, 1)
    assert "batch_stats" in updates


def test_hand_unet_shapes():
    model = UNet(out_channels=1)
    x = jnp.zeros((2, 64, 64, 5), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(variables, x).shape == (2, 64, 64, 1)


def test_architecture_factory():
    assert isinstance(configure_architecture("single", 1), SingleConv)
    assert isinstance(configure_architecture("unet_semseg", 1), MobileNetV2UNet)
    with pytest.raises(ValueError):
        configure_architecture("nope", 1)


def test_pred_classification_rule():
    # 128x128 tile: rule threshold = 10 * 128^2 / 64^2 = 40 pixels
    pb = jnp.zeros((1, 1, 128, 128), jnp.int32)
    assert int(pred_classification(pb)[0, 0]) == 0
    pb = pb.at[0, 0, :5, :8].set(1)  # 40 pixels -> NOT > 40
    assert int(pred_classification(pb)[0, 0]) == 0
    pb = pb.at[0, 0, 10, 10].set(1)  # 41 pixels
    assert int(pred_classification(pb)[0, 0]) == 1


def test_differences_encoding():
    pred = jnp.asarray([[0, 0, 1, 1]])
    gt = jnp.asarray([[0, 1, 0, 1]])
    np.testing.assert_array_equal(np.asarray(differences(pred, gt)), [[0, 1, 2, 3]])


def test_bce_matches_torch():
    import torch

    r = np.random.default_rng(11)
    logits = r.normal(size=(2, 1, 8, 8)).astype(np.float32)
    y = (r.uniform(size=(2, 1, 8, 8)) > 0.5).astype(np.float32)
    for pw in (1.0, 15.0):
        got = np.asarray(weighted_bce_with_logits(jnp.asarray(logits), jnp.asarray(y), pw))
        want = torch.nn.BCEWithLogitsLoss(
            pos_weight=torch.tensor(pw), reduction="none"
        )(torch.from_numpy(logits), torch.from_numpy(y)).numpy()
        # float32 log-sigmoid implementations differ by a few ulps between
        # XLA and torch; the math is identical (verified at f64).
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_segmentation_model_protocol(small_batch):
    m = SegmentationModel(
        ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"],
        model_type="single",
        pos_weight=15.0,
    )
    variables = m.init(jax.random.PRNGKey(0), small_batch["input"])
    enriched = m.batch_with_preds(variables, small_batch)
    for key in (
        "input_norm",
        "output_norm",
        "logits",
        "prediction",
        "pred_binary",
        "differences",
        "pred_classification",
        "loss_per_pixel",
        "loss_per_pixel_weighted",
    ):
        assert key in enriched, key
    assert enriched["prediction"].shape == (2, 1, 64, 64)
    p = np.asarray(enriched["prediction"])
    assert np.all((p >= 0) & (p <= 1))
    np.testing.assert_array_equal(
        np.asarray(enriched["pred_binary"]), (p > 0.5).astype(np.int32)
    )
    # loss is finite and matches loss_fn
    logits = enriched["logits"]
    loss = m.loss_fn(logits, small_batch["output"], small_batch["weight_loss"])
    assert np.isfinite(float(loss))


def test_baselines_protocol(small_batch):
    products = ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"]
    bl = Mag1cBaseline(products)
    batch = dict(small_batch)
    # Plant a solid mag1c blob over threshold in tile 0.
    inp = np.asarray(batch["input"]).copy()
    inp[0, 0] = 0.0
    inp[0, 0, 10:20, 10:20] = 3000.0
    inp[1, 0] = 0.0
    batch["input"] = jnp.asarray(inp)
    out = bl.batch_with_preds(batch)
    pb = np.asarray(out["pred_binary"])
    assert pb[0, 0, 15, 15] == 1
    assert pb[1].sum() == 0
    assert int(out["pred_classification"][0, 0]) == 1
    assert int(out["pred_classification"][1, 0]) == 0
    # Threshold sweep hook exists and responds to the threshold.
    many = np.asarray(bl.apply_threshold(out["prediction"], 1.0)).sum()
    few = np.asarray(bl.apply_threshold(out["prediction"], 5000.0)).sum()
    assert many >= few


def test_varon_sanchez_baselines():
    products = [
        "ratio_wv3_B7_B5_varon21_sum_c_out",
        "ratio_wv3_B8_B8MLR_SanchezGarcia22_sum_c_out",
    ]
    r = np.random.default_rng(3)
    x = r.normal(0, 0.01, size=(1, 2, 32, 32)).astype(np.float32)
    x[0, 0, 5:12, 5:12] = 0.5  # strong varon ratio blob (normalized by 0.04 -> >>0.05)
    batch = {
        "input": jnp.asarray(x),
        "output": jnp.zeros((1, 1, 32, 32), jnp.float32),
    }
    v = VaronBaseline(products)
    out = v.batch_with_preds(batch)
    assert np.asarray(out["pred_binary"])[0, 0, 8, 8] == 1
    s = SanchezBaseline(products)
    out2 = s.batch_with_preds(batch)
    assert out2["pred_binary"].shape == (1, 1, 32, 32)


def test_find_padding():
    assert find_padding(64, 32) == (0, 0)
    assert find_padding(65, 32) == (15, 16)
    assert find_padding(5, 32) == (13, 14)


def test_padded_apply_identity():
    x = jnp.asarray(np.random.default_rng(5).normal(size=(3, 70, 45)), jnp.float32)
    out = padded_apply(x, lambda b: b, divisor=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_padded_apply_model():
    m = UNet(out_channels=1)
    x = jnp.zeros((1, 96, 96, 2), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)

    def fn(batch_chw):
        nhwc = jnp.transpose(batch_chw, (0, 2, 3, 1))
        return jnp.transpose(m.apply(variables, nhwc), (0, 3, 1, 2))

    scene = jnp.asarray(np.random.default_rng(6).normal(size=(2, 70, 45)), jnp.float32)
    out = padded_apply(scene, fn, divisor=32)
    assert out.shape == (1, 70, 45)


def test_mobilenet_unet_bf16_compute():
    """Mixed precision: bf16 compute, f32 params/logits, finite gradients."""
    model = MobileNetV2UNet(num_classes=1, dtype=jnp.bfloat16)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(variables["params"]))
    out = model.apply(variables, x, train=False)
    assert out.dtype == jnp.float32

    def loss(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(logits**2)

    grads = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_bf16_resident_weights_inference():
    """bf16-resident-weights inference config: cast the variables pytree once
    (cast_variables_for_inference) and run the bf16-compute network — logits
    must track the f32 configuration closely (the production zero-shot eval
    path; detection flips only from sub-1e-2 logit noise)."""
    from starcop_tpu.models import SegmentationModel, cast_variables_for_inference

    products = ["mag1c", "TOA_AVIRIS_640nm", "TOA_AVIRIS_550nm", "TOA_AVIRIS_460nm"]
    model_f32 = SegmentationModel(products, model_type="unet_semseg")
    model_bf16 = SegmentationModel(
        products, model_type="unet_semseg", model_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 100, (2, 4, 64, 64)), jnp.float32)
    variables = model_f32.init(jax.random.PRNGKey(0), x)
    v_bf16 = cast_variables_for_inference(variables)
    # every float32 leaf (params AND batch_stats) was narrowed exactly once
    assert all(
        l.dtype == jnp.bfloat16
        for l in jax.tree.leaves(v_bf16)
        if jnp.issubdtype(l.dtype, jnp.floating)
    )
    ref = np.asarray(model_f32.apply(variables, x, train=False))
    out = np.asarray(model_bf16.apply(v_bf16, x, train=False))
    assert out.dtype == np.float32
    # logits track f32: tight against the logit spread (bf16 rounding only)
    spread = float(ref.std()) + 1e-6
    assert np.corrcoef(ref.ravel(), out.ravel())[0, 1] > 0.999
    assert float(np.abs(out - ref).mean()) < 0.05 * spread

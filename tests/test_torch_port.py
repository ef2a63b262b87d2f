"""Weight-port parity: torch smp-layout MobileNetV2-UNet -> Flax, forward equal."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from starcop_tpu.models.mobilenet_unet import MobileNetV2UNet  # noqa: E402
from starcop_tpu.models.torch_port import port_smp_mobilenetv2_unet  # noqa: E402
from tests.torch_twin import TorchMobileNetV2UNet  # noqa: E402


def test_port_forward_parity():
    torch.manual_seed(0)
    tm = TorchMobileNetV2UNet(in_channels=4, classes=1).eval()
    # Randomize BN stats so the port is tested beyond defaults.
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    variables = port_smp_mobilenetv2_unet(tm.state_dict())

    x = np.random.default_rng(0).normal(size=(1, 4, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    fm = MobileNetV2UNet(num_classes=1)
    got = fm.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_port_rejects_nothing_missing():
    """Every flax param leaf must be populated by the port (no silent inits)."""
    tm = TorchMobileNetV2UNet(in_channels=3, classes=1)
    variables = port_smp_mobilenetv2_unet(tm.state_dict())
    fm = MobileNetV2UNet(num_classes=1)
    ref = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)

    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(ref["params"])[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    assert ref_paths == got_paths
    # Shapes agree everywhere.
    for (p, leaf_ref), (_, leaf_got) in zip(
        jax.tree_util.tree_flatten_with_path(ref["params"])[0],
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
    ):
        assert np.shape(leaf_ref) == np.shape(leaf_got), jax.tree_util.keystr(p)

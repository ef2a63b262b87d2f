"""Tests for the storage seam (local backend) and initialize_multihost args.

The reference reaches gs:// through fsspec at every call site
(/root/reference/starcop/utils.py:20-103, scripts/train.py:147-148); the
rebuild funnels all of it through ``starcop_tpu.utils.storage`` so the local
backend is fully tested and remote storage is one seam.
"""

import os

import numpy as np
import pytest

from starcop_tpu.utils import storage


def test_is_remote_and_filesystem():
    assert storage.is_remote("gs://bucket/x")
    assert storage.is_remote("s3://bucket/x")
    assert not storage.is_remote("/tmp/x")
    assert not storage.is_remote("relative/path.csv")
    assert storage.get_filesystem("/tmp/x") is None


def test_open_write_creates_parents(tmp_path):
    p = str(tmp_path / "a" / "b" / "f.txt")
    with storage.open_file(p, "w") as fh:
        fh.write("hello")
    assert storage.exists(p)
    with storage.open_file(p) as fh:
        assert fh.read() == "hello"


def test_json_roundtrip(tmp_path):
    p = str(tmp_path / "meta.json")
    storage.write_json(p, {"f1": 0.9, "n": 3})
    assert storage.read_json(p) == {"f1": 0.9, "n": 3}


def test_put_file_and_tree(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "x.txt").write_text("1")
    (src / "sub").mkdir()
    (src / "sub" / "y.txt").write_text("2")

    dest_file = str(tmp_path / "out" / "x.txt")
    storage.put(str(src / "x.txt"), dest_file)
    assert storage.exists(dest_file)

    dest_tree = str(tmp_path / "tree")
    storage.put(str(src), dest_tree, recursive=True)
    assert (tmp_path / "tree" / "sub" / "y.txt").read_text() == "2"
    assert storage.listdir(dest_tree) == ["sub", "x.txt"]


def test_glob_local(tmp_path):
    for n in ("a1.npz", "a2.npz", "b.txt"):
        (tmp_path / n).write_text("")
    hits = storage.glob(str(tmp_path / "*.npz"))
    assert [os.path.basename(h) for h in hits] == ["a1.npz", "a2.npz"]


def test_checkpoint_load_through_seam(tmp_path):
    """load_checkpoint goes through storage.open_file (fsspec-openable paths
    work like the reference's load_weights, model_module.py:258-266)."""
    import jax
    import jax.numpy as jnp

    from starcop_tpu.models import SegmentationModel
    from starcop_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from starcop_tpu.train.loop import create_train_state

    model = SegmentationModel(["mag1c"], model_type="single")
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16), jnp.float32)
    )
    path = save_checkpoint(str(tmp_path), state, name="ckpt")
    restored = load_checkpoint(path, state)
    np.testing.assert_array_equal(
        np.asarray(restored.params["Conv_0"]["kernel"]),
        np.asarray(state.params["Conv_0"]["kernel"]),
    )


def test_initialize_multihost_argument_validation():
    from starcop_tpu.parallel.mesh import initialize_multihost

    # single-process: a no-op, never raises
    initialize_multihost()
    initialize_multihost()  # idempotent

    with pytest.raises(ValueError, match="coordinator_address"):
        initialize_multihost(num_processes=4)
    with pytest.raises(ValueError, match="process_id"):
        initialize_multihost(coordinator_address="10.0.0.1:1234", num_processes=4)
    with pytest.raises(ValueError, match="out of range"):
        initialize_multihost(
            coordinator_address="10.0.0.1:1234", num_processes=4, process_id=7
        )

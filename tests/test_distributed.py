"""Multi-host execution test: a REAL 2-process ``jax.distributed`` cluster.

SURVEY.md §2.8 maps the reference's (single-process) training onto TPU-native
multi-host DCN initialization; ``initialize_multihost`` wraps
``jax.distributed.initialize``. This test executes that path for real: two OS
processes on the CPU backend form a coordination-service cluster, build ONE
global mesh spanning both processes' devices, and reduce a cross-process sum
under jit (the collective rides the distributed runtime, exactly as a pod
slice's psum rides DCN/ICI).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import jax

    # The session environment pins an accelerator platform plugin; tests run
    # on CPU (post-import config update is the supported override).
    jax.config.update("jax_platforms", "cpu")

    from starcop_tpu.parallel.mesh import initialize_multihost, make_mesh, shard_batch

    initialize_multihost(
        coordinator_address={coord!r}, num_processes=2, process_id={pid}
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == {pid}

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()  # global mesh: one CPU device per process
    assert len(mesh.devices.ravel()) == 2

    # Each process contributes its (process_index + 1) as its local shard of a
    # global batch-sharded array; the jitted global sum must see BOTH shards.
    local = np.full((1, 4), float(jax.process_index() + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local
    )
    assert garr.shape == (2, 4)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    value = float(np.asarray(total.addressable_shards[0].data))
    assert value == 12.0, value  # (1 + 2) * 4 elements

    # shard_batch places host data onto the global mesh the same way the
    # training loop does; round-trip the addressable half.
    batch = shard_batch(mesh, {{"input": np.arange(8, dtype=np.float32).reshape(2, 4)}})
    assert batch["input"].shape == (2, 4)
    print("MULTIHOST_OK", jax.process_index(), value, flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_jax_distributed_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children: 1 CPU device per process
    procs = []
    for pid in range(2):
        script = _WORKER.format(repo=repo, coord=coord, pid=pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
                cwd=str(tmp_path),
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid} 12.0" in out, out

"""Device mesh and sharding helpers.

The reference has no distributed code (single process, single device —
SURVEY.md §2.8); this framework makes the mesh a first-class citizen so the
same train/eval/scene code runs on 1 chip or a pod slice:

  * training: batch axis sharded over the ``"data"`` mesh axis; gradients
    all-reduce over ICI automatically under jit-with-shardings.
  * full-scene enhancement: the matched filter's column-block batch axis is
    sharded over the same axis (blocks are independent -> zero collectives).

No TP/PP is warranted by the ~6.6M-parameter model family; the mesh keeps the
code mesh-shape-agnostic anyway, so wider layouts are a config change.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (DCN between hosts, ICI within).

    Thin wrapper over ``jax.distributed.initialize`` — on Cloud TPU pods the
    arguments are auto-detected from the environment; pass them explicitly for
    other clusters. Call once per process before any jax computation. Safe to
    call in single-process runs (no-ops on failure by raising only for
    explicit-arg mismatches).
    """
    import jax

    explicit = (coordinator_address, num_processes, process_id)
    if any(v is not None for v in explicit):
        if num_processes is not None and num_processes > 1:
            if coordinator_address is None:
                raise ValueError(
                    "multi-process initialization needs coordinator_address "
                    f"(got num_processes={num_processes})"
                )
            if process_id is None:
                raise ValueError(
                    "multi-process initialization needs process_id "
                    f"(got num_processes={num_processes})"
                )
            if not 0 <= process_id < num_processes:
                raise ValueError(
                    f"process_id {process_id} out of range for {num_processes} processes"
                )
        # Forward whatever was given — jax.distributed.initialize infers the
        # rest from the cluster environment (and errors loudly if it can't).
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    if jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return  # single-process / no cluster env: nothing to do


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place a pytree of arrays with the leading axis sharded over the mesh."""

    def place(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. model params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

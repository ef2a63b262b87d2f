"""Column-sharded full-scene matched filter over a device mesh.

The matched filter is embarrassingly parallel over detector column blocks
(per-CCD-column statistics are a correctness requirement for pushbroom
sensors). This module shards the column-block batch axis across the mesh's
``"data"`` axis: each device runs its blocks' full 30-iteration solve locally,
and the only cross-device communication is the final output gather performed
by XLA when the sharded result is assembled. No hand-written collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from starcop_tpu.ops.mag1c import NODATA, acrwl1mf


def sharded_mag1c_scene(
    scene: jax.Array,
    template: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    column_step: int = 32,
    num_iter: int = 30,
    alpha: float = 1e-4,
    fill_value: float = NODATA,
    compute_dtype=jnp.float32,
    axis_name: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Run the matched filter over a (H, W, S) scene, blocks sharded over chips.

    The scene's width is split into ``column_step``-wide blocks; the number of
    blocks is padded up to a multiple of the mesh size so the batch axis
    shards evenly. Padded blocks carry zero weights and are dropped on output.

    Returns (mf, albedo) as (H, W) arrays with ``fill_value`` at invalid pixels.
    """
    h, w_dim, s = scene.shape
    n_dev = mesh.devices.size
    step = int(column_step) if column_step else w_dim
    nb = -(-w_dim // step)
    nb_padded = -(-nb // n_dev) * n_dev
    pad_w = nb_padded * step - w_dim

    scene = jnp.asarray(scene, dtype=compute_dtype)
    valid = (
        jnp.ones((h, w_dim), dtype=bool)
        if valid_mask is None
        else jnp.asarray(valid_mask, dtype=bool)
    )
    if pad_w:
        scene = jnp.pad(scene, ((0, 0), (0, pad_w), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_w)))

    xb = (
        scene.reshape(h, nb_padded, step, s)
        .transpose(1, 0, 2, 3)
        .reshape(nb_padded, h * step, s)
    )
    wb = valid.reshape(h, nb_padded, step).transpose(1, 0, 2).reshape(nb_padded, h * step)
    xb = xb * wb[..., None].astype(xb.dtype)

    block_sharding = NamedSharding(mesh, P(axis_name, None, None))
    weight_sharding = NamedSharding(mesh, P(axis_name, None))
    xb = jax.device_put(xb, block_sharding)
    wb = jax.device_put(wb.astype(compute_dtype), weight_sharding)
    tpl = jax.device_put(jnp.asarray(template, compute_dtype), NamedSharding(mesh, P()))

    use_pallas = compute_dtype == jnp.float32 and mesh.devices.flat[0].platform == "tpu"
    if use_pallas:
        # Pallas kernels don't auto-partition under jit; shard_map runs the
        # fused kernel per-device on its local blocks (blocks are independent,
        # so no collectives are needed).
        from functools import partial

        from starcop_tpu.ops.mag1c_pallas import acrwl1mf_fused

        fn = jax.shard_map(
            partial(acrwl1mf_fused, num_iter=num_iter, alpha=alpha),
            mesh=mesh,
            in_specs=(P(axis_name, None, None), P(), P(axis_name, None)),
            out_specs=(P(axis_name, None, None), P(axis_name, None, None)),
        )
        mf, albedo = fn(xb, tpl, wb)
    else:
        # acrwl1mf is plain XLA; with sharded inputs jit partitions the batch
        # axis across the mesh — every matmul/cholesky stays device-local.
        mf, albedo = acrwl1mf(xb, tpl, wb, num_iter=num_iter, alpha=alpha)

    def unblock(v):
        v = v[..., 0].reshape(nb_padded, h, step).transpose(1, 0, 2).reshape(h, nb_padded * step)
        return v[:, :w_dim]

    mf2 = jnp.where(valid[:, :w_dim], unblock(mf), fill_value)
    albedo2 = jnp.where(valid[:, :w_dim], unblock(albedo), fill_value)
    return mf2, albedo2

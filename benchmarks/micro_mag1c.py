"""Microbenchmark: decompose the full-scene matched-filter latency.

    python benchmarks/micro_mag1c.py

Times (pipelined, one host sync per chain — see benchmarks/harness.py:_timed)
each stage of the Pallas serving path on an EMIT-sized scene, so kernel work
targets the measured bound instead of a guessed one:

  * headline hws / shw layouts (mag1c_column_blocks end to end);
  * the blocked transpose shuffle alone;
  * the one-read init-statistics kernel alone;
  * the VMEM-resident filter kernel alone at num_iter 1 / 10 / 30 (the
    slope is the per-iteration cost; the intercept is DMA + init + glue);
  * stream_dtype variants of the resident kernel.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import numpy as np


def _timed(fn, repeats=3, pipeline=32):
    import jax.numpy as jnp

    float(jnp.sum(fn()))  # warm/compile
    times = []
    for _ in range(repeats):
        t0 = time.time()
        acc = None
        for _ in range(pipeline):
            s = jnp.sum(fn())
            acc = s if acc is None else acc + s
        float(acc)
        times.append((time.time() - t0) / pipeline)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    from starcop_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from starcop_tpu.data.synthetic import synthetic_scene
    from starcop_tpu.ops.ch4_template import generate_template_from_bands
    from starcop_tpu.ops.mag1c import mag1c_column_blocks
    from starcop_tpu.ops.mag1c_pallas import (
        _make_init_stats_call,
        acrwl1mf_fused,
        blocked_transpose_swh,
    )

    centers = np.arange(2122.0, 2488.0, 7.4)
    template = generate_template_from_bands(centers, np.full_like(centers, 8.0))[:, 1]
    H, W, STEP = 1280, 1242, 54
    NB = W // STEP
    rng = np.random.default_rng(0)
    scene = synthetic_scene(rng, H, W, n_plumes=6, template=template)
    cube = jnp.asarray(scene["radiance"])  # (H, W, S)
    cube_shw = jnp.asarray(np.moveaxis(scene["radiance"], -1, 0))  # (S, H, W)
    tpl = jnp.asarray(template, jnp.float32)
    s = len(template)
    sp = -(-s // 8) * 8
    p_blk = H * STEP

    def report(name, t):
        print(f"{name:45s} {t * 1e3:8.2f} ms")

    # --- headline paths -----------------------------------------------------
    for layout, x in (("hws", cube), ("shw", cube_shw)):
        f = jax.jit(
            functools.partial(
                mag1c_column_blocks,
                column_step=STEP,
                num_iter=30,
                alpha=1e-4,
                scene_layout=layout,
            )
        )
        report(f"mag1c_column_blocks {layout} f32", _timed(lambda: f(x, tpl, None)[0]))

    # --- transpose shuffle alone --------------------------------------------
    tr = jax.jit(
        lambda c: blocked_transpose_swh(jnp.transpose(c, (0, 2, 1)), NB, STEP, pad_s=sp)
    )
    report("blocked_transpose_swh", _timed(lambda: tr(cube_shw)))

    xsp = tr(cube_shw)  # (NB, sp, P) pre-transposed, pre-padded

    # --- init stats alone ----------------------------------------------------
    init_call = jax.jit(_make_init_stats_call(NB, p_blk, sp, 1.0 / p_blk, False))
    report("init_stats (one-read mean+cov)", _timed(lambda: init_call(xsp)[1]))

    # --- resident kernel: iteration slope -------------------------------------
    for ni in (1, 10, 30):
        f = jax.jit(
            functools.partial(
                acrwl1mf_fused,
                num_iter=ni,
                alpha=1e-4,
                x_layout="bsp",
                glue="resident",
            )
        )
        report(f"resident bsp f32 num_iter={ni}", _timed(lambda: f(xsp, tpl)[0]))

    # --- resident, bf16 native dots -------------------------------------------
    for ni in (1, 30):
        f = jax.jit(
            functools.partial(
                acrwl1mf_fused,
                num_iter=ni,
                alpha=1e-4,
                x_layout="bsp",
                glue="resident",
                stream_dtype=jnp.bfloat16,
            )
        )
        report(f"resident bsp bf16-dots num_iter={ni}", _timed(lambda: f(xsp, tpl)[0]))

    # --- mono streaming for contrast ------------------------------------------
    f = jax.jit(
        functools.partial(
            acrwl1mf_fused,
            num_iter=30,
            alpha=1e-4,
            x_layout="bsp",
            glue="mono",
        )
    )
    report("mono bsp f32 num_iter=30", _timed(lambda: f(xsp, tpl)[0]))


if __name__ == "__main__":
    main()

"""Pipeline parallelism: GPipe microbatch schedule == sequential execution.

Runs on the virtual 8-device CPU mesh (conftest). Forward outputs and
parameter gradients through the pipeline must match running the stages
sequentially on one device — the pipeline is an execution schedule, not a
different program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.parallel.mesh import make_mesh
from fmc_uia_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_loss_fn,
    shard_stage_params,
    stack_stage_params,
)

S = 4  # stages
M = 8  # microbatches
MB = 2  # microbatch size
D = 16  # feature width


def stage_fn(params, x):
    return jnp.tanh(x @ params["w"] + params["b"])


def make_params(rng, seed_offset=0):
    return [
        {
            "w": jnp.asarray(rng.randn(D, D) * 0.3, jnp.float32),
            "b": jnp.asarray(rng.randn(D) * 0.1, jnp.float32),
        }
        for _ in range(S)
    ]


def sequential(params_list, x_mb):
    def one(x):
        for p in params_list:
            x = stage_fn(p, x)
        return x

    return jax.vmap(one)(x_mb)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(jax.devices()[:S], axes=("pipe",))


def test_pipeline_forward_matches_sequential(mesh, rng):
    params_list = make_params(rng)
    stacked = shard_stage_params(stack_stage_params(params_list), mesh)
    x = jnp.asarray(rng.randn(M, MB, D), jnp.float32)

    ref = sequential(params_list, x)
    out = pipeline_apply(stage_fn, stacked, x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential(mesh, rng):
    params_list = make_params(rng)
    stacked = stack_stage_params(params_list)
    x = jnp.asarray(rng.randn(M, MB, D), jnp.float32)
    y = jnp.asarray(rng.randn(M, MB, D), jnp.float32)

    def seq_loss(stacked_params, x_mb, y_mb):
        plist = [jax.tree_util.tree_map(lambda p: p[i], stacked_params)
                 for i in range(S)]
        return jnp.mean((sequential(plist, x_mb) - y_mb) ** 2)

    pipe_loss = pipeline_loss_fn(
        stage_fn, lambda o, t: jnp.mean((o - t) ** 2), mesh)

    ref_val, ref_grad = jax.value_and_grad(seq_loss)(stacked, x, y)
    pl_val, pl_grad = jax.value_and_grad(pipe_loss)(
        shard_stage_params(stacked, mesh), x, y)

    np.testing.assert_allclose(float(pl_val), float(ref_val),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pl_grad),
                    jax.tree_util.tree_leaves(ref_grad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_under_jit(mesh, rng):
    """The schedule must compile as one XLA program (scan + ppermute)."""
    params_list = make_params(rng)
    stacked = shard_stage_params(stack_stage_params(params_list), mesh)
    x = jnp.asarray(rng.randn(M, MB, D), jnp.float32)

    fn = jax.jit(lambda p, xx: pipeline_apply(stage_fn, p, xx, mesh))
    out = fn(stacked, x)
    ref = sequential(params_list, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_swin_stage_matches_sequential(rng):
    """Turnkey wiring: a scanned Swin stage pipelined over a 2-device pipe
    axis == sequentially applying its block pairs (swin_l-stage-2 shape in
    miniature)."""
    from fmc_uia_tpu.models.encoders.swin import SwinBlockPair, SwinEncoder
    from fmc_uia_tpu.parallel.pipeline import pipeline_swin_stage

    enc = SwinEncoder(embed_dim=16, depths=(2, 2, 4, 2),
                      num_heads=(2, 2, 2, 2), window_size=4,
                      drop_path_rate=0.0, scan_blocks=True,
                      dtype=jnp.float32)
    B, Sp = 4, 8  # stage-2 grid
    dim = enc.embed_dim * 4
    x = jnp.asarray(rng.randn(B, Sp, Sp, dim) * 0.5, jnp.float32)

    # init the full encoder to get genuinely-scanned stage params
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), img)["params"]

    mesh = make_mesh(jax.devices()[:2], axes=("pipe",))
    out = pipeline_swin_stage(enc, params, 2, x, mesh, microbatches=4)

    pair = SwinBlockPair(dim=dim, num_heads=enc.num_heads[2],
                         window_size=enc.window_size,
                         mlp_ratio=enc.mlp_ratio, dtype=jnp.float32)
    seq = x
    stage_params = params["stage2_scan"]
    n_pairs = jax.tree_util.tree_leaves(stage_params)[0].shape[0]
    for i in range(n_pairs):
        p_i = jax.tree_util.tree_map(lambda l: l[i], stage_params)
        seq, _ = pair.apply({"params": p_i}, seq,
                            jnp.zeros((2,), jnp.float32), False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_swin_stage_rejects_unscanned(rng):
    from fmc_uia_tpu.models.encoders.swin import SwinEncoder
    from fmc_uia_tpu.parallel.pipeline import pipeline_swin_stage

    enc = SwinEncoder(embed_dim=16, depths=(2, 2, 4, 2),
                      num_heads=(2, 2, 2, 2), window_size=4,
                      scan_blocks=False, dtype=jnp.float32)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), img)["params"]
    mesh = make_mesh(jax.devices()[:2], axes=("pipe",))
    x = jnp.zeros((4, 8, 8, 64), jnp.float32)
    with pytest.raises(ValueError, match="not scanned"):
        pipeline_swin_stage(enc, params, 2, x, mesh, microbatches=4)

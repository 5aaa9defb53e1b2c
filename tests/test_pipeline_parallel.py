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

"""Fused Pallas kernels under GSPMD sharding == single-device numerics.

VERDICT r3 Missing #2: the bench runs the fused Pallas swin kernels
(ops/swin_block_pallas.py) but the multi-chip artifacts only ever executed
the unfused XLA path. These tests pin that a dp-sharded forward/backward
through `fused_block=True` + `fused_mlp=True` produces the same values and
parameter gradients as the identical computation on one device — i.e. that
`pallas_call` (interpret mode on the CPU backend) composes with the GSPMD
partitioner instead of being replicated-with-different-numerics or
rejected. Grid sizes exercise shifted windows + pad masks (stage-0 grid
16 > window 8) and the sub-window late stages (pad-to-window path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.models.encoders.swin import SwinEncoder
from fmc_uia_tpu.parallel import batch_sharding, make_mesh, replicate

pytestmark = pytest.mark.slow

S, B = 64, 8


def _encoder(**kw):
    return SwinEncoder(embed_dim=32, depths=(2, 2, 2, 2),
                       num_heads=(2, 4, 8, 16), window_size=8,
                       remat=False, drop_path_rate=0.0,
                       fused_block=True, fused_mlp=True, **kw)


def _loss_fn(enc):
    def loss(params, x):
        feats = enc.apply({"params": params}, x, False)
        return sum(jnp.mean(f.astype(jnp.float32) ** 2) for f in feats)
    return loss


@pytest.fixture(scope="module")
def setup():
    enc = _encoder()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x, False)["params"]
    return enc, params, x


def test_fused_forward_dp_matches_single_device(setup):
    enc, params, x = setup
    f_single = jax.jit(_loss_fn(enc))(params, x)

    mesh = make_mesh()
    bs = batch_sharding(mesh)
    f_dp = jax.jit(_loss_fn(enc))(replicate(params, mesh),
                                  jax.device_put(x, bs))
    np.testing.assert_allclose(np.asarray(f_dp), np.asarray(f_single),
                               rtol=1e-5, atol=1e-6)


def test_fused_grads_dp_match_single_device(setup):
    enc, params, x = setup
    loss = _loss_fn(enc)
    g_single = jax.jit(jax.grad(loss))(params, x)

    mesh = make_mesh()
    bs = batch_sharding(mesh)
    g_dp = jax.jit(jax.grad(loss))(replicate(params, mesh),
                                   jax.device_put(x, bs))

    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_single)
    flat_d, _ = jax.tree_util.tree_flatten_with_path(g_dp)
    assert len(flat_s) == len(flat_d)
    for (path_s, leaf_s), (path_d, leaf_d) in zip(flat_s, flat_d):
        assert path_s == path_d
        np.testing.assert_allclose(
            np.asarray(leaf_d), np.asarray(leaf_s), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path_s))


def test_fused_grads_sharded_not_replicated(setup):
    """The batch axis must actually be partitioned through the pallas_call
    (a silent all-gather-and-replicate would still pass the numerics
    test); assert the compiled loss consumes a data-sharded operand."""
    enc, params, x = setup
    mesh = make_mesh()
    bs = batch_sharding(mesh)
    x_dp = jax.device_put(x, bs)
    lowered = jax.jit(_loss_fn(enc)).lower(replicate(params, mesh), x_dp)
    compiled = lowered.compile()
    in_shardings = jax.tree_util.tree_leaves(compiled.input_shardings[0])
    assert any(
        getattr(s, "spec", None) == jax.sharding.PartitionSpec("data")
        for s in in_shardings
    ), "no input stayed sharded over the data axis"

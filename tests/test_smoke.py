"""Smoke-tier mesh coverage: one real data-parallel train step on the
8-device virtual mesh.

The full online-pose and scene-DP trainer programs cost minutes of XLA CPU
compile on this container (see conftest), so the smoke tier validates the
parallel substrate the trainer is built on — `parallel.mesh` sharding +
jit-inserted gradient psum (the DDP-allreduce equivalent, reference
macarons/utility/utils.py setup_device/reduce_tensor semantics) — with one
transformer-Encoder train step instead. Trainer/tester integration runs in
the slow tier (`pytest -m slow`) and nightly via MACARONS_RUN_HEAVY=1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from macarons_tpu.models.attention import Encoder
from macarons_tpu.parallel.mesh import (
    make_mesh, replicate, replicated, shard_batch,
)


def test_mesh_dp_train_step():
    """One DP step over all 8 devices: sharded batch, replicated params,
    XLA-inserted gradient all-reduce; the step must be bitwise independent
    of the device count (grad mean == single-device grad mean)."""
    mesh = make_mesh()
    assert mesh.devices.size == 8

    model = Encoder(embedding_dim=16, qk_dim=8, n_heads=2)
    x_host = np.random.default_rng(0).normal(size=(16, 8, 16)).astype(np.float32)
    y_host = np.roll(x_host, 1, axis=-1)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_host[:1]))
    # SGD keeps the update linear in the gradient, so the 8-way vs 1-way
    # comparison tolerance reflects reduction order only (adam's 1/sqrt(v)
    # amplifies it to O(lr) after one step).
    tx = optax.sgd(1e-2)
    opt_state = tx.init(variables)

    def loss_fn(v, x, y):
        return jnp.mean((model.apply(v, x) - y) ** 2)

    @jax.jit
    def step(v, o, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(v, x, y)
        updates, o = tx.update(grads, o, v)
        return optax.apply_updates(v, updates), o, loss

    # Sharded: batch split 8 ways, params/opt replicated.
    xs = shard_batch(jnp.asarray(x_host), mesh)
    ys = shard_batch(jnp.asarray(y_host), mesh)
    vr = replicate(variables, mesh)
    orr = replicate(opt_state, mesh)
    v1, o1, loss_dp = step(vr, orr, xs, ys)

    # Single-device oracle on the same data.
    v1s, _, loss_1 = step(variables, opt_state,
                          jnp.asarray(x_host), jnp.asarray(y_host))

    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v1s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
    # Updated params must still be replicated (no silent resharding).
    leaf = jax.tree_util.tree_leaves(v1)[0]
    assert leaf.sharding.is_equivalent_to(replicated(mesh), leaf.ndim)
    # And a second step must reuse the compiled executable (loss drops).
    _, _, loss_2 = step(v1, o1, xs, ys)
    assert float(loss_2) < float(loss_dp)

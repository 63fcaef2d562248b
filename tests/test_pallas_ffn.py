"""Fused GEGLU FFN kernel vs the XLA path (interpret mode on the CPU CI
host; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mintime_tpu.models.timesformer import GEGLU
from mintime_tpu.ops.pallas_ffn import geglu_ffn


def _ref(x, w0, b0, w1, b1):
    h = x @ w0 + b0
    val, gates = jnp.split(h, 2, axis=-1)
    return (val * jax.nn.gelu(gates, approximate=False)) @ w1 + b1


@pytest.mark.parametrize("m", [256, 300, 32])  # exact tile / padded / tiny
def test_matches_xla_path(m):
    dim, hidden = 128, 256
    rng = np.random.default_rng(0)
    x = rng.standard_normal((m, dim)).astype(np.float32) * 0.1
    w0 = rng.standard_normal((dim, 2 * hidden)).astype(np.float32) * 0.05
    b0 = rng.standard_normal(2 * hidden).astype(np.float32) * 0.05
    w1 = rng.standard_normal((hidden, dim)).astype(np.float32) * 0.05
    b1 = rng.standard_normal(dim).astype(np.float32) * 0.05
    out = geglu_ffn(jnp.asarray(x), w0, b0, w1, b1)
    ref = _ref(x, w0, b0, w1, b1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_leading_shape_preserved():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 7, 64)).astype(np.float32) * 0.1
    w0 = rng.standard_normal((64, 256)).astype(np.float32) * 0.05
    b0 = np.zeros(256, np.float32)
    w1 = rng.standard_normal((128, 64)).astype(np.float32) * 0.05
    b1 = np.zeros(64, np.float32)
    out = geglu_ffn(jnp.asarray(x), w0, b0, w1, b1)
    assert out.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(x, w0, b0, w1, b1)), atol=1e-4
    )


def test_grads_match_xla_path():
    """custom_vjp backward (recompute + scratch-accumulated weight grads)
    against jax autodiff of the plain path — every input's gradient."""
    m, dim, hidden = 300, 128, 256
    rng = np.random.default_rng(2)
    x = rng.standard_normal((m, dim)).astype(np.float32) * 0.1
    w0 = rng.standard_normal((dim, 2 * hidden)).astype(np.float32) * 0.05
    b0 = rng.standard_normal(2 * hidden).astype(np.float32) * 0.05
    w1 = rng.standard_normal((hidden, dim)).astype(np.float32) * 0.05
    b1 = rng.standard_normal(dim).astype(np.float32) * 0.05
    cot = rng.standard_normal((m, dim)).astype(np.float32)

    loss_k = lambda *a: jnp.vdot(geglu_ffn(*a), cot)
    loss_r = lambda *a: jnp.vdot(_ref(*a), cot)
    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, w0, b0, w1, b1)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, w0, b0, w1, b1)
    for a, b, name in zip(gk, gr, ["x", "w0", "b0", "w1", "b1"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_geglu_module_pallas_flag():
    """GEGLU(use_pallas=True) output and grads equal the module's XLA path
    (shared _Proj params, nn.Dense-compatible tree)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 64)).astype(np.float32) * 0.1
    plain = GEGLU(64, mult=2)
    fused = GEGLU(64, mult=2, use_pallas=True)
    variables = plain.init(jax.random.key(0), jnp.asarray(x))
    assert set(variables["params"]) == {"Dense_0", "Dense_1"}
    assert variables["params"]["Dense_0"]["kernel"].shape == (64, 256)
    ref = plain.apply(variables, jnp.asarray(x))
    out = fused.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def loss(model, params):
        return jnp.sum(model.apply({"params": params}, jnp.asarray(x)) ** 2)

    gr = jax.grad(lambda p: loss(plain, p))(variables["params"])
    gk = jax.grad(lambda p: loss(fused, p))(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3
        ),
        gr, gk,
    )

"""Pallas fused attention kernel vs the XLA reference path (interpret mode
on the CPU CI host; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mintime_tpu.ops.attention import grouped_attention_with_cls
from mintime_tpu.ops.pallas_attention import fused_grouped_attention, mask_to_bias


@pytest.mark.parametrize("axis_shapes", [(4, 49, 16), (4, 16, 49)])  # (H, G, L)
def test_matches_xla_path(axis_shapes):
    H, G, L = axis_shapes
    B, D = 2, 64
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, H, G, L, D)).astype(np.float32) * 0.1
    k = rng.standard_normal((B, H, G, L, D)).astype(np.float32) * 0.1
    v = rng.standard_normal((B, H, G, L, D)).astype(np.float32) * 0.1
    kc = rng.standard_normal((B, H, 1, D)).astype(np.float32) * 0.1
    vc = rng.standard_normal((B, H, 1, D)).astype(np.float32) * 0.1
    mask = rng.random((B, L, 1 + L)) > 0.3
    mask[..., 0] = True  # CLS column always attendable
    for li in range(L):  # self-column attendable so no fully-masked rows
        mask[:, li, 1 + li] = True

    ref = grouped_attention_with_cls(q, k, v, kc, vc, jnp.asarray(mask)[:, None])
    out = fused_grouped_attention(q, k, v, kc, vc, mask_to_bias(jnp.asarray(mask)), heads=H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_no_mask():
    B, H, G, L, D = 1, 2, 8, 16, 32
    rng = np.random.default_rng(1)
    t = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.1
    q, k, v = t(B, H, G, L, D), t(B, H, G, L, D), t(B, H, G, L, D)
    kc, vc = t(B, H, 1, D), t(B, H, 1, D)
    ref = grouped_attention_with_cls(q, k, v, kc, vc, None)
    out = fused_grouped_attention(q, k, v, kc, vc, None, heads=H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


@pytest.mark.slow
def test_model_with_pallas_flag():
    from mintime_tpu.config import ModelConfig
    from mintime_tpu.models.timesformer import SizeInvariantTimeSformer
    from tests.test_timesformer import SMALL, init_params, make_inputs

    x, mask, id_mask, size_emb, positions = make_inputs(SMALL)
    ref_model = SizeInvariantTimeSformer(SMALL)
    params = init_params(ref_model, x, mask, id_mask, size_emb, positions)
    ref_out = jax.jit(ref_model.apply)(params, x, mask, id_mask, size_emb, positions)
    pallas_model = SizeInvariantTimeSformer(SMALL, use_pallas=True)
    out = jax.jit(pallas_model.apply)(params, x, mask, id_mask, size_emb, positions)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=5e-2)

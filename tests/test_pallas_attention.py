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


def _ref_divided(qkv_g, qkv_cls, seq_bias, row_bias, heads, dh):
    """Pure-jnp reference of divided_attention (differentiable)."""
    B, G, L, c3 = qkv_g.shape
    scale = dh ** -0.5
    w = qkv_g.reshape(B, G, L, heads, 3, dh)
    wc = qkv_cls.reshape(B, heads, 3, dh)
    q = w[..., 0, :] * scale  # (B, G, L, H, dh)
    k, v = w[..., 1, :], w[..., 2, :]
    qc = wc[:, :, 0] * scale  # (B, H, dh)
    kc, vc = wc[:, :, 1], wc[:, :, 2]

    lt = jnp.einsum("bglhd,bgmhd->bhglm", q, k)
    lc = jnp.einsum("bglhd,bhd->bhgl", q, kc)[..., None]
    logits = jnp.concatenate([lc, lt], -1)
    if seq_bias is not None:
        logits = logits + seq_bias[:, None, None]  # (B,L,1+L) over heads/groups
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhglm,bgmhd->bglhd", p[..., 1:], v) + jnp.einsum(
        "bhgl,bhd->bglhd", p[..., 0], vc
    )

    lr = jnp.einsum("bhd,bglhd->bhgl", qc, k)
    if row_bias is not None:
        lr = lr + row_bias[:, None]  # broadcast (B,G,L) over heads
    ls = jnp.einsum("bhd,bhd->bh", qc, kc)
    lall = jnp.concatenate([ls[:, :, None], lr.reshape(B, heads, G * L)], -1)
    pc = jax.nn.softmax(lall, axis=-1)
    cls_out = jnp.einsum(
        "bht,bthd->bhd", pc[:, :, 1:], v.reshape(B, G * L, heads, dh)
    ) + pc[:, :, 0][..., None] * vc
    return out.reshape(B, G, L, heads * dh), cls_out.reshape(B, 1, heads * dh)


@pytest.mark.parametrize("axis", ["time", "space"])
def test_divided_attention_grads(axis):
    """custom_vjp backward kernel vs autodiff of the jnp reference."""
    from mintime_tpu.ops.pallas_attention import divided_attention

    B, f, n, H, dh = 2, 6, 4, 2, 32
    inner = H * dh
    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.standard_normal((B, f, n, 3 * inner)) * 0.2, jnp.float32)
    qkvc = jnp.asarray(rng.standard_normal((B, 1, 3 * inner)) * 0.2, jnp.float32)
    mask = np.ones((B, f), bool)
    mask[1, 4:] = False
    fm = np.concatenate([np.ones((B, f, 1), bool),
                         np.broadcast_to(mask[:, None, :], (B, f, f))], -1)
    rb = jnp.where(jnp.asarray(mask), 0.0, -0.7 * np.finfo(np.float32).max)
    if axis == "time":
        args = (qkv.swapaxes(1, 2), qkvc, mask_to_bias(jnp.asarray(fm)),
                rb[:, None, :])
    else:
        args = (qkv, qkvc, None, rb[:, :, None])

    w_tok = jnp.asarray(rng.standard_normal(args[0].shape[:3] + (inner,)), jnp.float32)
    w_cls = jnp.asarray(rng.standard_normal((B, 1, inner)), jnp.float32)

    def loss(fn, q, qc):
        o, oc = fn(q, qc, args[2], args[3], heads=H, dim_head=dh)
        return jnp.sum(o * w_tok) + jnp.sum(oc * w_cls)

    ref_fn = lambda q, qc, sb, rbias, heads, dim_head: _ref_divided(
        q, qc, sb, rbias, heads, dim_head)
    g_ref = jax.grad(lambda q, qc: loss(ref_fn, q, qc), argnums=(0, 1))(
        args[0], qkvc)
    g_pl = jax.grad(lambda q, qc: loss(divided_attention, q, qc), argnums=(0, 1))(
        args[0], qkvc)
    np.testing.assert_allclose(np.asarray(g_pl[0]), np.asarray(g_ref[0]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g_pl[1]), np.asarray(g_ref[1]),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_model_grads_with_pallas_flag():
    """Parameter gradients of the full model: Pallas path vs XLA path."""
    from mintime_tpu.models.timesformer import SizeInvariantTimeSformer
    from tests.test_timesformer import SMALL, init_params, make_inputs

    x, mask, id_mask, size_emb, positions = make_inputs(SMALL)
    ref_model = SizeInvariantTimeSformer(SMALL)
    params = init_params(ref_model, x, mask, id_mask, size_emb, positions)
    pallas_model = SizeInvariantTimeSformer(SMALL, use_pallas=True)

    def loss(model, p):
        out = model.apply(p, x, mask, id_mask, size_emb, positions)
        return jnp.sum(out * jnp.asarray([[1.0], [-0.5]], out.dtype)[: out.shape[0]])

    g_ref = jax.grad(lambda p: loss(ref_model, p))(params)
    g_pl = jax.grad(lambda p: loss(pallas_model, p))(params)
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(g_pl)[0]
    for (path, a), (_, b) in zip(flat_r, flat_p):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("axis", ["time", "space"])
def test_divided_attention_kernel(axis):
    """v2 kernel (packed natural-layout qkv, incl. CLS row) vs XLA path."""
    from mintime_tpu.ops.pallas_attention import divided_attention

    B, f, n, H, dh = 2, 8, 4, 2, 32
    inner = H * dh
    rng = np.random.default_rng(2)
    qkv4 = rng.standard_normal((B, f, n, 3 * inner)).astype(np.float32) * 0.1
    qkvc = rng.standard_normal((B, 1, 3 * inner)).astype(np.float32) * 0.1
    mask = np.ones((B, f), bool)
    mask[1, 5:] = False
    idm = np.ones((B, f, f), bool)
    idm[0, :4, 4:] = idm[0, 4:, :4] = False  # two identities
    fm = np.concatenate([np.ones((B, f, 1), bool), mask[:, None, :] & idm], -1)
    rbias = jnp.where(jnp.asarray(mask), 0.0, -0.7 * np.finfo(np.float32).max)
    if axis == "time":  # caller pre-transposes into grouped layout
        qkv_g = jnp.asarray(qkv4).swapaxes(1, 2)
        seq_bias = mask_to_bias(jnp.asarray(fm))
        row_bias = rbias[:, None, :]
    else:
        qkv_g = jnp.asarray(qkv4)
        seq_bias = None
        row_bias = rbias[:, :, None]

    out_g, out_cls = divided_attention(
        qkv_g, jnp.asarray(qkvc), seq_bias, row_bias, heads=H, dim_head=dh,
    )
    out_tok = out_g.swapaxes(1, 2) if axis == "time" else out_g

    # reference: grouped XLA attention on the unpacked tensors
    # (head-major packing: columns ordered (H, [q|k|v], dh))
    w = qkv4.reshape(B, f, n, H, 3, dh)
    spec = (0, 3, 2, 1, 4) if axis == "time" else (0, 3, 1, 2, 4)
    q_g = np.transpose(w[..., 0, :], spec) * dh ** -0.5
    k_g = np.transpose(w[..., 1, :], spec)
    v_g = np.transpose(w[..., 2, :], spec)
    wc = qkvc.reshape(B, H, 3, dh)
    kc, vc = wc[:, :, 1][:, :, None], wc[:, :, 2][:, :, None]
    gmask = jnp.asarray(fm)[:, None] if axis == "time" else None
    ref_g = grouped_attention_with_cls(
        jnp.asarray(q_g), jnp.asarray(k_g), jnp.asarray(v_g), kc, vc, gmask
    )
    back = (0, 3, 2, 1, 4) if axis == "time" else (0, 2, 3, 1, 4)
    ref_tok = np.transpose(np.asarray(ref_g), back).reshape(B, f, n, inner)
    np.testing.assert_allclose(np.asarray(out_tok), ref_tok, atol=2e-2, rtol=2e-2)

    # CLS row reference: full softmax over all tokens + self
    qc = wc[:, :, 0] * dh ** -0.5  # (B, H, dh)
    k_tok = w[..., 1, :].reshape(B, f * n, H, dh)
    v_tok = w[..., 2, :].reshape(B, f * n, H, dh)
    lt = np.einsum("bhd,bthd->bht", qc, k_tok)
    lt[~np.repeat(mask, n, -1)[:, None, :].repeat(H, 1)] = -np.inf
    ls = np.einsum("bhd,bhd->bh", qc, wc[:, :, 1])
    lall = np.concatenate([ls[:, :, None], lt], -1)
    p = np.exp(lall - lall.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref_cls = np.einsum("bht,bthd->bhd", p[:, :, 1:], v_tok) + p[:, :, 0][
        :, :, None
    ] * wc[:, :, 2]
    np.testing.assert_allclose(
        np.asarray(out_cls)[:, 0], ref_cls.reshape(B, inner), atol=2e-2, rtol=2e-2
    )


class TestTiledTokenRows:
    """G-tiled token-row kernel + XLA CLS row (the large-G regime the
    conv-TimeSformer's channel-token time axis needs) must match the
    whole-slice kernel exactly, forward and backward."""

    def _inputs(self, B=2, G=12, L=8, H=2, dh=16, seed=0):
        rng = np.random.default_rng(seed)
        c3 = 3 * H * dh
        qkv_g = rng.standard_normal((B, G, L, c3)).astype(np.float32)
        qkv_cls = rng.standard_normal((B, 1, c3)).astype(np.float32)
        fm = rng.random((B, L, 1 + L)) > 0.2
        fm[..., 0] = True
        fm |= ~fm.any(-1, keepdims=True)
        seq_bias = np.where(fm, 0.0, -1e9).astype(np.float32)
        row_bias = np.where(rng.random((B, G, 1)) > 0.2, 0.0, -1e9).astype(
            np.float32
        )
        return jnp.asarray(qkv_g), jnp.asarray(qkv_cls), jnp.asarray(
            seq_bias
        ), jnp.asarray(row_bias), H, dh

    def test_forward_matches_whole_slice(self):
        from mintime_tpu.ops.pallas_attention import (
            _cls_row_xla,
            _divided_attention_core,
            _token_rows_core,
        )

        qkv_g, qkv_cls, seq_bias, row_bias, H, dh = self._inputs()
        want_tok, want_cls = _divided_attention_core(
            qkv_g, qkv_cls, seq_bias, row_bias, H, dh
        )
        got_tok = _token_rows_core(qkv_g, qkv_cls, seq_bias, H, dh)
        got_cls = _cls_row_xla(qkv_g, qkv_cls, row_bias, H, dh)
        np.testing.assert_allclose(np.asarray(got_tok), np.asarray(want_tok),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_cls), np.asarray(want_cls),
                                   atol=1e-5, rtol=1e-5)

    def test_grads_match_whole_slice(self):
        from mintime_tpu.ops.pallas_attention import (
            _cls_row_xla,
            _divided_attention_core,
            _token_rows_core,
        )

        qkv_g, qkv_cls, seq_bias, row_bias, H, dh = self._inputs(seed=3)

        def loss_whole(qkv_g, qkv_cls):
            t, c = _divided_attention_core(qkv_g, qkv_cls, seq_bias, row_bias,
                                           H, dh)
            return (jnp.sum(t * t) + jnp.sum(c * c)).astype(jnp.float32)

        def loss_tiled(qkv_g, qkv_cls):
            t = _token_rows_core(qkv_g, qkv_cls, seq_bias, H, dh)
            c = _cls_row_xla(qkv_g, qkv_cls, row_bias, H, dh)
            return (jnp.sum(t * t) + jnp.sum(c * c)).astype(jnp.float32)

        gw = jax.grad(loss_whole, argnums=(0, 1))(qkv_g, qkv_cls)
        gt = jax.grad(loss_tiled, argnums=(0, 1))(qkv_g, qkv_cls)
        for a, b in zip(gt, gw):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4)

    def test_dispatch_picks_tiled_for_large_G(self):
        """divided_attention routes big slices through the tiled path (the
        whole-slice kernel would exceed its VMEM budget)."""
        from mintime_tpu.ops import pallas_attention as pa

        B, G, L, H, dh = 1, 1280, 8, 2, 64
        c3 = 3 * H * dh
        assert G * L * c3 * 2 > pa._WHOLE_SLICE_BYTES  # bf16 itemsize 2
        rng = np.random.default_rng(1)
        qkv_g = jnp.asarray(
            rng.standard_normal((B, G, L, c3)), dtype=jnp.bfloat16
        )
        qkv_cls = jnp.asarray(
            rng.standard_normal((B, 1, c3)), dtype=jnp.bfloat16
        )
        out_tok, out_cls = pa.divided_attention(
            qkv_g, qkv_cls, None, None, heads=H, dim_head=dh
        )
        assert out_tok.shape == (B, G, L, H * dh)
        assert out_cls.shape == (B, 1, H * dh)
        assert np.isfinite(np.asarray(out_tok, np.float32)).all()
        tg = pa._pick_group_tile(G, L, c3, 2)
        assert G % tg == 0 and tg > 1

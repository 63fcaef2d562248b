"""Fused GEGLU feed-forward Pallas TPU kernel.

The TimeSformer FF (reference size_invariant_timesformer.py:60-76) is
``Dense(dim→2·4·dim) → val·gelu(gates) → Dense(4·dim→dim)``. In the XLA
path the ``(tokens, 4096)``-wide intermediate round-trips through HBM and
the down-projection reads it back at ~210 GB/s — profiled at 1.76 ms per
32-video batch per layer, ~25% of the whole flagship forward across the 8
layers. This kernel tiles over token rows and keeps the wide intermediate
in VMEM: per grid cell, ``x_tile @ W0`` → bias + GEGLU gate → ``@ W1`` run
back-to-back on the MXU; HBM traffic is read-x + write-out plus the
weights once (their blocks have constant index maps, so Pallas keeps them
resident across grid steps).

Training uses the same fusion through ``jax.custom_vjp``: the backward
kernel recomputes the gated intermediate per row tile (flash-style — the
(tokens, 4096) tensor never exists in HBM in either direction) and
accumulates the weight/bias gradients in fp32 VMEM scratch across the
sequential TPU grid, writing them once at the last step.

Numerics match the bf16 XLA path op-for-op: both matmuls accumulate fp32
on the MXU and cast to the compute dtype where flax's ``Dense`` would;
gelu is the exact (erf) variant (PARITY.md "Replicated exactly").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational approximation (|err| < 1.5e-7 —
    below bf16 resolution); Mosaic has no erf lowering."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(z):
    return 0.5 * z * (1.0 + _erf(z * _INV_SQRT2))


def _dgelu_exact(z):
    cdf = 0.5 * (1.0 + _erf(z * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI
    return cdf + z * pdf


def _fwd_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, o_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w0_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = (h + b0_ref[...].astype(jnp.float32)).astype(x.dtype)
    half = h.shape[-1] // 2
    # gate math in fp32: Mosaic has no bf16 compare (sign/abs in _erf), and
    # fp32 keeps the erf polynomial at full precision
    prod = (
        h[:, :half].astype(jnp.float32) * _gelu_exact(h[:, half:].astype(jnp.float32))
    ).astype(x.dtype)
    o = jax.lax.dot_general(
        prod, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (o + b1_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel(x_ref, w0_ref, b0_ref, w1_ref, dout_ref,
                dx_ref, dw0_ref, db0_ref, dw1_ref, db1_ref,
                dw0_acc, db0_acc, dw1_acc, db1_acc):
    i = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(i == 0)
    def _init():
        dw0_acc[...] = jnp.zeros_like(dw0_acc)
        db0_acc[...] = jnp.zeros_like(db0_acc)
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)

    x = x_ref[...]
    dout = dout_ref[...]
    # recompute the forward intermediate exactly (incl. the bf16 cast)
    h = jax.lax.dot_general(
        x, w0_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    h = (h + b0_ref[...].astype(f32)).astype(x.dtype)
    half = h.shape[-1] // 2
    val = h[:, :half].astype(f32)
    gates = h[:, half:].astype(f32)
    g = _gelu_exact(gates)
    prod = (val * g).astype(x.dtype)

    # d prod = dout @ W1ᵀ
    dprod = jax.lax.dot_general(
        dout, w1_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    dw1_acc[...] += jax.lax.dot_general(
        prod, dout, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    db1_acc[...] += jnp.sum(dout.astype(f32), axis=0, keepdims=True)

    dval = dprod * g
    dgates = dprod * val * _dgelu_exact(gates)
    dh = jnp.concatenate([dval, dgates], axis=-1).astype(x.dtype)

    dx_ref[...] = jax.lax.dot_general(
        dh, w0_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=f32
    ).astype(dx_ref.dtype)
    dw0_acc[...] += jax.lax.dot_general(
        x, dh, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    db0_acc[...] += jnp.sum(dh.astype(f32), axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        dw0_ref[...] = dw0_acc[...].astype(dw0_ref.dtype)
        db0_ref[...] = db0_acc[...].astype(db0_ref.dtype)
        dw1_ref[...] = dw1_acc[...].astype(dw1_ref.dtype)
        db1_ref[...] = db1_acc[...].astype(db1_ref.dtype)


_TM = 256  # row-tile; 4 MB of fp32 intermediate per tile in VMEM


def _full(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


def _rows(shape):
    return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                        memory_space=pltpu.VMEM)


def _fwd_call(x2, w0, b0, w1, b1):
    m, dim = x2.shape
    two_h = w0.shape[1]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(m // _TM,),
        interpret=jax.default_backend() == "cpu",  # CI runs on CPU
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            _rows((_TM, dim)),
            _full((dim, two_h)),
            _full((1, two_h)),
            _full((two_h // 2, dim)),
            _full((1, dim)),
        ],
        out_specs=_rows((_TM, dim)),
        out_shape=jax.ShapeDtypeStruct((m, dim), x2.dtype),
    )(x2, w0, b0.reshape(1, -1), w1, b1.reshape(1, -1))


def _bwd_call(x2, w0, b0, w1, dout):
    m, dim = x2.shape
    two_h = w0.shape[1]
    h = two_h // 2
    f32 = jnp.float32
    dx, dw0, db0, dw1, db1 = pl.pallas_call(
        _bwd_kernel,
        grid=(m // _TM,),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            _rows((_TM, dim)),
            _full((dim, two_h)),
            _full((1, two_h)),
            _full((h, dim)),
            _rows((_TM, dim)),
        ],
        out_specs=[
            _rows((_TM, dim)),
            _full((dim, two_h)),
            _full((1, two_h)),
            _full((h, dim)),
            _full((1, dim)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, dim), x2.dtype),
            jax.ShapeDtypeStruct((dim, two_h), f32),
            jax.ShapeDtypeStruct((1, two_h), f32),
            jax.ShapeDtypeStruct((h, dim), f32),
            jax.ShapeDtypeStruct((1, dim), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((dim, two_h), f32),
            pltpu.VMEM((1, two_h), f32),
            pltpu.VMEM((h, dim), f32),
            pltpu.VMEM((1, dim), f32),
        ],
    )(x2, w0, b0.reshape(1, -1), w1, dout)
    return dx, dw0, db0[0], dw1, db1[0]


@jax.custom_vjp
def _geglu_core(x2, w0, b0, w1, b1):
    return _fwd_call(x2, w0, b0, w1, b1)


def _core_fwd(x2, w0, b0, w1, b1):
    return _fwd_call(x2, w0, b0, w1, b1), (x2, w0, b0, w1, b1)


def _core_bwd(res, dout):
    x2, w0, b0, w1, b1 = res
    dx, dw0, db0, dw1, db1 = _bwd_call(x2, w0, b0, w1, dout.astype(x2.dtype))
    return (
        dx,
        dw0.astype(w0.dtype),
        db0.astype(b0.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
    )


_geglu_core.defvjp(_core_fwd, _core_bwd)


def geglu_ffn(x, w0, b0, w1, b1):
    """Fused ``(x @ w0 + b0) → val·gelu(gates) → (· @ w1 + b1)``.

    Args:
      x: (..., dim) activations (any leading shape; rows are flattened).
      w0: (dim, 2·hidden), b0: (2·hidden,) — the up-projection. The GEGLU
        split convention is ``val = h[..., :hidden]``, ``gates =
        h[..., hidden:]`` (reference :60-76).
      w1: (hidden, dim), b1: (dim,) — the down-projection.
    Returns (..., dim) in x's dtype. Differentiable (fused backward).
    """
    dim = x.shape[-1]
    x2 = x.reshape(-1, dim)
    m = x2.shape[0]
    mp = -(-m // _TM) * _TM
    if mp > m:  # pad rows so the row grid is exact; sliced off below
        x2 = jnp.concatenate([x2, jnp.zeros((mp - m, dim), x2.dtype)])
    out = _geglu_core(x2, w0, b0, w1, b1)
    return out[:m].reshape(x.shape)

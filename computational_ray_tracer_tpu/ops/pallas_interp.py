"""Pallas TPU kernel for dense-spectrum interpolation (the per-bounce
DenselySampledSpectrum evaluation, spectrum.h:376-456 capability).

The XLA one-hot formulation of ``W @ tables`` materializes W —
(n·S, 471) ≈ 1 GB per bounce at 256² — in HBM; the whole stage is bound
by that traffic (measured ~4.2 ms regardless of matmul precision,
benchmarks/profile_intersect.py). This kernel builds each ray-block's
one-hot IN VMEM (never written to HBM), runs two exact 0/1 bf16 MXU dots
(hi/lo split keeps f32-grade table precision) and lerps in f32:
HBM traffic drops to the in/out vectors (~30 MB), ~30x less.

Numerics: 0/1 are exact in bf16; the hi/lo split (hi = bf16(T),
lo = T - hi, itself bf16-exact to 2^-18 relative) makes each selected row
f32-faithful; the interpolation weight never enters a matmul.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2048          # rows per grid step: big enough that the per-step
                    # grid overhead (~2-4 us) amortizes — at 512 the whole
                    # kernel was overhead-bound (1024 steps ~ 4 ms); the
                    # (BLK, K_PAD) bf16 one-hots are 2 MB each, well inside
                    # the scoped-VMEM budget.
K_PAD = 512         # 471 table rows padded to the MXU K tile
C_MAX = 128         # column limit (one lane tile)


def _interp_kernel(i0_ref, w_ref, thi_ref, tlo_ref, out_ref):
    fi = i0_ref[...]                                 # (BLK, 1) int32
    w = w_ref[...]                                   # (BLK, 1) f32
    j = jax.lax.broadcasted_iota(jnp.int32, (BLK, K_PAD), 1)
    w0 = (j == fi).astype(jnp.bfloat16)              # exact 0/1
    w1 = (j == fi + 1).astype(jnp.bfloat16)
    thi = thi_ref[...]
    tlo = tlo_ref[...]

    def sel(wm):
        return (jnp.dot(wm, thi, preferred_element_type=jnp.float32)
                + jnp.dot(wm, tlo, preferred_element_type=jnp.float32))

    v0 = sel(w0)                                     # (BLK, C) f32
    v1 = sel(w1)
    out_ref[...] = v0 * (1.0 - w) + v1 * w


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_interp_pallas(tables, i0, w, interpret=False):
    """tables (K, C) f32, i0 (n,) int32 in [0, K-2], w (n,) f32 ->
    (n, C) f32: rows lerped as tables[i0]*(1-w) + tables[i0+1]*w."""
    k, c = tables.shape
    assert k <= K_PAD and c <= C_MAX, (k, c)
    n = i0.shape[0]
    n_pad = -(-n // BLK) * BLK

    # K is padded for the MXU; C is NOT padded — the out block's last dim
    # equals the array's (legal per Mosaic), so the kernel writes only
    # (n, C) to HBM (a 128-wide padded output at C=15 would move ~9x the
    # bytes and made the full render pass *slower* than the XLA one-hot).
    thi32 = jnp.zeros((K_PAD, c), jnp.float32).at[:k, :].set(
        tables.astype(jnp.bfloat16).astype(jnp.float32))
    tlo = jnp.zeros((K_PAD, c), jnp.bfloat16).at[:k, :].set(
        (tables - tables.astype(jnp.bfloat16).astype(jnp.float32)
         ).astype(jnp.bfloat16))
    thi = thi32.astype(jnp.bfloat16)

    i0p = jnp.zeros((n_pad,), jnp.int32).at[:n].set(i0)
    wp = jnp.zeros((n_pad,), jnp.float32).at[:n].set(w)

    out = pl.pallas_call(
        _interp_kernel,
        grid=(n_pad // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        interpret=interpret,
    )(i0p.reshape(-1, 1), wp.reshape(-1, 1), thi, tlo)
    return out[:n, :]

"""Pallas TPU kernel: fused snake-residual-unit stack for codec decoders.

The Qwen3 codec decoder (codecs/qwen3_codec.py, reference
qwen3_codec.py:399-470) spends ~75% of the 103 ms detokenize call in four
blocks of three chained residual units, each
``x + conv1x1(snake(conv_k7_dil(snake(x))))``. In XLA each unit costs
~16.5 ms at (B=80, C=96, T=19200) while its two convs alone cost ~6 ms
isolated (artifacts/conv_forms_r4.md): the two snake activations and the
1x1 conv each round-trip the (B, T, C) activation through HBM, and C=96
wastes 25% of the MXU's 128 lanes.

This kernel runs the WHOLE 3-unit stack for one batch row in VMEM:

  grid = (B,); per program: load x (T, C) once, then for each unit
  (dilations 1, 3, 9): snake1 (f32, VPU) -> causal dilated conv as k=7
  shifted (T, C) @ (C, C) MXU matmuls accumulated in f32 -> snake2 ->
  1x1 conv (one matmul) -> residual add. HBM traffic: read x + write out
  (+ weights), ~1/6 of the XLA path. C is zero-padded to a 128 multiple
  by the wrapper (exact: zero channels stay zero through snake, zero
  weight rows/cols, and the residual).

Streaming-cache semantics match codecs/qwen3_codec.py:_residual_unit
exactly: the per-unit cache is the last ``6*dil`` samples of the SNAKED
pre-conv signal; the kernel consumes it as the conv halo and emits the
new tails as extra outputs. The full (non-streaming) path passes zero
halos, which is identical to the XLA path's zero padding of the snaked
signal.

MEASURED OUTCOME (TPU v5e, scripts/drive_pallas_resunit.py,
artifacts/pallas_resunit_tpu.md): the kernel LOSES at the shapes it was
built for — 0.91x at C=96 and 0.93x at C=192 (1.02-1.04x at the wide
blocks) — and shows a real-TPU-only numeric divergence at C=96
(max_rel_err 0.14 vs 0.01 elsewhere; interpret-mode parity is clean).
Root cause of the non-win: scripts/exp_snake_cost.py shows the stack is
VPU-sin-bound (58% of the XLA chain is the snake transcendental), not
HBM-bound — the kernel saves HBM traffic that wasn't the bottleneck and
adds 33% VPU work at C=96 from the 128-lane channel pad. It is therefore
OPT-IN ONLY (VOX_FUSED_RESUNIT=1); the serving default stays on the XLA
path. Kept as a tested, documented experiment: the wrapper, cache
semantics, and interpret-mode parity are sound (tests/test_pallas_resunit.py,
tests/test_qwen3_codec_fused.py) and the kernel is the starting point if a
cheaper snake ever lands.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KERNEL_SIZE = 7  # all codec residual units use k=7 (reference dac-style)


def use_fused_resunit() -> bool:
    """Gate: OFF by default everywhere — the kernel measured slower than
    the XLA path at the narrow detok blocks (see module docstring).
    VOX_FUSED_RESUNIT=1 opts in (interpret mode off-TPU, for the codec
    integration test of the fused path)."""
    return os.environ.get("VOX_FUSED_RESUNIT", "0") != "0"


def default_interpret() -> bool:
    """Pallas TPU kernels only lower on TPU; everywhere else interpret."""
    return jax.default_backend() != "tpu"


def _snake(x, af, binv):
    # x + (1/(exp(beta)+eps)) * sin(exp(alpha) * x)^2, computed in f32;
    # af/binv are precomputed (1, C) f32 rows
    return x + binv * jnp.square(jnp.sin(x * af))


def _kernel(x_ref, c_refs, w1t_ref, b1_ref, w2t_ref, b2_ref,
            af1_ref, bi1_ref, af2_ref, bi2_ref,
            out_ref, nc_refs, ypad_ref, *, dilations, T, C):
    h = x_ref[0]  # (T, C) serving dtype (bf16 / f32)
    cdt = x_ref.dtype
    for u, dil in enumerate(dilations):
        pad = (KERNEL_SIZE - 1) * dil
        hf = h.astype(jnp.float32)
        y = _snake(hf, af1_ref[u], bi1_ref[u])
        yb = y.astype(cdt)
        # new cache: last `pad` samples of the snaked signal (chunks are
        # always longer than the widest halo; wrapper asserts)
        nc_refs[u][0] = yb[T - pad:]
        # halo || snaked signal, staged in scratch (avoids a VMEM concat)
        ypad_ref[0:pad] = c_refs[u][0]
        ypad_ref[pad:pad + T] = yb
        acc = jnp.broadcast_to(b1_ref[u], (T, C)).astype(jnp.float32)
        for j in range(KERNEL_SIZE):
            acc = acc + jax.lax.dot(
                ypad_ref[j * dil:j * dil + T], w1t_ref[u, j],
                preferred_element_type=jnp.float32)
        z = _snake(acc, af2_ref[u], bi2_ref[u])
        o = jax.lax.dot(z.astype(cdt), w2t_ref[u],
                        preferred_element_type=jnp.float32) + b2_ref[u]
        h = (hf + o).astype(cdt)
    out_ref[0] = h


def _pack_params(units, C, Cp, dtype=jnp.bfloat16):
    """Stack per-unit params; zero-pad channels C -> Cp.

    units: list of dicts with alpha1/beta1/conv1{w,b}/alpha2/beta2/conv2{w,b}
    (conv w layout (Cout, Cin, k) as in codecs/layers.py).
    Returns (w1t, b1, w2t, b2, af1, bi1, af2, bi2) with shapes
    (U, 7, Cp, Cp), (U, 1, Cp) f32, (U, Cp, Cp), (U, 1, Cp) f32, and
    (U, 1, Cp) f32 x4. All built at trace time inside the jitted detok
    executable — XLA folds/hoists them once per call.
    """
    U = len(units)

    def padc(a, axes):
        pads = [(0, 0)] * a.ndim
        for ax in axes:
            pads[ax] = (0, Cp - C)
        return jnp.pad(a, pads)

    def bias(u, key):
        b = u[key].get("b")
        if b is None:
            return jnp.zeros((1, Cp), jnp.float32)
        return padc(b.astype(jnp.float32)[None], (1,))

    w1t = jnp.stack([
        padc(u["conv1"]["w"].astype(dtype), (0, 1)).transpose(2, 1, 0)
        for u in units])                                  # (U, 7, Cp, Cp)
    w2t = jnp.stack([
        padc(u["conv2"]["w"][:, :, 0].astype(dtype), (0, 1)).T
        for u in units])                                  # (U, Cp, Cp)
    b1 = jnp.stack([bias(u, "conv1") for u in units])     # (U, 1, Cp)
    b2 = jnp.stack([bias(u, "conv2") for u in units])
    # snake params: af = exp(alpha), binv = 1/(exp(beta)+1e-9); padded
    # channels get af=0, binv=0 so snake(0) = 0 (exactness of the pad)
    def sn(u, a_key, b_key):
        af = jnp.exp(u[a_key].astype(jnp.float32))[None]
        bi = 1.0 / (jnp.exp(u[b_key].astype(jnp.float32)) + 1e-9)[None]
        return padc(af, (1,)), padc(bi, (1,))

    af1, bi1 = zip(*[sn(u, "alpha1", "beta1") for u in units])
    af2, bi2 = zip(*[sn(u, "alpha2", "beta2") for u in units])
    return (w1t, b1, w2t, b2, jnp.stack(af1), jnp.stack(bi1),
            jnp.stack(af2), jnp.stack(bi2))


def fused_resunit_stack(x, units, caches, dilations=(1, 3, 9), *,
                        interpret=False):
    """Run a chained residual-unit stack (codecs/qwen3_codec.py
    ``_residual_unit`` x len(dilations)) as one fused Pallas call.

    x: (B, C, T) NCH activation (bf16 serving dtype).
    units: per-unit param dicts (see _pack_params).
    caches: per-unit conv caches (B, C, 6*dil) NCH (the snaked tails), or
        None for the full/non-streaming path (zero halos).
    Returns (out (B, C, T), new_caches list — None when caches is None).
    """
    B, C, T = x.shape
    U = len(dilations)
    if U != 3:
        raise ValueError("kernel is specialized to 3-unit stacks")
    max_pad = (KERNEL_SIZE - 1) * max(dilations)
    if T <= max_pad:
        raise ValueError(f"chunk T={T} must exceed the widest halo {max_pad}")
    Cp = ((C + 127) // 128) * 128
    dtype = x.dtype

    xh = x.transpose(0, 2, 1)                         # (B, T, C)
    if Cp != C:
        xh = jnp.pad(xh, ((0, 0), (0, 0), (0, Cp - C)))
    packed = _pack_params(units, C, Cp, dtype=dtype)

    cs = []
    for u, dil in enumerate(dilations):
        pad = (KERNEL_SIZE - 1) * dil
        if caches is None:
            cs.append(jnp.zeros((B, pad, Cp), dtype))
        else:
            ch = caches[u].transpose(0, 2, 1).astype(dtype)  # (B, pad, C)
            if Cp != C:
                ch = jnp.pad(ch, ((0, 0), (0, 0), (0, Cp - C)))
            cs.append(ch)

    def kern(x_ref, c1, c2, c3, w1t, b1, w2t, b2, af1, bi1, af2, bi2,
             out_ref, n1, n2, n3, ypad):
        _kernel(x_ref, (c1, c2, c3), w1t, b1, w2t, b2, af1, bi1, af2, bi2,
                out_ref, (n1, n2, n3), ypad, dilations=dilations, T=T, C=Cp)

    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim)
    row = lambda shp: pl.BlockSpec((1,) + shp, lambda b: (b, 0, 0))
    pads = [(KERNEL_SIZE - 1) * d for d in dilations]
    out, n1, n2, n3 = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[row((T, Cp))] + [row((p, Cp)) for p in pads]
        + [full(p) for p in packed],
        out_specs=[row((T, Cp))] + [row((p, Cp)) for p in pads],
        out_shape=[jax.ShapeDtypeStruct((B, T, Cp), dtype)]
        + [jax.ShapeDtypeStruct((B, p, Cp), dtype) for p in pads],
        scratch_shapes=[pltpu.VMEM((T + max_pad, Cp), dtype)],
        # default scoped-vmem budget is ~16M; the biggest block
        # (C=768: 24.8M of stacked conv weights) plus f32 temporaries
        # needs more — cap well under the 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xh, *cs, *packed)

    out = out[..., :C].transpose(0, 2, 1)             # (B, C, T)
    if caches is None:
        return out, [None] * U
    new_caches = [n[..., :C].transpose(0, 2, 1)
                  for n in (n1, n2, n3)[:U]]
    return out, new_caches

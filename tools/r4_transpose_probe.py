"""Hypothesis probe: are the short-L attention dots transpose-bound?

The flash kernel's QK^T is ``dot_general([G,L,D], [G,L,D], contract lane
dims)``. The MXU consumes A[M(sub),K(lane)] x B[K(sub),N(lane)], so a
lane-lane contraction forces Mosaic to relayout (transpose) one operand per
(batch row, head) — at L=77, D=64 that's 256 tiny [77,64] transposes per
program, plausibly dwarfing the ~29-cycle matmuls (measured: the kernel
runs at 1.8 TF/s at text shapes vs 196 peak).

Measures three minimal kernels at text shapes [B=1024, L=77, H=8, D=64]:
  natural   S = dot(q, k) contracting lanes        (what the kernel does)
  pret      S = dot(q, kT) lane-sublane            (kT precomputed by XLA)
  pv        O = dot(p, v) lane-sublane             (reference point: the PV
                                                    dot is already natural)
Usage: python tools/r4_transpose_probe.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, H, D = 1024, 77, 8, 64
HD = H * D
G = 32

_LL = (((2,), (2,)), ((0,), (0,)))   # [G,L,D] x [G,L,D] -> [G,L,L] (lane-lane)
_LS = (((2,), (1,)), ((0,), (0,)))   # [G,L,D] x [G,D,L] -> [G,L,L] (lane-sub)


def _kern_natural(q_ref, k_ref, o_ref):
    acc = jnp.zeros((G, L, L), jnp.float32)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, :, sl].astype(jnp.bfloat16)
        k = k_ref[:, :, sl].astype(jnp.bfloat16)
        acc += jax.lax.dot_general(q, k, _LL, preferred_element_type=jnp.float32)
    o_ref[...] = acc


def _kern_pret(q_ref, kt_ref, o_ref):
    acc = jnp.zeros((G, L, L), jnp.float32)
    for h in range(H):
        q = q_ref[:, :, h * D:(h + 1) * D].astype(jnp.bfloat16)
        kt = kt_ref[:, h * D:(h + 1) * D, :].astype(jnp.bfloat16)
        acc += jax.lax.dot_general(q, kt, _LS, preferred_element_type=jnp.float32)
    o_ref[...] = acc


def _kern_pv(p_ref, v_ref, o_ref):
    acc = jnp.zeros((G, L, D), jnp.float32)
    for h in range(H):
        v = v_ref[:, :, h * D:(h + 1) * D].astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            p_ref[...].astype(jnp.bfloat16), v, _LS[:1] + (((0,), (0,)),),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc


def run(name, kern, a_shape, b_shape, o_shape, flops):
    from perf_lab import timeit_looped

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(a_shape), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(b_shape), jnp.bfloat16)

    def call(a, b):
        spec = lambda shp: pl.BlockSpec(  # noqa: E731
            (G,) + shp[1:], lambda i: (i,) + (0,) * (len(shp) - 1),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(a.shape[0] // G,),
            in_specs=[spec(a_shape), spec(b_shape)],
            out_specs=spec(o_shape),
            out_shape=jax.ShapeDtypeStruct(o_shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        )(a, b)

    t = timeit_looped(call, (a, b))
    print(f"{name:10s}: {t*1e3:8.2f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)


def main():
    fl = 2 * B * H * L * L * D
    run("natural", _kern_natural, (B, L, HD), (B, L, HD), (B, L, L), fl)
    run("pret", _kern_pret, (B, L, HD), (B, HD, L), (B, L, L), fl)
    run("pv", _kern_pv, (B, L, L), (B, L, HD), (B, L, D), fl)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

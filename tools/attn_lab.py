"""Attention kernel experiments (round 2): find a faster fwd/bwd design.

Variants vs the round-1 packed-head kernel (kernels/attention.py):
  v1G — current design (in-kernel lane slices per head), larger G via a
        raised VMEM limit
  v3  — [B, H, L, D] layout: grid (B/G, H), per-head blocks are full
        trailing dims (197, 64) so no in-kernel lane shifting; XLA does the
        packed->BHLD transposes outside
  xpose — cost of the [B,L,H*D] -> [B,H,L,D] transpose alone

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/attn_lab.py
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.perf_lab import timeit_looped

_QKT = (((2,), (2,)), ((0,), (0,)))
_PV = (((2,), (1,)), ((0,), (0,)))
_PT_DO = (((1,), (1,)), ((0,), (0,)))

B, L, H, D = 512, 197, 12, 64
HD = H * D
FWD_FLOPS = 4 * B * H * L * L * D
BWD_FLOPS = 11 * B * H * L * L * D


# ---------------------------------------------------------------- v1G ----
def _fwd_kernel_v1(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, H, D):
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(q, k, _QKT, preferred_element_type=jnp.float32)
        s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, _PV, preferred_element_type=jnp.float32
        ) / l
        o_ref[:, :, sl] = o.astype(o_ref.dtype)
        lse_ref[:, h, :] = m[..., 0] + jnp.log(l[..., 0])


def fwd_v1g(q, k, v, G):
    scale = D ** -0.5
    tile = pl.BlockSpec((G, L, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((G, H, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v1, scale=scale, H=H, D=D),
        grid=(B // G,),
        in_specs=[tile, tile, tile],
        out_specs=[tile, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, HD), q.dtype),
            jax.ShapeDtypeStruct((B, H, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(q, k, v)


# ----------------------------------------------------------------- v3 ----
def _fwd_kernel_v3(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    q = q_ref[:, 0]                 # [G, L, D]
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    s = jax.lax.dot_general(q, k, _QKT, preferred_element_type=jnp.float32)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, _PV, preferred_element_type=jnp.float32
    ) / l
    o_ref[:, 0] = o.astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l))[..., 0]


def fwd_v3(qb, kb, vb, G):
    """qb/kb/vb: [B, H, L, D]."""
    scale = D ** -0.5
    tile = pl.BlockSpec((G, 1, L, D), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, G, L), lambda i, h: (h, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v3, scale=scale),
        grid=(B // G, H),
        in_specs=[tile, tile, tile],
        out_specs=[tile, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, D), qb.dtype),
            jax.ShapeDtypeStruct((H, B, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(qb, kb, vb)


def fwd_v3_packed(q, k, v, G):
    """Packed [B,L,HD] in/out with XLA transposes around the BHLD kernel."""
    qb = q.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    kb = k.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    vb = v.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    o, lse = fwd_v3(qb, kb, vb, G)
    return o.transpose(0, 2, 1, 3).reshape(B, L, HD), lse


def _bwd_kernel_v3(q_ref, k_ref, v_ref, do_ref, lse_ref,
                   dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[:, 0]
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    do = do_ref[:, 0]
    lse = lse_ref[0]

    s = jax.lax.dot_general(q, k, _QKT, preferred_element_type=jnp.float32)
    s = s * scale
    p = jnp.exp(s - lse[..., None])
    pb = p.astype(jnp.bfloat16)
    dv = jax.lax.dot_general(pb, do, _PT_DO, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, _QKT, preferred_element_type=jnp.float32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(jnp.bfloat16)
    dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32)
    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)


def bwd_v3(qb, kb, vb, dob, lse, G):
    scale = D ** -0.5
    tile = pl.BlockSpec((G, 1, L, D), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, G, L), lambda i, h: (h, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_v3, scale=scale),
        grid=(B // G, H),
        in_specs=[tile, tile, tile, tile, lse_spec],
        out_specs=[tile, tile, tile],
        out_shape=[jax.ShapeDtypeStruct((B, H, L, D), qb.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(qb, kb, vb, dob, lse)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, HD)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, HD)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, HD)), dtype=jnp.bfloat16)

    from latteclip_tpu.kernels.attention import _flash_fwd_impl
    o1, lse1 = jax.jit(lambda q, k, v: _flash_fwd_impl(q, k, v, False, H))(q, k, v)

    # correctness of v3 vs v1
    o3, lse3 = jax.jit(lambda q, k, v: fwd_v3_packed(q, k, v, 8))(q, k, v)
    print("v3 vs v1: max|o|err =",
          float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o3.astype(jnp.float32)))),
          " max|lse|err =", float(jnp.max(jnp.abs(lse1 - jnp.transpose(lse3, (1, 0, 2))))), flush=True)

    t = timeit_looped(lambda q, k, v: _flash_fwd_impl(q, k, v, False, H)[0], (q, k, v))
    print(f"v1  fwd G=8 (current): {t*1e3:7.2f} ms  {FWD_FLOPS/t/1e12:6.1f} TF/s", flush=True)

    for G in (16, 32):
        t = timeit_looped(lambda q, k, v: fwd_v1g(q, k, v, G)[0], (q, k, v))
        print(f"v1G fwd G={G:3d}:        {t*1e3:7.2f} ms  {FWD_FLOPS/t/1e12:6.1f} TF/s", flush=True)

    # transpose-only cost
    t = timeit_looped(
        lambda q: q.reshape(B, L, H, D).transpose(0, 2, 1, 3).transpose(0, 2, 1, 3).reshape(B, L, HD) * 1.0,
        (q,), iters=10)
    print(f"xpose there+back:      {t*1e3:7.2f} ms", flush=True)

    for G in (8, 32, 64):
        t = timeit_looped(lambda q, k, v: fwd_v3_packed(q, k, v, G)[0], (q, k, v))
        print(f"v3 fwd G={G:3d} (packed): {t*1e3:7.2f} ms  {FWD_FLOPS/t/1e12:6.1f} TF/s", flush=True)

    # fwd+bwd for v3 (kernels only, BHLD resident) vs v1 custom_vjp
    def loss_v1(q, k, v):
        from latteclip_tpu.kernels.attention import flash_attention_packed
        return jnp.sum(flash_attention_packed(q, k, v, H).astype(jnp.float32))

    t = timeit_looped(jax.grad(loss_v1, argnums=(0, 1, 2)), (q, k, v))
    print(f"v1 f+b (current):      {t*1e3:7.2f} ms  {(FWD_FLOPS+BWD_FLOPS)/t/1e12:6.1f} TF/s", flush=True)

    qb = q.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    kb = k.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    vb = v.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    dob = qb
    for G in (8, 32, 64):
        def fb(qb, kb, vb, dob, G=G):
            o, lse = fwd_v3(qb, kb, vb, G)
            dq, dk, dv = bwd_v3(qb, kb, vb, dob, lse, G)
            return dq
        t = timeit_looped(fb, (qb, kb, vb, dob))
        print(f"v3 f+b G={G:3d} (BHLD):   {t*1e3:7.2f} ms  {(FWD_FLOPS+BWD_FLOPS)/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

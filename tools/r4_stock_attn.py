"""A/B the STOCK jax.experimental.pallas.ops.tpu kernels vs kernels/attention.py.

VERDICT round-3 item 1: the custom-kernel hypothesis ladder is exhausted but
an independent kernel lineage (the stock Pallas flash/splash ops) was never
tried. This measures fwd and fwd+bwd at the exact step shapes:

  vision B/16:  B=512,  L=197, H=12, D=64, non-causal
  vision B/32:  B=512,  L=50,  H=12, D=64, non-causal
  text (4-way): B=2048, L=77,  H=8,  D=64, causal

Variants:
  ours             kernels.attention.flash_attention_qkv on packed [B,L,3HD]
  stock-native     stock flash_attention on pre-padded [B,H,Lp,D] inputs —
                   the kernel's best case, layout conversion excluded
  stock-integrated packed [B,L,3HD] -> split/transpose/pad -> stock -> slice
                   back — what adopting the stock kernel in the towers costs
  xla              plain XLA softmax attention (the fallback path)

The stock kernel requires L % 128 == 0 (MIN_BLOCK_SIZE): vision pads
197->256 / 50->128 with kv segment-ids masking the pad; causal text pads
77->128 for free (cols > rows are causally masked already).

Decision rule (VERDICT): adopt any >=5% full-shape winner as default,
otherwise record the rows in BASELINE.md as the documented negative.

Timing: timeit_looped (in-jit scan) — on the axon relay per-dispatch sync
costs ~3ms and block_until_ready does not block.
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))

import jax
import jax.numpy as jnp

from perf_lab import timeit_looped

SHAPES = [
    ("vision-B16", 512, 197, 12, 64, False),
    ("vision-B32", 512, 50, 12, 64, False),
    ("text-4way", 2048, 77, 8, 64, True),
]


def _pad_to(x, lp, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, lp - x.shape[axis])
    return jnp.pad(x, pad)


def make_stock_native(B, L, H, D, causal):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    Lp = -(-L // 128) * 128
    sm_scale = D ** -0.5
    if causal or Lp == L:
        seg = None
    else:
        q_ids = np.ones((B, Lp), np.int32)
        kv_ids = np.zeros((B, Lp), np.int32)
        kv_ids[:, :L] = 1
        seg = SegmentIds(q=jnp.asarray(q_ids), kv=jnp.asarray(kv_ids))

    def fn(q, k, v):  # [B, H, Lp, D]
        return flash_attention(q, k, v, segment_ids=seg, causal=causal,
                               sm_scale=sm_scale)

    return fn, Lp


def make_stock_integrated(B, L, H, D, causal):
    stock, Lp = make_stock_native(B, L, H, D, causal)
    HD = H * D

    def fn(qkv):  # packed [B, L, 3HD] as the in-projection produces
        q, k, v = (qkv[..., i * HD:(i + 1) * HD] for i in range(3))
        def lay(x):  # [B, L, HD] -> [B, H, Lp, D]
            x = x.reshape(B, L, H, D).transpose(0, 2, 1, 3)
            return _pad_to(x, Lp, 2)
        o = stock(lay(q), lay(k), lay(v))  # [B, H, Lp, D]
        return o[:, :, :L].transpose(0, 2, 1, 3).reshape(B, L, HD)

    return fn


def run_shape(name, B, L, H, D, causal, variants=None):
    from latteclip_tpu.kernels import xla_attention
    from latteclip_tpu.kernels.attention import flash_attention_qkv

    HD = H * D
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, L, 3 * HD)), jnp.bfloat16)
    fwd_fl = 4 * B * H * L * L * D
    tot_fl = 15 * B * H * L * L * D
    print(f"--- {name}  B={B} L={L} H={H} D={D} causal={causal} ---", flush=True)

    def want(v):
        return variants is None or v in variants

    def time_pair(tag, f_fwd, args, f_grad=None):
        t = timeit_looped(f_fwd, args)
        print(f"  {tag} fwd: {t * 1e3:8.2f} ms  {fwd_fl / t / 1e12:6.1f} TF/s",
              flush=True)
        if f_grad is not None:
            t = timeit_looped(f_grad, args)
            print(f"  {tag} f+b: {t * 1e3:8.2f} ms  {tot_fl / t / 1e12:6.1f} TF/s",
                  flush=True)

    if want("ours"):
        time_pair(
            "ours        ",
            lambda x: flash_attention_qkv(x, H, causal),
            (qkv,),
            jax.grad(lambda x: jnp.sum(flash_attention_qkv(x, H, causal).astype(jnp.float32))),
        )

    if want("xla"):
        def xla_fn(x):
            q, k, v = (x[..., i * HD:(i + 1) * HD].reshape(B, L, H, D) for i in range(3))
            return xla_attention(q, k, v, causal=causal).reshape(B, L, HD)

        time_pair("xla         ", xla_fn, (qkv,),
                  jax.grad(lambda x: jnp.sum(xla_fn(x).astype(jnp.float32))))

    if want("native"):
        # stock, native layout (pre-padded [B,H,Lp,D]); FLOPs still counted at
        # the REAL L so TF/s is comparable end-to-end work/time
        stock, Lp = make_stock_native(B, L, H, D, causal)
        q = jnp.asarray(rng.standard_normal((B, H, Lp, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, Lp, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, Lp, D)), jnp.bfloat16)
        try:
            time_pair(
                "stock-native",
                stock,
                (q, k, v),
                jax.grad(lambda q, k, v: jnp.sum(stock(q, k, v).astype(jnp.float32)),
                         argnums=(0, 1, 2)),
            )
        except Exception as e:  # noqa: BLE001
            print(f"  stock-native FAILED: {str(e)[:140]}", flush=True)

    if want("integ"):
        integ = make_stock_integrated(B, L, H, D, causal)
        try:
            time_pair(
                "stock-integ ",
                integ,
                (qkv,),
                jax.grad(lambda x: jnp.sum(integ(x).astype(jnp.float32))),
            )
        except Exception as e:  # noqa: BLE001
            print(f"  stock-integ FAILED: {str(e)[:140]}", flush=True)


def check_values():
    """Numerical agreement of stock-integrated vs ours at every shape."""
    from latteclip_tpu.kernels.attention import flash_attention_qkv

    for name, B, L, H, D, causal in SHAPES:
        Bs = min(B, 64)
        HD = H * D
        rng = np.random.default_rng(1)
        qkv = jnp.asarray(rng.standard_normal((Bs, L, 3 * HD)), jnp.bfloat16)
        ours = flash_attention_qkv(qkv, H, causal)
        integ = make_stock_integrated(Bs, L, H, D, causal)(qkv)
        err = float(jnp.max(jnp.abs(ours.astype(jnp.float32) - integ.astype(jnp.float32))))
        print(f"value check {name}: max|diff| = {err:.4f}", flush=True)


def main():
    # usage: r4_stock_attn.py [values] [bench] [shape-name ...] [variant ...]
    which = sys.argv[1:] or ["values", "bench"]
    shape_names = [n for (n, *_r) in SHAPES]
    variants = [v for v in which if v in ("ours", "xla", "native", "integ")] or None
    picked = [s for s in SHAPES if s[0] in which] or SHAPES
    if "values" in which:
        check_values()
    if "bench" in which or any(n in which for n in shape_names):
        for shape in picked:
            run_shape(*shape, variants=variants)


if __name__ == "__main__":
    main()

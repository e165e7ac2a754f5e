"""Pallas flash attention for CLIP towers (short sequences, packed heads).

The CLIP workloads are many-heads × short-sequence (vision 50/197/577
tokens, text 77), batch-dominated — the opposite regime of LM flash kernels
that tile long sequences. Design:

* the kernel consumes the **fused projection output directly**: one
  ``[B, L, 3*H*D]`` tensor laid out ``[q | k | v]`` — exactly what the QKV
  matmul produces. Heads and streams are sliced along the lane dimension
  inside the kernel, so there are NO host-side slice/concat copies at all
  (profiling showed the previous 3-tensor interface cost ~930 MB of pure
  data movement per ViT-B layer in fwd + the mirror concat in bwd);
* one head's full scores fit in VMEM, so there is no online-softmax tiling;
  the grid packs ``G`` batch rows per program and loops heads statically,
  with batched dot_general over G keeping the MXU fed;
* softmax runs in the **base-2 domain**: the kernel folds
  ``head_scale * log2(e)`` into the q tile (a [G,L,D] pass instead of
  [G,L,L]), takes one max pass, and emits ``exp2(s2 - m2)`` directly as
  bfloat16 — roughly halving the VPU passes over the [L, L] score tile that
  dominated the forward kernel (measured 22 TF/s -> the MXU work is ~7% of
  step FLOPs but the old softmax made attention ~11% of step time);
* masks (causal + implicit length) are synthesised from iota — nothing
  streamed from HBM;
* forward stores the output plus per-(row, head) base-2 logsumexp
  ``[B, H, L]``; the O(B·H·L²) softmax
  probabilities the XLA path keeps for backward (~28 GB at ViT-B/16 bs512)
  never exist in HBM;
* backward recomputes probabilities from (qkv, lse2) and emits one fused
  ``[B, L, 3*H*D]`` gradient; the softmax-Jacobian correction uses
  ``delta = sum(do * o)`` over the saved normalized output (a [G,L,D] pass
  per head instead of the [G,L,L] ``sum(p * dp)`` form) — ``o`` is free as a
  residual because the remat policy pins ``flash_out`` anyway.

Numerics match the XLA reference path (``kernels.xla_attention``): bf16
matmul inputs, f32 score accumulation + softmax. ``tests/test_kernels.py``
checks values and grads; the same kernel code runs in interpret mode on CPU
and compiled on TPU.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LOG2E = math.log2(math.e)

_QKT = (((2,), (2,)), ((0,), (0,)))    # [G,Lq,D] x [G,Lk,D] -> [G,Lq,Lk]
_PV = (((2,), (1,)), ((0,), (0,)))     # [G,Lq,Lk] x [G,Lk,D] -> [G,Lq,D]
_PT_DO = (((1,), (1,)), ((0,), (0,)))  # [G,Lq,Lk] x [G,Lq,D] -> [G,Lk,D]

# NOTE: the head-split scratch model underestimates Mosaic's true stack by
# ~1.4x (measured); its ladder shares _legacy_budget() below.


def _fwd_bytes(g: int, l: int, io_hd: int, iters: int, d: int) -> int:
    # double-buffered io tiles (qkv in, o out) + per-head-iteration scratch:
    # Mosaic does NOT reuse stack across the unrolled head loop (measured:
    # 28.3M actual vs a 10M no-scratch estimate at G=16), so scratch scales
    # with the iteration count
    io = 2 * g * (3 * l * io_hd * 2 + l * io_hd * 2)
    scratch = iters * g * (6 * l * l + 14 * l * d)
    return io + scratch


def _bwd_bytes(g: int, l: int, io_hd: int, iters: int, d: int) -> int:
    io = 2 * g * (3 * l * io_hd * 2 + 2 * l * io_hd * 2 + 3 * l * io_hd * 2)
    scratch = iters * g * (12 * l * l + 20 * l * d)
    return io + scratch


def _group_size(b: int, l: int, io_hd: int, cost_fn, iters: int, d: int) -> int:
    # head-split lse blocks are [1, HP, G, L]: Mosaic requires the
    # second-to-last block dim divisible by 8, so G < 8 cannot lower — the
    # ladder floors at 8 (batch rows are padded to G)
    for g in (32, 16):
        if cost_fn(g, l, io_hd, iters, d) <= _legacy_budget():
            return g
    return 8


# -- legacy whole-row path: the original, measured-good formulas + budget ----
# (LATTECLIP_ATTN_BUDGET_MB overrides for batch-group experiments; the
# formulas overestimate VMEM, so larger budgets may still compile)

import os as _os

_legacy_budget_cache = None


def _legacy_budget() -> int:
    """VMEM budget steering the batch-group ladder (lazy: backend-dependent).

    On TPU the default is 24 MB (fwd G=8 / bwd G=4), compiled under the
    PER-KERNEL Mosaic VMEM limit from :func:`_compiler_params` — measured
    round 3: 568.5 img/s vs 528.6 at the 12 MB default and 567.4 under a
    global 32 MiB scoped-VMEM carve (tools/r3_vmem2.py; the stock ~16 MB
    scoped limit rejects G=8 by 2.8 MB, and bwd G=8 at 44 MB is a wash,
    567.3). Off-TPU (interpret-mode tests) keeps 12 MB — group size only
    affects padding there. Override with LATTECLIP_ATTN_BUDGET_MB; if you
    raise it past ~48 MB, raise LATTECLIP_ATTN_VMEM_LIMIT_MB too.
    """
    global _legacy_budget_cache
    if _legacy_budget_cache is None:
        env = _os.environ.get("LATTECLIP_ATTN_BUDGET_MB")
        if env is not None:
            mb = int(env)
        else:
            mb = 24 if jax.default_backend() == "tpu" else 12
        _legacy_budget_cache = mb * 1024 * 1024
    return _legacy_budget_cache


def _fwd_bytes_legacy(g: int, l: int, hd: int) -> int:
    return g * (2 * (3 * l * hd * 2 + l * hd * 2) + l * l * 4 + l * l * 2)


def _bwd_bytes_legacy(g: int, l: int, hd: int) -> int:
    return g * (2 * (3 * l * hd * 2 + 2 * l * hd * 2 + 3 * l * hd * 2)
                + 3 * l * l * 4 + 2 * l * l * 2)


def _compiler_params():
    """Per-kernel Mosaic VMEM limit (vs the global scoped-VMEM carve-out).

    ``vmem_limit_bytes`` raises the VMEM ceiling for THIS pallas call only,
    so the attention kernel can run big batch groups without reserving a
    larger scoped-VMEM slice across every XLA computation in the program
    (the global 64 MiB carve measurably degrades non-attention fusions —
    BASELINE.md round-3 rows). Env knob LATTECLIP_ATTN_VMEM_LIMIT_MB;
    0 disables (falls back to the backend's scoped limit)."""
    mb = int(_os.environ.get("LATTECLIP_ATTN_VMEM_LIMIT_MB", "64"))
    if not mb:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)


def _group_size_legacy(l: int, hd: int, cost_fn, which: str = "fwd") -> int:
    # LATTECLIP_ATTN_BUDGET_MB_FWD / _BWD steer the two ladders separately
    # (experiment knob: bwd G=8 needs ~44 MB while fwd G=16 regresses, so a
    # shared budget cannot express fwd G=8 + bwd G=8)
    env = _os.environ.get(f"LATTECLIP_ATTN_BUDGET_MB_{which.upper()}")
    if env is not None:
        budget = int(env) * 1024 * 1024
    else:
        budget = _legacy_budget()
        # SHORT-L experiment knob — MEASURED WASH, stays opt-in. The round-3
        # theory (per-program overhead at L<=128: ~194 MFLOP per G=16 fwd
        # program yet ~75 us, tools/r3_text_audit.py) predicted G=64 groups
        # would amortize it; the full-step measurement showed NO change
        # (537.4 vs 537.5, tools/r3_shortl.py), and the follow-ups refuted
        # every alternative mechanism too: pre-transposed operands identical
        # (r4_transpose_probe), block-diag head folding loses 13%
        # (r4_blockdiag). The L=77 kernel's 1.8 TF/s cost is intrinsic to
        # this program shape; see BASELINE.md's round-3 rows.
        if l <= 128 and _os.environ.get("LATTECLIP_ATTN_SHORTL", "0") == "1" \
                and _os.environ.get("LATTECLIP_ATTN_BUDGET_MB") is None \
                and jax.default_backend() == "tpu":
            budget = max(budget, 48 * 1024 * 1024)
    # LATTECLIP_ATTN_GMAX caps the ladder for experiments (e.g. GMAX=16
    # restores the pre-round-3 short-L behavior).
    gmax_env = _os.environ.get("LATTECLIP_ATTN_GMAX")
    gmax = int(gmax_env) if gmax_env is not None else 64
    for g in (64, 32, 16, 8, 4, 2):
        if g <= gmax and cost_fn(g, l, hd) <= budget:
            return g
    return 1


def _pad_rows(x: jnp.ndarray, g: int) -> jnp.ndarray:
    b = x.shape[0]
    rem = b % g
    if rem == 0:
        return x
    return jnp.pad(x, ((0, g - rem),) + ((0, 0),) * (x.ndim - 1))


def _causal_bias(L: int) -> jnp.ndarray:
    # in the base-2 score domain; exp2(-1e9) == 0 and every causal row has
    # at least the diagonal unmasked, so the running max stays finite
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    return jnp.where(cols > rows, NEG_INF, 0.0).astype(jnp.float32)


def _attn_bias(L: int, causal: bool, block_len: int):
    """Additive score bias: causal and/or block-diagonal (sequence packing).

    ``block_len`` > 0 marks a row that PACKS ``L // block_len`` independent
    sequences end to end; cross-sequence entries are masked so softmax over
    the packed row is exactly the per-sequence softmax (masked entries hit
    exp2(-1e9 - m) == 0 and the row max is always achieved inside the own
    block). Returns None when no mask is needed."""
    if not causal and not block_len:
        return None
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    masked = (cols > rows) if causal else (cols != cols)
    if block_len and block_len < L:
        masked = masked | ((rows // block_len) != (cols // block_len))
    return jnp.where(masked, NEG_INF, 0.0).astype(jnp.float32)


def _pack_factor(B: int, L: int) -> int:
    """Sequences packed per kernel row for SHORT sequence lengths.

    MEASURED LOSER — default OFF (LATTECLIP_ATTN_PACK=1 re-enables).
    The hypothesis: at L=77 the whole-row kernel runs at 2.6 TF/s (vs 21-26
    at L=197) because each per-head dot is a 77x64x77 matmul — MXU pipeline
    overhead — so packing n=3 sequences into one [231] row should help.
    Measured on the full ViT-B/16 bs512 step (2026-08-17, same session):
    packed 479.9 img/s vs unpacked 537.8 — an 11% REGRESSION. The kernel is
    VPU-bound on padded softmax score entries, and block-diagonal packing
    grows them quadratically per sequence: unpacked 77x128(lane-pad) = 9.9k
    entries/seq, packed (231x256)/3 = 19.7k/seq — 2x the exp2/max/sum work
    plus the [nL,nL] bias add. Bigger MXU ops cannot win back 2x VPU on a
    VPU-bound kernel. Machinery kept (tests pin packed==unpacked values and
    grads) for kernels that become MXU-bound. LATTECLIP_ATTN_PACK_N forces
    a factor; vision L=197 never packs."""
    if _os.environ.get("LATTECLIP_ATTN_PACK", "0") == "0":
        return 1
    env = _os.environ.get("LATTECLIP_ATTN_PACK_N")
    if env is not None:
        n = int(env)
        return n if n > 1 and n * L <= 512 and B > 1 else 1
    if L > 128 or B < 2:
        return 1
    return max(1, 256 // L)


def _fwd_kernel_hs(q_ref, k_ref, v_ref, o_ref, lse_ref, *, qscale, HP, D, causal, block_len=0):
    """Head-split forward: the grid also ranges over head groups, so each
    program touches only ``HP`` heads' worth of lanes. q/k/v refs are three
    lane-block views of the SAME packed [B, L, 3HD] array (different
    index maps — pallas DMAs just those slices; a [B,L,3,HD] reshape was
    tried first and pads its size-3 sublane dim to 8, 2.7x VMEM). lse lives
    in the kernel-native layout ``[H/HP, HP, B, L]`` (block (1, HP, G, L)
    keeps the last two dims Mosaic-tileable); callers ignore lse and the
    bwd kernel reads the same layout."""
    L = q_ref.shape[1]
    bias = _attn_bias(L, causal, block_len)
    bias = bias[None] if bias is not None else None
    for hp in range(HP):
        sl = slice(hp * D, (hp + 1) * D)
        q = q_ref[:, :, sl].astype(jnp.float32)             # [G, L, D]
        k = k_ref[:, :, sl].astype(jnp.bfloat16)
        v = v_ref[:, :, sl].astype(jnp.bfloat16)
        qs = (q * qscale).astype(jnp.bfloat16)              # fold scale*log2e
        s2 = jax.lax.dot_general(qs, k, _QKT, preferred_element_type=jnp.float32)
        if bias is not None:
            s2 = s2 + bias
        m2 = jnp.max(s2, axis=-1, keepdims=True)
        pb = jnp.exp2(s2 - m2).astype(jnp.bfloat16)
        l = jnp.sum(pb, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(pb, v, _PV, preferred_element_type=jnp.float32) / l
        o_ref[:, :, sl] = o.astype(o_ref.dtype)
        lse_ref[0, hp, :, :] = m2[..., 0] + jnp.log2(l[..., 0])


def _bwd_kernel_hs(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dqkv_ref,
                   *, qscale, scale, HP, D, causal, block_len=0):
    L = q_ref.shape[1]
    bias = _attn_bias(L, causal, block_len)
    bias = bias[None] if bias is not None else None
    for hp in range(HP):
        sl = slice(hp * D, (hp + 1) * D)
        q = q_ref[:, :, sl].astype(jnp.bfloat16)
        k = k_ref[:, :, sl].astype(jnp.bfloat16)
        v = v_ref[:, :, sl].astype(jnp.bfloat16)
        o = o_ref[:, :, sl].astype(jnp.bfloat16)
        do = do_ref[:, :, sl].astype(jnp.bfloat16)
        lse2 = lse_ref[0, hp, :, :]                         # [G, L]

        qs = (q.astype(jnp.float32) * qscale).astype(jnp.bfloat16)
        s2 = jax.lax.dot_general(qs, k, _QKT, preferred_element_type=jnp.float32)
        if bias is not None:
            s2 = s2 + bias
        p = jnp.exp2(s2 - lse2[..., None])
        pb = p.astype(jnp.bfloat16)

        dv = jax.lax.dot_general(pb, do, _PT_DO, preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _QKT, preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(jnp.bfloat16)
        dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32)
        # dqkv in [3, B, L, HD] layout: the (q|k|v, head) lane re-merge is a
        # transpose XLA folds into the consuming in-proj backward GEMMs
        dqkv_ref[0, :, :, sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[1, :, :, sl] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[2, :, :, sl] = dv.astype(dqkv_ref.dtype)


def _head_split(num_heads: int, D: int) -> int:
    """Heads per program for the head-split grid; 0 = not applicable.

    EXPERIMENTAL, off by default (LATTECLIP_ATTN_HEADSPLIT=1 enables): the
    variant is numerically verified (interpret-mode tests cover it) but the
    remote TPU compile service takes pathologically long (>50 min) on the
    multi-view grid, so it cannot be iterated or deployed here. Findings so
    far are recorded in BASELINE.md (a [B,L,3,HD] reshape pads the size-3
    sublane dim to 8 => 2.7x VMEM; three lane-block views of the packed
    array avoid that)."""
    import os

    if os.environ.get("LATTECLIP_ATTN_HEADSPLIT", "0") != "1":
        return 0
    if D in (64, 128) and 128 // D and num_heads % max(1, 128 // D) == 0:
        return 128 // D
    return 0


def _fwd_kernel(qkv_ref, o_ref, lse_ref, *, qscale, H, D, causal, block_len=0):
    L = qkv_ref.shape[1]
    HD = H * D
    bias = _attn_bias(L, causal, block_len)
    bias = bias[None] if bias is not None else None
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = qkv_ref[:, :, sl].astype(jnp.float32)           # [G, L, D]
        k = qkv_ref[:, :, HD + h * D:HD + (h + 1) * D].astype(jnp.bfloat16)
        v = qkv_ref[:, :, 2 * HD + h * D:2 * HD + (h + 1) * D].astype(jnp.bfloat16)
        qs = (q * qscale).astype(jnp.bfloat16)              # fold scale*log2e
        s2 = jax.lax.dot_general(qs, k, _QKT, preferred_element_type=jnp.float32)
        if bias is not None:
            s2 = s2 + bias
        m2 = jnp.max(s2, axis=-1, keepdims=True)
        pb = jnp.exp2(s2 - m2).astype(jnp.bfloat16)         # one fused pass
        l = jnp.sum(pb, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(pb, v, _PV, preferred_element_type=jnp.float32) / l
        o_ref[:, :, sl] = o.astype(o_ref.dtype)
        lse_ref[:, h, :] = m2[..., 0] + jnp.log2(l[..., 0])  # base-2 lse


def _bwd_kernel(qkv_ref, o_ref, do_ref, lse_ref, dqkv_ref, *, qscale, scale, H, D, causal, block_len=0):
    L = qkv_ref.shape[1]
    HD = H * D
    bias = _attn_bias(L, causal, block_len)
    bias = bias[None] if bias is not None else None
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = qkv_ref[:, :, sl].astype(jnp.bfloat16)
        k = qkv_ref[:, :, HD + h * D:HD + (h + 1) * D].astype(jnp.bfloat16)
        v = qkv_ref[:, :, 2 * HD + h * D:2 * HD + (h + 1) * D].astype(jnp.bfloat16)
        o = o_ref[:, :, sl].astype(jnp.bfloat16)
        do = do_ref[:, :, sl].astype(jnp.bfloat16)
        lse2 = lse_ref[:, h, :]                             # [G, L]

        qs = (q.astype(jnp.float32) * qscale).astype(jnp.bfloat16)
        s2 = jax.lax.dot_general(qs, k, _QKT, preferred_element_type=jnp.float32)
        if bias is not None:
            s2 = s2 + bias
        p = jnp.exp2(s2 - lse2[..., None])                  # normalized, f32
        pb = p.astype(jnp.bfloat16)

        dv = jax.lax.dot_general(pb, do, _PT_DO, preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _QKT, preferred_element_type=jnp.float32)
        # delta = rowsum(p * dp) == rowsum(do * o) since p is normalized;
        # the o form is a [G,L,D] pass instead of [G,L,L]
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(jnp.bfloat16)
        dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32)
        dqkv_ref[:, :, sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, HD + h * D:HD + (h + 1) * D] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * HD + h * D:2 * HD + (h + 1) * D] = dv.astype(dqkv_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# -- segment-masked attention (true variable-length sequence packing) ---------
#
# Packs REAL-length sequences end to end into [R, P] rows (host-side packer:
# data/packing.py) and masks attention to within-segment entries, so the
# whole text tower runs on ~sum(len_i) tokens instead of B*ctx. Unlike the
# block-diagonal fixed-length packing above (a measured VPU loser — padded
# score entries double per sequence), real-length packing at P=128 CUTS both
# the VPU score entries per sequence (P*P/nseq ~ 4.1k vs ctx-48's 48*128 =
# 6.1k) and the MLP/LN token count (~mean_len vs cap tokens per sequence).
# The mask is synthesised in-kernel from a [G, P] int32 segment-id tile
# (0 = padding); no [P, P] bias is streamed from HBM.


def _seg_bias(seg: jnp.ndarray, causal: bool) -> jnp.ndarray:
    """[G, L] int32 segment ids -> additive [G, L, L] f32 score bias.

    Entry (g, i, j) is 0 when token j is visible to token i: same segment
    and (if causal) j <= i. Padding (seg 0) rows self-attend harmlessly —
    their outputs are sliced away by the EOT gather."""
    L = seg.shape[1]
    same = seg[:, :, None] == seg[:, None, :]
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        same = same & (cols <= rows)[None]
    return jnp.where(same, 0.0, NEG_INF).astype(jnp.float32)


def _fwd_bytes_seg(g: int, l: int, hd: int) -> int:
    return _fwd_bytes_legacy(g, l, hd) + g * l * 4 + g * l * l * 4


def _bwd_bytes_seg(g: int, l: int, hd: int) -> int:
    return _bwd_bytes_legacy(g, l, hd) + g * l * 4 + g * l * l * 4


def _fwd_kernel_seg(qkv_ref, seg_ref, o_ref, lse_ref, *, qscale, H, D, causal):
    L = qkv_ref.shape[1]
    HD = H * D
    bias = _seg_bias(seg_ref[...], causal)                  # [G, L, L]
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = qkv_ref[:, :, sl].astype(jnp.float32)
        k = qkv_ref[:, :, HD + h * D:HD + (h + 1) * D].astype(jnp.bfloat16)
        v = qkv_ref[:, :, 2 * HD + h * D:2 * HD + (h + 1) * D].astype(jnp.bfloat16)
        qs = (q * qscale).astype(jnp.bfloat16)
        s2 = jax.lax.dot_general(qs, k, _QKT, preferred_element_type=jnp.float32)
        s2 = s2 + bias
        m2 = jnp.max(s2, axis=-1, keepdims=True)
        pb = jnp.exp2(s2 - m2).astype(jnp.bfloat16)
        l = jnp.sum(pb, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(pb, v, _PV, preferred_element_type=jnp.float32) / l
        o_ref[:, :, sl] = o.astype(o_ref.dtype)
        lse_ref[:, h, :] = m2[..., 0] + jnp.log2(l[..., 0])


def _bwd_kernel_seg(qkv_ref, seg_ref, o_ref, do_ref, lse_ref, dqkv_ref,
                    *, qscale, scale, H, D, causal):
    L = qkv_ref.shape[1]
    HD = H * D
    bias = _seg_bias(seg_ref[...], causal)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = qkv_ref[:, :, sl].astype(jnp.bfloat16)
        k = qkv_ref[:, :, HD + h * D:HD + (h + 1) * D].astype(jnp.bfloat16)
        v = qkv_ref[:, :, 2 * HD + h * D:2 * HD + (h + 1) * D].astype(jnp.bfloat16)
        o = o_ref[:, :, sl].astype(jnp.bfloat16)
        do = do_ref[:, :, sl].astype(jnp.bfloat16)
        lse2 = lse_ref[:, h, :]

        qs = (q.astype(jnp.float32) * qscale).astype(jnp.bfloat16)
        s2 = jax.lax.dot_general(qs, k, _QKT, preferred_element_type=jnp.float32)
        s2 = s2 + bias
        p = jnp.exp2(s2 - lse2[..., None])
        pb = p.astype(jnp.bfloat16)

        dv = jax.lax.dot_general(pb, do, _PT_DO, preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _QKT, preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(jnp.bfloat16)
        dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32)
        dqkv_ref[:, :, sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, HD + h * D:HD + (h + 1) * D] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * HD + h * D:2 * HD + (h + 1) * D] = dv.astype(dqkv_ref.dtype)


def _flash_fwd_seg_impl(qkv, seg, causal: bool, num_heads: int):
    dtype = qkv.dtype
    B, L, HD3 = qkv.shape
    HD = HD3 // 3
    D = HD // num_heads
    qscale = (D ** -0.5) * LOG2E
    G = _group_size_legacy(L, HD, _fwd_bytes_seg)
    qkv = _pad_rows(qkv, G)
    seg = _pad_rows(seg, G)
    Bp = qkv.shape[0]
    cost = pl.CostEstimate(
        flops=4 * B * num_heads * L * L * D,
        bytes_accessed=4 * B * L * HD * 2,
        transcendentals=B * num_heads * L * L,
    )
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_seg, qscale=qscale, H=num_heads, D=D,
                          causal=causal),
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((G, L, HD3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, L, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, num_heads, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L, HD), dtype),
            jax.ShapeDtypeStruct((Bp, num_heads, L), jnp.float32),
        ],
        cost_estimate=cost,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(qkv, seg)
    if Bp != B:
        o, lse = o[:B], lse[:B]
    return o, lse


def _make_fa_seg(num_heads: int):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
    def fa(qkv, seg, causal=True):
        return _flash_fwd_seg_impl(qkv, seg, causal, num_heads)

    def fwd(qkv, seg, causal):
        from jax.ad_checkpoint import checkpoint_name

        o, lse = _flash_fwd_seg_impl(qkv, seg, causal, num_heads)
        o = checkpoint_name(o, "flash_out")
        lse = checkpoint_name(lse, "flash_lse")
        return (o, lse), (qkv, seg, o, lse)

    def bwd(causal, res, cots):
        import numpy as _np

        g, _g_lse = cots
        qkv, seg, o, lse = res
        B, L, HD3 = qkv.shape
        HD = HD3 // 3
        D = HD // num_heads
        scale = D ** -0.5
        qscale = scale * LOG2E
        G = _group_size_legacy(L, HD, _bwd_bytes_seg, which="bwd")
        qkv = _pad_rows(qkv, G)
        seg = _pad_rows(seg, G)
        o = _pad_rows(o, G)
        do = _pad_rows(g.astype(qkv.dtype), G)
        lse = _pad_rows(lse, G)
        Bp = qkv.shape[0]
        cost = pl.CostEstimate(
            flops=11 * B * num_heads * L * L * D,
            bytes_accessed=10 * B * L * HD * 2,
            transcendentals=B * num_heads * L * L,
        )
        dqkv = pl.pallas_call(
            functools.partial(_bwd_kernel_seg, qscale=qscale, scale=scale,
                              H=num_heads, D=D, causal=causal),
            grid=(Bp // G,),
            in_specs=[
                pl.BlockSpec((G, L, HD3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, L, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, L, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, num_heads, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, L, HD3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, L, HD3), qkv.dtype),
            cost_estimate=cost,
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(qkv, seg, o, do, lse)
        if Bp != B:
            dqkv = dqkv[:B]
        # integer segment ids take a float0 cotangent
        dseg = _np.zeros((B, L), dtype=jax.dtypes.float0)
        return (dqkv, dseg)

    fa.defvjp(fwd, bwd)
    return fa


_FA_SEG_CACHE = {}


def flash_attention_qkv_segmented(
    qkv: jnp.ndarray,
    num_heads: int,
    seg_ids: jnp.ndarray,
    causal: bool = True,
) -> jnp.ndarray:
    """Segment-masked fused attention on packed variable-length rows.

    ``qkv``: [R, P, 3*H*D] packed projection output; ``seg_ids``: [R, P]
    int32, 0 = padding, equal ids = same sequence. Tokens attend only
    within their own segment (causally when ``causal``). Returns [R, P, H*D].
    """
    if num_heads not in _FA_SEG_CACHE:
        _FA_SEG_CACHE[num_heads] = _make_fa_seg(num_heads)
    out, _lse = _FA_SEG_CACHE[num_heads](qkv, seg_ids.astype(jnp.int32), causal)
    return out


# -- block-diagonal head folding (short L) -----------------------------------
#
# At L<=128 the whole-row kernel's per-head dots ([77,64]x[64,77]) are MXU
# pipeline-LATENCY bound (~210 cycles each incl. drain for ~19 cycles of
# work; measured: 1.8 TF/s at text shapes, and pre-transposing operands
# changes nothing — tools/r4_transpose_probe.py). Folding all H heads into
# ONE dot per row makes the work per launch H^2x bigger: scores for every
# head come from q_row [L, H*D] x K_bd [H*Lp, H*D] (contract lanes), where
# K_bd block f holds k's rows for head f at lane block f and ZEROS elsewhere
# — so cross-head lane products vanish. K_bd/V_bd live in VMEM scratch,
# zero-initialised ONCE per program; per-g only the diagonal blocks are
# rewritten (sublane+lane offset copies of the natural layouts, NO
# transposes). The padded-lane FLOP waste (H x Lp/L) is irrelevant in the
# latency-bound regime. PV is the mirror: P_fold [L, H*Lp] x V_bd
# [H*Lp, H*D] (contract P lanes with V_bd sublanes — the MXU-natural form).
# lse is emitted in the whole-row layout so the UNCHANGED backward kernel
# consumes the same residuals. Enable with LATTECLIP_ATTN_BLOCKDIAG=1.

def _blockdiag_enabled() -> bool:
    # MEASURED LOSER — default OFF (2026-08-18, tools/r4_blockdiag.py):
    # 8.15 ms vs 7.18 ms whole-row at text shapes. The fold removes the
    # small-dot count but the scratch rebuilds + deep-K zero-lane MACs cost
    # more; kept (with equivalence tests) as the recorded refutation of the
    # matmul-issue-latency hypothesis.
    return _os.environ.get("LATTECLIP_ATTN_BLOCKDIAG", "0") == "1"


def _fwd_kernel_bd(qkv_ref, o_ref, lse_ref, kbd_ref, vbd_ref,
                   *, qscale, H, D, G, Lp, causal, block_len=0):
    L = qkv_ref.shape[1]
    HD = H * D
    bias = _attn_bias(L, causal, block_len)  # [L, L] or None
    # zero the scratch once per program; per-g writes below only touch the
    # diagonal blocks, so off-diagonal zeros persist across the g loop
    @pl.when(pl.program_id(0) == 0)
    def _init():
        kbd_ref[...] = jnp.zeros_like(kbd_ref)
        vbd_ref[...] = jnp.zeros_like(vbd_ref)

    for g in range(G):
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            kbd_ref[h * Lp:h * Lp + L, sl] = qkv_ref[g, :, HD + h * D:HD + (h + 1) * D].astype(jnp.bfloat16)
            vbd_ref[h * Lp:h * Lp + L, sl] = qkv_ref[g, :, 2 * HD + h * D:2 * HD + (h + 1) * D].astype(jnp.bfloat16)
        q = qkv_ref[g, :, :HD].astype(jnp.float32)
        qs = (q * qscale).astype(jnp.bfloat16)                  # [L, HD]
        s2 = jax.lax.dot_general(
            qs, kbd_ref[...].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )                                                       # [L, H*Lp]
        s2 = s2.reshape(L, H, Lp)
        # padded key columns j >= L must not survive the softmax
        col = jax.lax.broadcasted_iota(jnp.int32, (L, H, Lp), 2)
        s2 = jnp.where(col >= L, NEG_INF, s2)
        if bias is not None:
            s2 = s2 + jnp.pad(bias, ((0, 0), (0, Lp - L)))[:, None, :]
        m2 = jnp.max(s2, axis=-1, keepdims=True)                # [L, H, 1]
        p = jnp.exp2(s2 - m2)                                   # f32 [L, H, Lp]
        l = jnp.sum(p, axis=-1, keepdims=True)
        # normalise BEFORE the PV dot: the [L, H, Lp] view splits lanes at
        # 128 (supported); splitting the [L, HD] output at 64 lanes per
        # head is a Mosaic-unsupported shape cast
        pb = (p / l).astype(jnp.bfloat16)
        ov = jax.lax.dot_general(
            pb.reshape(L, H * Lp), vbd_ref[...].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )                                                       # [L, HD]
        o_ref[g] = ov.astype(o_ref.dtype)
        lse_ref[g] = m2[..., 0] + jnp.log2(l[..., 0])           # [L, H]


def _flash_fwd_bd(qkv, causal: bool, num_heads: int, block_len: int):
    """Block-diagonal forward; same outputs as the whole-row path."""
    dtype = qkv.dtype
    B, L, HD3 = qkv.shape
    HD = HD3 // 3
    D = HD // num_heads
    qscale = (D ** -0.5) * LOG2E
    Lp = -(-L // 128) * 128
    G = int(_os.environ.get("LATTECLIP_ATTN_BD_G", "8"))
    qkv = _pad_rows(qkv, G)
    Bp = qkv.shape[0]
    cost = pl.CostEstimate(
        flops=4 * B * num_heads * L * Lp * D,
        bytes_accessed=4 * B * L * HD * 2,
        transcendentals=B * num_heads * L * Lp,
    )
    in_tile = pl.BlockSpec((G, L, HD3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_bd, qscale=qscale, H=num_heads, D=D,
                          G=G, Lp=Lp, causal=causal, block_len=block_len),
        grid=(Bp // G,),
        in_specs=[in_tile],
        out_specs=[
            pl.BlockSpec((G, L, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # [G, L, H] inside the kernel (no in-kernel transpose); the
            # wrapper swaps to the whole-row [B, H, L] residual layout
            pl.BlockSpec((G, L, num_heads), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L, HD), dtype),
            jax.ShapeDtypeStruct((Bp, L, num_heads), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_heads * Lp, HD), jnp.bfloat16),
            pltpu.VMEM((num_heads * Lp, HD), jnp.bfloat16),
        ],
        cost_estimate=cost,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(qkv)
    lse = jnp.swapaxes(lse, 1, 2)  # -> [B, H, L], the whole-row layout
    if Bp != B:
        o, lse = o[:B], lse[:B]
    return o, lse


def _flash_fwd_impl(qkv, causal: bool, num_heads: int, block_len: int = 0):
    """qkv: [B, L, 3*H*D] packed -> (out [B, L, H*D], lse2 [B, H, L])."""
    dtype = qkv.dtype
    B, L, HD3 = qkv.shape
    HD = HD3 // 3
    D = HD // num_heads
    if _blockdiag_enabled() and L <= 128 and HD <= 1024:
        return _flash_fwd_bd(qkv, causal, num_heads, block_len)
    qscale = (D ** -0.5) * LOG2E
    HP = _head_split(num_heads, D)
    cost = pl.CostEstimate(
        flops=4 * B * num_heads * L * L * D,
        bytes_accessed=4 * B * L * HD * 2,
        transcendentals=B * num_heads * L * L,
    )

    if HP:
        HPD = HP * D
        NB = HD // HPD  # lane blocks per stream
        G = _group_size(B, L, HPD, _fwd_bytes, HP, D)
        qkv = _pad_rows(qkv, G)
        Bp = qkv.shape[0]
        # three lane-block views of the same packed array (q | k | v)
        stream = lambda s: pl.BlockSpec(  # noqa: E731
            (G, L, HPD), lambda i, j, s=s: (i, 0, s * NB + j), memory_space=pltpu.VMEM
        )
        o, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_hs, qscale=qscale, HP=HP, D=D, causal=causal, block_len=block_len),
            grid=(Bp // G, num_heads // HP),
            in_specs=[stream(0), stream(1), stream(2)],
            out_specs=[
                pl.BlockSpec((G, L, HPD), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HP, G, L), lambda i, j: (j, 0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bp, L, HD), dtype),
                jax.ShapeDtypeStruct((num_heads // HP, HP, Bp, L), jnp.float32),
            ],
            cost_estimate=cost,
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(qkv, qkv, qkv)
        if Bp != B:
            o, lse = o[:B], lse[:, :, :B]
        return o, lse

    G = _group_size_legacy(L, HD, _fwd_bytes_legacy)
    qkv = _pad_rows(qkv, G)
    Bp = qkv.shape[0]

    in_tile = pl.BlockSpec((G, L, HD3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_tile = pl.BlockSpec((G, L, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((G, num_heads, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, qscale=qscale, H=num_heads, D=D, causal=causal, block_len=block_len),
        grid=(Bp // G,),
        in_specs=[in_tile],
        out_specs=[out_tile, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L, HD), dtype),
            jax.ShapeDtypeStruct((Bp, num_heads, L), jnp.float32),
        ],
        cost_estimate=cost,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(qkv)
    if Bp != B:
        o, lse = o[:B], lse[:B]
    return o, lse


def _make_fa(num_heads: int):
    # lse is a PRIMAL output (not just a residual): under jax.checkpoint with
    # a policy saving {flash_out, flash_lse}, the residuals (qkv, o, lse)
    # are then all either recomputed upstream or saved, so partial
    # evaluation eliminates the forward kernel from the backward recompute.
    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
    def fa(qkv, causal=False, block_len=0):
        return _flash_fwd_impl(qkv, causal, num_heads, block_len)

    def fwd(qkv, causal, block_len):
        from jax.ad_checkpoint import checkpoint_name

        o, lse = _flash_fwd_impl(qkv, causal, num_heads, block_len)
        o = checkpoint_name(o, "flash_out")
        lse = checkpoint_name(lse, "flash_lse")
        return (o, lse), (qkv, o, lse)

    def bwd(causal, block_len, res, cots):
        g, _g_lse = cots  # lse cotangent is unused (lse feeds no real output)
        qkv, o, lse = res
        B, L, HD3 = qkv.shape
        HD = HD3 // 3
        D = HD // num_heads
        scale = D ** -0.5
        qscale = scale * LOG2E
        HP = _head_split(num_heads, D)
        cost = pl.CostEstimate(
            flops=11 * B * num_heads * L * L * D,
            bytes_accessed=10 * B * L * HD * 2,
            transcendentals=B * num_heads * L * L,
        )

        if HP:
            HPD = HP * D
            NB = HD // HPD
            G = _group_size(B, L, HPD, _bwd_bytes, HP, D)
            qkv = _pad_rows(qkv, G)
            o = _pad_rows(o, G)
            do = _pad_rows(g.astype(qkv.dtype), G)
            Bp = qkv.shape[0]
            if Bp != B:  # lse is in kernel layout [H/HP, HP, B, L]
                lse = jnp.pad(lse, ((0, 0), (0, 0), (0, Bp - B), (0, 0)))
            stream = lambda s: pl.BlockSpec(  # noqa: E731
                (G, L, HPD), lambda i, j, s=s: (i, 0, s * NB + j),
                memory_space=pltpu.VMEM,
            )
            hd_tile = pl.BlockSpec((G, L, HPD), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM)
            lse_spec = pl.BlockSpec((1, HP, G, L), lambda i, j: (j, 0, i, 0),
                                    memory_space=pltpu.VMEM)
            dqkv3 = pl.pallas_call(
                functools.partial(_bwd_kernel_hs, qscale=qscale, scale=scale,
                                  HP=HP, D=D, causal=causal, block_len=block_len),
                grid=(Bp // G, num_heads // HP),
                in_specs=[stream(0), stream(1), stream(2), hd_tile, hd_tile, lse_spec],
                out_specs=pl.BlockSpec((3, G, L, HPD), lambda i, j: (0, i, 0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((3, Bp, L, HD), qkv.dtype),
                cost_estimate=cost,
                compiler_params=_compiler_params(),
                interpret=_interpret(),
            )(qkv, qkv, qkv, o, do, lse)
            # [3, B, L, HD] -> [B, L, 3HD]: XLA folds this transpose into the
            # in-proj backward GEMMs' dimension numbers (layout assignment)
            dqkv = jnp.moveaxis(dqkv3, 0, 2).reshape(Bp, L, HD3)
            if Bp != B:
                dqkv = dqkv[:B]
            return (dqkv,)

        G = _group_size_legacy(L, HD, _bwd_bytes_legacy, which="bwd")
        qkv = _pad_rows(qkv, G)
        o = _pad_rows(o, G)
        do = _pad_rows(g.astype(qkv.dtype), G)
        lse = _pad_rows(lse, G)
        Bp = qkv.shape[0]
        in_tile = pl.BlockSpec((G, L, HD3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        hd_tile = pl.BlockSpec((G, L, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        lse_spec = pl.BlockSpec((G, num_heads, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        dqkv = pl.pallas_call(
            functools.partial(_bwd_kernel, qscale=qscale, scale=scale,
                              H=num_heads, D=D, causal=causal,
                              block_len=block_len),
            grid=(Bp // G,),
            in_specs=[in_tile, hd_tile, hd_tile, lse_spec],
            out_specs=in_tile,
            out_shape=jax.ShapeDtypeStruct((Bp, L, HD3), qkv.dtype),
            cost_estimate=cost,
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(qkv, o, do, lse)
        if Bp != B:
            dqkv = dqkv[:B]
        return (dqkv,)

    fa.defvjp(fwd, bwd)
    return fa


_FA_CACHE = {}


def flash_attention_qkv(
    qkv: jnp.ndarray,
    num_heads: int,
    causal: bool = False,
) -> jnp.ndarray:
    """Fused attention on the packed QKV projection output.

    ``qkv``: [B, L, 3*H*D] laid out ``[q | k | v]`` along the last axis —
    the natural output of the fused in-projection. Returns [B, L, H*D].

    The fwd rule tags out/lse with checkpoint names so the remat policy in
    ``layers.transformer_stack`` can pin them across the boundary (see
    _make_fa for why that removes the kernel from the backward recompute).

    Short sequences (L <= 128, e.g. the L=77 text towers) are transparently
    PACKED: n consecutive batch rows are viewed as one [n*L] row (a free
    reshape of the contiguous [B, L, C] array) and a block-diagonal bias
    keeps the softmax exactly per-sequence — see :func:`_pack_factor` for
    the measurement that motivates this. The packing sits OUTSIDE the
    custom-vjp, so the backward pass flows through the same reshape.
    """
    if num_heads not in _FA_CACHE:
        _FA_CACHE[num_heads] = _make_fa(num_heads)
    B, L, C = qkv.shape
    n = _pack_factor(B, L)
    if n > 1:
        qkv = _pad_rows(qkv, n)
        Bp = qkv.shape[0]
        packed = qkv.reshape(Bp // n, n * L, C)
        out, _lse = _FA_CACHE[num_heads](packed, causal, L)
        out = out.reshape(Bp, L, C // 3)
        return out[:B] if Bp != B else out
    out, _lse = _FA_CACHE[num_heads](qkv, causal)
    return out


def flash_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    causal: bool = False,
) -> jnp.ndarray:
    """Compatibility wrapper for separate packed-head [B, L, H*D] tensors."""
    return flash_attention_qkv(jnp.concatenate([q, k, v], axis=-1), num_heads, causal)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
) -> jnp.ndarray:
    """Compatibility wrapper for [B, L, H, D] inputs."""
    B, L, H, D = q.shape
    out = flash_attention_packed(
        q.reshape(B, L, H * D), k.reshape(B, L, H * D), v.reshape(B, L, H * D),
        H, causal,
    )
    return out.reshape(B, L, H, D)

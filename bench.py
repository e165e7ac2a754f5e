"""Benchmark: LatteCLIP fine-tune throughput, ViT-B/16, one TPU chip.

Measures steady-state images/sec/chip of the FULL fused train step (augment +
image fwd + 4-stream text fwd + fusion + InfoNCE + backward + AdamW + bank
update) — the reference's own throughput formula
``batch_size * world_size / batch_time`` (reference
``src/training/train.py:595-600``).

``vs_baseline`` compares against the estimated reference throughput on its
own hardware (V100-32G, ViT-B/16, global batch 512, AMP fp16, grad
checkpointing — the configuration pinned by the run scripts; see
BASELINE.md). The repo publishes no number, so BASELINE.md pins per-config
estimates (330 img/s at ViT-B/16, 596 at ViT-B/32, one shared utilization
assumption scaled by per-image step FLOPs) and records our measurements as
they land.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} with
three robustness fields (VERDICT r3 #2) that de-noise the ±15-30% session
lottery documented in BASELINE.md:

- ``mfu``: executed-FLOPs/sec of the measured step divided by the SAME
  session's measured square-GEMM roofline (both computed in-run, so the
  ratio is session-invariant even when absolute img/s swings);
- ``gemm_roofline_tflops``: that roofline, for the record;
- ``value_ctx_auto``: throughput at the production ``--text-context-cap``
  setting (ctx 48 — real LLaVA captions tokenize to ~25-40 BPE tokens, so
  the cap is result-identical there; see BASELINE.md ctx-cap rows). The
  headline ``value`` stays at the reference's full 77 columns so
  ``vs_baseline`` compares equal work.
- ``value_packed``: throughput with ``--text-packing 128`` (round 4) —
  variable-length packed caption tower on an LLaVA-like length
  distribution; exact full-77 semantics (tests/test_packed_step.py), so
  this is the recommended production configuration.
- ``value_b32_packed`` / ``vs_baseline_b32_packed``: the packed step at
  ViT-B/32 — the config every reference run script pins
  (``scripts/unsupervised/*.sh``); packing is worth more there (text is a
  larger share of the step): measured 1636 img/s = 2.75× vs the B/32
  baseline (padded B/32 anchor 1084 = 1.82×, BASELINE.md row).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

PRODUCTION_CTX = 48  # --text-context-cap auto lands here for LLaVA captions

# Per-config V100 baseline estimates (see BASELINE.md "Baseline methodology").
# Both derive from ONE utilization assumption: the round-1 ViT-B/16 estimate
# of 330 img/s, scaled by each config's per-image training FLOPs in the
# reference's own v2 step (image fwd + FOUR text encodes, grad-checkpointing
# on both towers = 4x fwd FLOPs): B/16 ~236 GF/img, B/32 ~130 GF/img.
REFERENCE_V100_IMG_PER_SEC = {
    "ViT-B-16": 330.0,
    "ViT-B-32": 596.0,  # 330 * (236/130); optimistic for the V100 (smaller matmuls)
}

MODEL = "ViT-B-16"
BATCH = 512
WARMUP_STEPS = 3
MEASURE_STEPS = 10


def caption_lengths(rng, n: int, clip_max: int = 77) -> np.ndarray:
    """LLaVA-caption-like BPE length distribution (median ~30, long tail;
    same generator as tools/r4_packed_bench.py — the measured tower A/B)."""
    ln = rng.lognormal(mean=np.log(30.0), sigma=0.35, size=n)
    return np.clip(np.round(ln).astype(np.int64) + 2, 8, clip_max)


def _caption_rows(rng, lengths: np.ndarray, ctx: int, eot_id: int) -> np.ndarray:
    rows = np.zeros((len(lengths), ctx), np.int32)
    for i, ln in enumerate(lengths):
        rows[i, :ln - 1] = rng.integers(1, 40000, size=ln - 1)
        rows[i, ln - 1] = eot_id
    return rows


def make_batch(batch_size: int, image_size: int, num_classes: int, ctx: int = 77,
               eot_id: int = 49407, longtail: bool = False):
    rng = np.random.default_rng(0)
    if longtail:
        # realistic variable-length captions (EOT at the real length) — the
        # packed run's work depends on the distribution, so pin it
        per_image = _caption_rows(rng, caption_lengths(rng, batch_size, ctx), ctx, eot_id)
        per_group = _caption_rows(rng, caption_lengths(rng, batch_size, ctx), ctx, eot_id)
    else:
        per_image = rng.integers(1, 40000, size=(batch_size, ctx)).astype(np.int32)
        per_group = rng.integers(1, 40000, size=(batch_size, ctx)).astype(np.int32)
    if ctx != 77 and not longtail:
        # capped contexts carry a forced EOT in the last column, like the
        # real pipeline's apply_context_cap output
        per_image[:, -1] = eot_id
        per_group[:, -1] = eot_id
    return {
        "images": rng.integers(0, 255, size=(batch_size, image_size, image_size, 3)).astype(np.uint8),
        "per_image_tokens": per_image,
        "per_group_tokens": per_group,
        "zs_preds": rng.integers(0, num_classes, size=(batch_size,)).astype(np.int32),
        "gt_labels": rng.integers(0, num_classes, size=(batch_size,)).astype(np.int32),
    }


def measure_gemm_roofline(n: int = 8192, iters: int = 20) -> float:
    """Same-session bf16 square-GEMM rate in FLOP/s (the MFU denominator).

    The ``iters`` GEMMs run inside ONE jit as a sequentially-dependent
    ``lax.scan`` (tools/perf_lab.py discipline): the axon relay costs ~3 ms
    per dispatch, which poisons a host-side loop of sub-ms GEMMs (measured
    41.8 "TF/s" with the naive loop vs 140-196 real)."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(x):
        def body(c, _):
            # a is all-ones so c@a == n for all-ones c; the 1/n rescale keeps
            # the carry at ones (a cheap VPU pass that forces the sequential
            # data dependency without overflow)
            c = jnp.dot(c, a, preferred_element_type=jnp.bfloat16) * (1.0 / n)
            return c.astype(jnp.bfloat16), ()
        f, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.float32(f[0, 0])

    float(chain(a))  # compile + warm (relay: block_until_ready is a no-op)
    t0 = time.perf_counter()
    float(chain(a))
    dt = time.perf_counter() - t0
    return 2.0 * n ** 3 * iters / dt


def analytic_step_tflops(cfg, batch: int, num_classes: int, ctx: int,
                         remat: bool, remat_vision=None, remat_text=None,
                         packed_rows=None) -> float:
    """GEMM FLOPs of one fused v2 train step, in TF — the MFU numerator.

    Analytic, following BASELINE.md's "Roofline" accounting exactly (vision
    fwd 35.1 GF/img at ViT-B/16, text 2 caption streams + C deduped
    templates, per-tower training multiplier 3.9x under per-block remat /
    3x without — the ADVICE r4 fix: each tower takes ITS resolved remat
    flag, so per-tower overrides don't skew step_tflops/mfu).
    Computed from the model config rather than XLA ``cost_analysis()``,
    which under-reports ~12x on the axon relay backend (measured: 7.76 TF
    vs the ~95 TF this formula and BASELINE.md agree on).

    ``packed_rows``: optional ``(caption_rows, template_rows, pack_len)`` —
    the EXECUTED text work of the --text-packing path (every [pack_len] row
    runs full GEMMs + one [P,P] attention pass); replaces the padded
    ``(2B+C) x ctx`` accounting so mfu_packed reflects executed FLOPs."""
    def tower_fwd(n_tok: int, width: int, layers: int, n_seq: int = 1) -> float:
        # per block: qkv/out/mlp GEMMs 24*N*D^2 + attention dots 4*L^2*D/seq
        return layers * (24 * n_seq * n_tok * width ** 2
                         + 4 * n_seq * n_tok ** 2 * width)

    v, t = cfg.vision, cfg.text
    grid = v.image_size // v.patch_size
    n_img = grid * grid + 1
    vis = (tower_fwd(n_img, v.width, v.layers)
           + 2 * n_img * (v.patch_size ** 2 * 3) * v.width
           + 2 * v.width * cfg.embed_dim) * batch
    proj = 2 * t.width * cfg.embed_dim * (2 * batch + num_classes)
    if packed_rows is None:
        txt = (tower_fwd(ctx, t.width, t.layers)) * (2 * batch + num_classes) + proj
    else:
        cap_rows, tpl_rows, pack_len = packed_rows
        txt = tower_fwd(pack_len, t.width, t.layers,
                        n_seq=cap_rows + tpl_rows) + proj
    mult_v = 3.9 if (remat if remat_vision is None else remat_vision) else 3.0
    mult_t = 3.9 if (remat if remat_text is None else remat_text) else 3.0
    return (vis * mult_v + txt * mult_t) / 1e12


def run(model: str = MODEL, batch: int = BATCH, remat: bool = False,
        ctx: int = 77, packing: int = 0, remat_text=None,
        remat_vision=None) -> dict:
    import jax

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models.tokenizer import get_tokenizer
    from latteclip_tpu.train.optim import make_optimizer, make_schedule
    from latteclip_tpu.train.state import (
        build_template_table,
        create_train_state,
        init_memory_bank,
    )
    from latteclip_tpu.train.step import LatteHParams, make_train_step

    cfg = get_model_config(model)
    classes = [f"class {i}" for i in range(47)]  # DTD-sized class count
    templates = [lambda c: f"{c} texture."]

    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tokenizer = get_tokenizer()
    bank = init_memory_bank(params, cfg, tokenizer, classes, templates)
    table = build_template_table(tokenizer, classes, templates)
    if ctx != table.shape[1]:
        table = np.asarray(table)[:, :ctx]
    optimizer = make_optimizer(make_schedule("cosine", 1e-5, warmup=10, total_steps=1000))
    state = create_train_state(params, optimizer, bank)
    hp = LatteHParams(remat=remat, text_packing=bool(packing),
                      remat_text=remat_text, remat_vision=remat_vision)
    from latteclip_tpu.core.mesh import tpu_compiler_options

    template_packed = None
    tpl_rows = 0
    if packing:
        from latteclip_tpu.data.packing import pack_template_table

        template_packed = pack_template_table(np.asarray(table), packing)
        tpl_rows = template_packed.tokens.shape[0]
    step = jax.jit(make_train_step(cfg, optimizer, hp, table,
                                   template_packed=template_packed),
                   donate_argnums=(0,), compiler_options=tpu_compiler_options())

    host_batch = make_batch(batch, cfg.vision.image_size, len(classes), ctx=ctx,
                            eot_id=tokenizer.eot_token_id, longtail=bool(packing))
    rows = 0
    if packing:
        from latteclip_tpu.data.packing import (
            pack_caption_batch,
            pack_rows_needed,
            token_lengths,
        )

        lens = np.concatenate([token_lengths(host_batch["per_image_tokens"]),
                               token_lengths(host_batch["per_group_tokens"])])
        need = pack_rows_needed(lens, packing)
        rows = -(-(need + max(2, need // 16)) // 8) * 8
        host_batch.update(pack_caption_batch(
            host_batch["per_image_tokens"], host_batch["per_group_tokens"],
            packing, rows))
    device_batch = {k: jax.device_put(v) for k, v in host_batch.items()}

    # NOTE: on the axon relay platform block_until_ready does not actually
    # block; force a real device sync with a host readback of a scalar.
    for i in range(WARMUP_STEPS):
        state, metrics = step(state, device_batch, jax.random.PRNGKey(i))
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, metrics = step(state, device_batch, jax.random.PRNGKey(100 + i))
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * MEASURE_STEPS / dt
    baseline = REFERENCE_V100_IMG_PER_SEC.get(model)
    out = {
        "metric": f"finetune_images_per_sec_per_chip_{model.replace('-', '').lower()}",
        "value": round(imgs_per_sec, 2),
        "unit": "images/s/chip",
        # no silently-wrong ratios: models without a derived per-config
        # baseline report null rather than dividing by another config's
        "vs_baseline": round(imgs_per_sec / baseline, 3) if baseline else None,
    }
    try:
        step_tf = analytic_step_tflops(
            cfg, batch, len(classes), ctx, remat,
            remat_vision=remat_vision, remat_text=remat_text,
            packed_rows=(rows, tpl_rows, packing) if packing else None)
        out["step_tflops"] = round(step_tf, 2)
        out["flops_per_sec"] = step_tf * 1e12 * MEASURE_STEPS / dt
    except AttributeError:  # non-ViT tower: no analytic model
        pass
    return out


def main() -> int:
    if len(sys.argv) > 1:  # manual: bench.py BATCH REMAT [MODEL] [PACKING]
        batch = int(sys.argv[1])
        remat = sys.argv[2] in ("1", "true", "True") if len(sys.argv) > 2 else False
        model = sys.argv[3] if len(sys.argv) > 3 else MODEL
        packing = int(sys.argv[4]) if len(sys.argv) > 4 else 0
        print(json.dumps(run(model=model, batch=batch, remat=remat, packing=packing)))
        return 0
    # (batch, remat) ladder: largest config that fits wins. v5e has 16G HBM;
    # bs512 needs per-block rematerialisation (the reference also runs bs512
    # with grad checkpointing on its 32G V100).
    attempts = [(BATCH, True), (BATCH // 2, True), (BATCH // 2, False), (BATCH // 4, False)]
    last_err = None
    for batch, remat in attempts:
        try:
            result = run(batch=batch, remat=remat)
            break
        except Exception as e:  # OOM surfaces as opaque remote-compile errors
            last_err = e
            result = None
            print(f"# bench config (batch={batch}, remat={remat}) failed: {e}", file=sys.stderr)
    if result is None:
        raise SystemExit(f"all bench configs failed: {last_err}")

    # robustness fields (VERDICT r3 #2) — never let them sink the headline.
    # Stages run in IMPORTANCE order under a wall-clock budget (degraded
    # relay sessions have measured 230s backend inits and ~12 MB/s uploads;
    # if the driver's timeout hits, the best numbers must already be in):
    # roofline (cheap, feeds every mfu) -> tuned B/32 (the 3.48x headline)
    # -> B/32 bs512 packed (3.19x at exact reference batch) -> packed B/16
    # -> ctx-cap. LATTECLIP_BENCH_BUDGET_S overrides (default 2700).
    import os

    t_start = time.perf_counter()
    budget = float(os.environ.get("LATTECLIP_BENCH_BUDGET_S", "2700"))

    def over_budget(stage: str) -> bool:
        elapsed = time.perf_counter() - t_start
        if elapsed > budget:
            print(f"# bench budget exhausted ({elapsed:.0f}s > {budget:.0f}s): "
                  f"skipping {stage}", file=sys.stderr)
            result.setdefault("skipped", []).append(stage)
            return True
        return False

    roofline = None
    try:
        roofline = measure_gemm_roofline()
        result["gemm_roofline_tflops"] = round(roofline / 1e12, 1)
        if "flops_per_sec" in result:
            result["mfu"] = round(result.pop("flops_per_sec") / roofline, 3)
    except Exception as e:
        print(f"# gemm roofline failed: {e}", file=sys.stderr)
        result.pop("flops_per_sec", None)

    if not over_budget("b32_tuned"):
        try:
            # the round-5 TUNED B/32 production config: bs384, NO remat
            # (fits in HBM once the layer stacks unroll — auto SCAN_UNROLL),
            # packed. Same objective/semantics, just a smaller per-chip
            # batch than the reference's 512; measured 2076.5 img/s = 3.48x
            # (BASELINE.md 2026-08-19).
            b32t = run(model="ViT-B-32", batch=384, remat=False, packing=128)
            result["value_b32_packed_tuned"] = b32t["value"]
            result["vs_baseline_b32_packed_tuned"] = b32t["vs_baseline"]
            if roofline and "flops_per_sec" in b32t:
                result["mfu_b32_packed_tuned"] = round(
                    b32t["flops_per_sec"] / roofline, 3)
        except Exception as e:
            print(f"# tuned b32 run failed: {e}", file=sys.stderr)

    if not over_budget("b32_packed"):
        try:
            # ViT-B/32 at the reference's own bs512 — the config every
            # reference run script pins (scripts/unsupervised/*.sh) — at
            # the packed production setting. Round 5: no-remat FITS once
            # the layer stacks unroll and measures 1903.6 = 3.19x
            # (BASELINE.md 2026-08-19); remat=True (1711 = 2.87x) is the
            # fallback in case a session regresses the no-remat fit.
            b32p = None
            for b32_remat in (False, True):
                try:
                    b32p = run(model="ViT-B-32", batch=batch,
                               remat=b32_remat, packing=128)
                    break
                except Exception as e:
                    print(f"# b32 packed (remat={b32_remat}) failed: {e}",
                          file=sys.stderr)
            if b32p is None:
                raise RuntimeError("both b32 packed configs failed")
            result["value_b32_packed"] = b32p["value"]
            result["vs_baseline_b32_packed"] = b32p["vs_baseline"]
            if roofline and "flops_per_sec" in b32p:
                result["mfu_b32_packed"] = round(
                    b32p["flops_per_sec"] / roofline, 3)
        except Exception as e:
            print(f"# b32 run failed: {e}", file=sys.stderr)

    if not over_budget("packed"):
        try:
            # --text-packing production number at ViT-B/16: variable-length
            # packed caption tower + static packed templates on an
            # LLaVA-like length distribution (median ~30 BPE tokens, tail
            # to 77). Exact semantics at ANY distribution
            # (tests/test_packed_step.py); throughput depends on it, so the
            # distribution is pinned in caption_lengths above.
            packed_result = run(batch=batch, remat=remat, packing=128)
            result["value_packed"] = packed_result["value"]
            result["vs_baseline_packed"] = packed_result["vs_baseline"]
            if roofline and "flops_per_sec" in packed_result:
                result["mfu_packed"] = round(
                    packed_result["flops_per_sec"] / roofline, 3)
        except Exception as e:
            print(f"# packed run failed: {e}", file=sys.stderr)

    if not over_budget("ctx_auto"):
        try:
            ctx_result = run(batch=batch, remat=remat, ctx=PRODUCTION_CTX)
            result["value_ctx_auto"] = ctx_result["value"]
            result["ctx_auto"] = PRODUCTION_CTX
        except Exception as e:
            print(f"# ctx-cap run failed: {e}", file=sys.stderr)

    result["bench_elapsed_s"] = round(time.perf_counter() - t_start, 1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Entry point: ``python -m latteclip_tpu.train.main`` (reference: training.main).

Wires the pieces the way the reference ``main()`` does
(``src/training/main.py:72-551``): resolve eval dataset + templates →
build/load model → init memory bank → optimizer + schedule → data pipeline →
epoch loop with per-epoch zero-shot eval + checkpointing. Also hosts the
eval-only and feature-extraction modes (``--extract-features-path``,
reference ``main.py:470-478``) and a hermetic ``--dataset-type synthetic``
smoke mode (reference ``data.py:812-862`` equivalent).
"""
from __future__ import annotations

import dataclasses
import logging
import math
import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.core import checkpoint as ckpt
from latteclip_tpu.core.config import get_model_config
from latteclip_tpu.core.mesh import initialize_distributed, make_mesh
from latteclip_tpu.data.eval_dataset import FlatFileDataset
from latteclip_tpu.data.pipeline import PipelineConfig, TrainPipeline, build_train_data
from latteclip_tpu.eval.features import extract_features
from latteclip_tpu.models import clip as clip_mod
from latteclip_tpu.models.tokenizer import get_tokenizer_for_config
from latteclip_tpu.train import loop as loop_mod
from latteclip_tpu.train.loop import LoopConfig, find_latest_checkpoint
from latteclip_tpu.train.optim import make_optimizer, make_schedule
from latteclip_tpu.train.params import parse_args
from latteclip_tpu.train.state import (
    build_template_table,
    create_train_state,
    init_memory_bank,
)
from latteclip_tpu.train.step import LatteHParams, make_flyp_step, make_train_step

logger = logging.getLogger("latteclip_tpu")


def setup_logging(log_path: Optional[str] = None):
    handlers = [logging.StreamHandler(sys.stderr)]
    if log_path:
        os.makedirs(os.path.dirname(log_path), exist_ok=True)
        handlers.append(logging.FileHandler(log_path))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(message)s",
        datefmt="%Y-%m-%d,%H:%M:%S",
        handlers=handlers,
        force=True,
    )


def resolve_preprocess_path(args) -> str:
    if args.eval_config_path and args.zeroshot_eval_data:
        # reference-style YAML task registry (abo.py:602-638)
        from latteclip_tpu.data.eval_config import expand_env, load_eval_config

        tasks = load_eval_config(args.eval_config_path)
        key = f"{args.zeroshot_eval_data}_val_zeroshot_classification"
        if key in tasks:
            return expand_env(str(tasks[key]["dataset_specific_kwargs"]["preprocess_path"]))
    if args.eval_preprocess_path:
        return args.eval_preprocess_path
    data_dir = args.data_dir or os.environ.get("LATTECLIP_DATA_DIR")
    if not data_dir or not args.zeroshot_eval_data:
        raise SystemExit(
            "need --eval-preprocess-path, or --zeroshot-eval-data with "
            "--data-dir / $LATTECLIP_DATA_DIR"
        )
    return os.path.join(data_dir, f"{args.zeroshot_eval_data}_preprocess")


def build_model(args):
    cfg = get_model_config(args.model)
    if args.precision == "fp32":
        cfg = dataclasses.replace(cfg, compute_dtype="float32")
    if args.force_quick_gelu:
        cfg = dataclasses.replace(cfg, quick_gelu=True)
    if args.force_image_size:
        # reference factory.py:225-227; the checkpoint loader bicubic-resizes
        # pretrained pos embeds to the new grid (core/checkpoint.py)
        patch = getattr(cfg.vision, "patch_size", None)
        if patch and args.force_image_size % patch != 0:
            raise SystemExit(
                f"--force-image-size {args.force_image_size} must be a "
                f"multiple of the model's patch size ({patch})"
            )
        cfg = dataclasses.replace(
            cfg, vision=dataclasses.replace(cfg.vision, image_size=args.force_image_size)
        )
    if args.pretrained:
        from latteclip_tpu.obs.file_sync import pt_load_path

        pretrained_src = args.pretrained
        if not (os.path.exists(pretrained_src) or pretrained_src.startswith("s3://")):
            # registry tag like the reference: --pretrained laion2b_s34b_b79k
            # resolves cache-first (core/pretrained.py; reference
            # pretrained.py:560-585)
            from latteclip_tpu.core.pretrained import get_pretrained_cfg, resolve_pretrained

            pcfg = get_pretrained_cfg(args.model, pretrained_src)
            if pcfg.get("quick_gelu") and not cfg.quick_gelu:
                cfg = dataclasses.replace(cfg, quick_gelu=True)
                logger.info("pretrained tag implies QuickGELU; enabled")
            # tag preprocessing metadata wins over config defaults (reference
            # PreprocessCfg merge, factory.py:382-396)
            overrides = {}
            if pcfg.get("mean") and not cfg.image_mean:
                overrides["image_mean"] = tuple(pcfg["mean"])
            if pcfg.get("std") and not cfg.image_std:
                overrides["image_std"] = tuple(pcfg["std"])
            if pcfg.get("resize_mode") and cfg.resize_mode == "shortest":
                overrides["resize_mode"] = pcfg["resize_mode"]
            if overrides:
                cfg = dataclasses.replace(cfg, **overrides)
                logger.info("pretrained tag preprocessing: %s", overrides)
            pretrained_src = resolve_pretrained(args.model, args.pretrained)
        params, bank_dict, _meta = ckpt.load_clip_pt(pt_load_path(pretrained_src), cfg)
        logger.info("loaded pretrained weights from %s", pretrained_src)
    else:
        from latteclip_tpu.core.config import CoCaConfig

        if isinstance(cfg, CoCaConfig):
            from latteclip_tpu.models.coca import init_coca_params

            params = init_coca_params(jax.random.PRNGKey(args.seed), cfg)
        else:
            params = clip_mod.init_clip_params(jax.random.PRNGKey(args.seed), cfg)
        bank_dict = {}
    return cfg, params, bank_dict


def _synthetic_root(args, cfg) -> str:
    import tempfile

    from latteclip_tpu.data import synthetic

    root = tempfile.mkdtemp(prefix="latteclip_synth_")
    synthetic.make_full_fixture(
        root,
        num_train=max(args.batch_size * 2, 64),
        num_val=32,
        image_size=cfg.vision.image_size,
    )
    return root


def _build_aug_config(aug_cfg: dict):
    """--aug-cfg key=value overrides -> transforms.AugConfig (reference
    params.py:549 + transform.py AugmentationCfg; unknown keys warn)."""
    from latteclip_tpu.data.transforms import AugConfig

    kw = {}
    for key, value in (aug_cfg or {}).items():
        if key == "scale":
            kw["scale_min"], kw["scale_max"] = float(value[0]), float(value[1])
        elif key == "color_jitter":
            kw["color_jitter"] = tuple(float(v) for v in value)
        elif key in ("color_jitter_prob", "gray_scale_prob"):
            kw[key] = float(value)
        else:
            logger.warning("ignoring unsupported --aug-cfg key: %s", key)
    return AugConfig(**kw)


_WARN_IGNORED_FLAGS = (
    # GPU/infra flags accepted for reference-script compat (params.py)
    "torchscript", "torchcompile", "trace", "horovod", "ddp_static_graph",
    "no_set_device_rank", "use_bnb_linear", "dist_url", "dist_backend",
    "debug", "copy_codebase", "log_local", "pretrained_image",
)


def _parse_upsampling(args):
    """--train-data-upsampling-factors: per-::-source weights expanded to
    per-shard weights (reference data.py:542-551; requires
    --dataset-resampled)."""
    if not args.train_data_upsampling_factors:
        return None
    if not args.dataset_resampled:
        raise SystemExit(
            "--train-data-upsampling-factors is only supported when sampling "
            "with replacement (--dataset-resampled), like the reference "
            "(data.py:543-545)")
    from latteclip_tpu.data.tar_reader import expand_shard_pattern

    factors = [float(v) for v in args.train_data_upsampling_factors.split("::")]
    sources = (args.train_data or "").split("::")
    if len(factors) != len(sources):
        raise SystemExit(
            f"--train-data-upsampling-factors has {len(factors)} entries for "
            f"{len(sources)} ::-separated --train-data sources")
    weights = []
    for src, w in zip(sources, factors):
        weights += [w] * len(expand_shard_pattern(src))
    return weights


def _apply_reference_compat_overrides(args, cfg):
    """Wire the reference-compat flags that override the model config
    (reference main.py:233-261) and surface the warn-ignored ones."""
    import dataclasses

    if args.imagenet_v2:
        raise SystemExit(
            "--imagenet-v2 needs the imagenetv2_pytorch dataset package "
            "(reference data.py:142-186), which is not installed in this "
            "environment"
        )
    ignored = [f for f in _WARN_IGNORED_FLAGS if getattr(args, f, None)]
    if ignored:
        logger.warning(
            "ignoring GPU/infra flags with no TPU counterpart: %s",
            ", ".join("--" + f.replace("_", "-") for f in ignored),
        )
    if args.image_interpolation and args.image_interpolation != "bicubic":
        logger.warning(
            "--image-interpolation %s is not implemented on the TPU resize "
            "path (bicubic/Keys-cubic only); using bicubic",
            args.image_interpolation,
        )
    changes = {}
    if args.image_mean:
        changes["image_mean"] = tuple(args.image_mean)
    if args.image_std:
        changes["image_std"] = tuple(args.image_std)
    if args.image_resize_mode:
        changes["resize_mode"] = args.image_resize_mode
    if args.force_patch_dropout is not None:
        changes["vision"] = dataclasses.replace(
            cfg.vision, patch_dropout=float(args.force_patch_dropout))
    if changes:
        cfg = dataclasses.replace(cfg, **changes)
    # reference spelling alias: unlocked LAYERS counts map onto our groups
    if args.lock_text_unlocked_layers:
        args.lock_text_unlocked_groups = max(
            args.lock_text_unlocked_groups, args.lock_text_unlocked_layers)
    return cfg


def main(argv=None) -> int:
    args = parse_args(argv)
    # escape hatch for hosts whose sitecustomize pins jax to a platform
    platform = os.environ.get("LATTECLIP_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    initialize_distributed()

    name = args.name or f"{args.model}_lr{args.lr}_b{args.batch_size}"
    log_dir = os.path.join(args.logs, name)
    checkpoint_dir = os.path.join(log_dir, "checkpoints")
    setup_logging(os.path.join(log_dir, "out.log") if jax.process_index() == 0 else None)
    logger.info("devices: %s", jax.devices())

    if jax.process_index() == 0:  # config dump, reference main.py:311-316
        os.makedirs(log_dir, exist_ok=True)
        with open(os.path.join(log_dir, "params.txt"), "w") as f:
            for k in sorted(vars(args)):
                f.write(f"{k}: {getattr(args, k)}\n")

    cfg, params, bank_dict = build_model(args)
    cfg = _apply_reference_compat_overrides(args, cfg)
    tokenizer = get_tokenizer_for_config(cfg)

    synthetic_mode = args.dataset_type == "synthetic"
    if synthetic_mode:
        preprocess_path = _synthetic_root(args, cfg)
        dataset_name = "dtd"
    else:
        preprocess_path = resolve_preprocess_path(args)
        dataset_name = args.zeroshot_eval_data or "default"

    split = args.extract_features_split
    eval_split_ds = FlatFileDataset(
        preprocess_path, train=(split == "train"),
        image_size=cfg.vision.image_size, dataset_name=dataset_name,
        resize_mode=cfg.resize_mode,
    )
    classnames = eval_split_ds.display_class_names
    templates = eval_split_ds.templates

    # ---- feature-extraction mode -------------------------------------------
    if args.extract_features_path:
        extract_features(
            params, cfg, tokenizer, eval_split_ds,
            args.extract_features_path, split,
            batch_size=args.batch_size,
        )
        return 0

    val_dataset = FlatFileDataset(
        preprocess_path, train=False,
        image_size=cfg.vision.image_size, dataset_name=dataset_name,
        resize_mode=cfg.resize_mode,
    )

    # ---- TTA evaluation mode (reference evaluate_tta, train.py:1216-1305) ----
    if args.tta or args.method in ("tpt", "rlcf"):
        from latteclip_tpu.eval.tta import TTAConfig, evaluate_tta

        tta_cfg = TTAConfig(
            n_views=args.tta_n_views, selection_p=args.selection_p,
            tta_steps=args.tta_step, lr=args.lr,
        )
        reward_params = reward_cfg = None
        if args.method == "rlcf":
            reward_cfg = get_model_config(args.reward_model or args.model)
            if args.reward_pretrained:
                reward_params, _, _ = ckpt.load_clip_pt(args.reward_pretrained, reward_cfg)
            else:
                reward_params = clip_mod.init_clip_params(jax.random.PRNGKey(1), reward_cfg)
        metrics = evaluate_tta(
            params, cfg, tokenizer, val_dataset, tta_cfg,
            method="rlcf" if args.method == "rlcf" else "tpt",
            reward_params=reward_params, reward_cfg=reward_cfg,
            max_samples=args.tta_max_samples, seed=args.seed,
        )
        logger.info("TTA eval: %s", {k: round(float(v), 4) for k, v in metrics.items()})
        return 0

    # ---- memory bank (reference main.py:262 -> model.py:489-499) ------------
    if bank_dict and all(c in bank_dict for c in classnames):
        bank = np.stack([bank_dict[c] for c in classnames])
        logger.info("restored memory bank from checkpoint (%d classes)", len(classnames))
    else:
        bank = init_memory_bank(params, cfg, tokenizer, classnames, templates)
        logger.info("initialized memory bank from templates (%d classes)", len(classnames))

    # ---- eval-only mode (reference main.py:474-494: no train data ->
    # evaluate once and exit) --------------------------------------------------
    if not args.train_data and not synthetic_mode:
        if not args.zeroshot_eval_data:
            raise SystemExit(
                "At least one train or eval dataset must be specified."
            )
        import optax

        from latteclip_tpu.train.loop import evaluate_zero_shot

        start_epoch = 0
        if args.resume and args.resume != "latest" and not args.pretrained:
            # reference eval-only loads the checkpoint via --resume
            # (main.py:367-394); --pretrained reaches the same loader
            from latteclip_tpu.obs.file_sync import pt_load_path

            params, r_bank, r_meta = ckpt.load_clip_pt(pt_load_path(args.resume), cfg)
            start_epoch = int(r_meta.get("epoch", 0))
            if r_bank and all(c in r_bank for c in classnames):
                bank = np.stack([r_bank[c] for c in classnames])
            logger.info("loaded eval checkpoint %s (epoch %d)", args.resume, start_epoch)

        eval_state = create_train_state(params, optax.identity(), bank)
        metrics = evaluate_zero_shot(
            eval_state, cfg, val_dataset, args.eval_batch_size,
            method=args.method, tokenizer=tokenizer,
            classnames=classnames, templates=templates,
        )
        logger.info(
            "Eval Epoch: %d %s", start_epoch,
            {k: round(float(v), 4) for k, v in metrics.items()},
        )
        from latteclip_tpu.obs.meters import append_results_jsonl

        append_results_jsonl(
            os.path.join(checkpoint_dir, "results.jsonl"),
            {"epoch": start_epoch, **{k: float(v) for k, v in metrics.items()}},
        )
        return 0

    # ---- data -----------------------------------------------------------------
    if synthetic_mode:
        train_shards = os.path.join(preprocess_path, "webdataset", "train_tars")
        clip_pred = os.path.join(preprocess_path, "clip_features_train.pkl")
        caption_dirs = [os.path.join(preprocess_path, "captions_per_image")]
        common_dirs = [os.path.join(preprocess_path, "captions_per_group")]
        num_samples = args.train_num_samples or args.batch_size * 2
    else:
        if not (args.train_data and args.clip_prediction_path):
            raise SystemExit("--train-data and --clip-prediction-path are required")
        train_shards = args.train_data
        clip_pred = args.clip_prediction_path
        caption_dirs = args.generated_captions_path or []
        common_dirs = args.generated_common_captions_path or []
        num_samples = args.train_num_samples
        if not num_samples:
            raise SystemExit("--train-num-samples is required for webdataset training")

    data = build_train_data(train_shards, clip_pred, caption_dirs, common_dirs,
                            classnames, tokenizer)
    context_cap_table = None
    if args.text_context_cap:
        from latteclip_tpu.data.pipeline import apply_context_cap

        table0 = build_template_table(tokenizer, classnames, templates)
        data, context_cap_table, eff, truncated = apply_context_cap(
            data, args.text_context_cap, tokenizer.eot_token_id, table0)
        logging.info(
            "text context cap: %s -> %d columns (%d caption rows truncated "
            "with forced EOT)", args.text_context_cap, eff, truncated)

    # ---- fusion-weight analysis mode (reference main.py:467-468) ------------
    if args.extract_group_weight_path:
        from latteclip_tpu.eval.group_weights import extract_group_weights
        from latteclip_tpu.train.state import init_memory_bank as _init_bank

        if bank_dict and all(c in bank_dict for c in classnames):
            gw_bank = np.stack([bank_dict[c] for c in classnames])
        else:
            gw_bank = _init_bank(params, cfg, tokenizer, classnames, templates)
        extract_group_weights(
            params, cfg, data, np.asarray(gw_bank), templates, tokenizer,
            args.extract_group_weight_path,
            batch_size=args.batch_size, image_size=cfg.vision.image_size,
        )
        logger.info("group weights written to %s", args.extract_group_weight_path)
        return 0

    if args.text_packing:
        from latteclip_tpu.models.hf_text import HFTextConfig

        if isinstance(cfg.text, HFTextConfig) or cfg.text.pool_type != "argmax" \
                or cfg.text.embed_cls:
            raise SystemExit(
                "--text-packing supports the native argmax-pool CLIP text "
                "tower only (HF towers and cls-token pooling pack differently)"
            )
        if args.method != "ours" or args.gamma:
            # the flyp/v1 trainers encode no per-sample captions — packing
            # then applies to the eval classifier builds only
            logger.info(
                "--text-packing with method=%s/gamma=%s: the trainer has no "
                "caption streams to pack; packing the eval classifier "
                "template encodes only", args.method, args.gamma,
            )

    aug = _build_aug_config(args.aug_cfg)
    dp_size = max(1, jax.device_count() // max(1, args.model_parallelism))
    pack_multiple = 8 * dp_size // math.gcd(8, dp_size)
    pipe_cfg = PipelineConfig(
        batch_size=args.batch_size,
        image_size=cfg.vision.image_size,
        seed=args.seed,
        num_threads=args.workers,
        host_index=jax.process_index(),
        host_count=jax.process_count(),
        use_native_jpeg=args.use_native_jpeg,
        raw_cache_bytes=args.raw_cache_mb * 1024**2,
        train_with_gt_text=args.train_with_gt_text,
        ondevice_resize=args.ondevice_resize,
        crop_scale=(aug.scale_min, aug.scale_max),
        resampled=args.dataset_resampled,
        upsampling_factors=_parse_upsampling(args),
        # only the v2 trainer consumes packed caption streams
        text_packing_len=(args.text_packing
                          if args.method == "ours" and not args.gamma else 0),
        text_packing_multiple=pack_multiple,
        text_packing_rows=args.text_packing_rows,
    )
    pipeline = TrainPipeline(data, pipe_cfg, num_samples)
    total_steps = pipeline.steps_per_epoch * args.epochs

    # ---- optimizer + step --------------------------------------------------
    cooldown = pipeline.steps_per_epoch * args.epochs_cooldown if args.epochs_cooldown else 0
    if args.skip_scheduler:
        # the reference never steps the scheduler (train.py:363): lr stays
        # at the optimizer's initial value
        schedule = make_schedule("const", args.lr, 0, total_steps)
    else:
        schedule = make_schedule(
            args.lr_scheduler, args.lr, args.warmup, total_steps,
            cooldown_steps=cooldown,
            cooldown_power=args.lr_cooldown_power,
            cooldown_end_lr=args.lr_cooldown_end,
        )
    optimizer = make_optimizer(
        schedule, beta1=args.beta1, beta2=args.beta2, eps=args.eps,
        weight_decay=args.wd, grad_clip_norm=args.grad_clip_norm,
        accum_steps=args.accum_freq,
        lock_image=args.lock_image, lock_text=args.lock_text,
        lock_image_unlocked_groups=args.lock_image_unlocked_groups,
        lock_text_unlocked_groups=args.lock_text_unlocked_groups,
    )

    hp = LatteHParams(
        alpha=args.alpha,
        use_template_caption=args.use_template_caption,
        use_image_caption=args.use_image_caption,
        use_batch_caption=args.use_batch_caption,
        use_zeroshot_pseudolabel=args.use_zeroshot_pseudolabel,
        use_finetune_pseudolabel=args.use_finetune_pseudolabel,
        remat=args.grad_checkpointing,
        remat_text=args.grad_checkpointing_text,
        remat_vision=args.grad_checkpointing_vision,
        bug_compat=args.fusion_bug_compat,
        fuse_text_fwd=args.fuse_text_forward and not args.text_packing,
        text_packing=bool(args.text_packing) and args.method == "ours"
        and not args.gamma,
    )
    table = build_template_table(tokenizer, classnames, templates)
    if context_cap_table is not None:
        table = context_cap_table
    from latteclip_tpu.core.config import CoCaConfig

    is_coca = isinstance(cfg, CoCaConfig)
    if is_coca and args.gamma:
        raise SystemExit("--gamma (legacy v1 trainer) does not support CoCa "
                         "models; use --method ours or flyp")
    if args.method == "ours":
        if args.siglip:
            raise SystemExit("--siglip applies to the contrastive baseline "
                             "paths (--method flyp/flyp_gt), matching the "
                             "reference's create_loss wiring")
        if args.gamma:
            # γ ≠ 0 selects the legacy-v1 momentum-prototype trainer — the
            # only reference path where --gamma has semantics (train.py:
            # 811-1126, momentum mix at :953; CLI-unreachable there, its
            # main.py:502-511 always dispatches v2). Without this, the flag
            # would be accepted-but-inert.
            from latteclip_tpu.train.step import make_v1_step

            logger.info(
                "gamma=%g: using the legacy v1 momentum-prototype trainer "
                "(reference train_one_epoch; detached text anchor, EMA bank "
                "mix of image features)", args.gamma,
            )
            step_fn = make_v1_step(cfg, optimizer, hp, table, gamma=args.gamma, aug=aug)
        else:
            template_packed = None
            if args.text_packing:
                from latteclip_tpu.data.packing import pack_template_table

                template_packed = pack_template_table(table, args.text_packing)
                logger.info(
                    "text packing: captions -> [R, %d] segment-masked rows; "
                    "templates packed to [%d, %d] (from [%d, %d])",
                    args.text_packing, template_packed.tokens.shape[0],
                    args.text_packing, table.shape[0], table.shape[1],
                )
            step_fn = make_train_step(
                cfg, optimizer, hp, table, aug=aug, template_packed=template_packed,
                # the v2 objective never touches CoCa's caption decoder;
                # torch skips grad=None params (no decay) — reproduce that
                zero_update_subtrees=("text_decoder",) if is_coca else (),
            )
    else:
        if args.siglip and "logit_bias" not in params:
            # reference SigLIP configs carry init_logit_bias (-10); inject it
            # when fine-tuning a CLIP checkpoint with the sigmoid loss
            params = dict(params, logit_bias=jnp.asarray(-10.0, jnp.float32))
        teacher = None
        if (args.distill_model is None) != (args.distill_pretrained is None):
            raise SystemExit(
                "--distill-model and --distill-pretrained must be given "
                "together (reference main.py:213-219)"
            )
        if args.distill_model is not None and args.distill_pretrained is not None:
            # frozen same-tokenizer teacher (reference main.py:213-219,265-272)
            from latteclip_tpu.core import checkpoint as _ckpt
            from latteclip_tpu.core.config import get_model_config as _gmc

            teacher_cfg = _gmc(args.distill_model)
            t_params, _, _ = _ckpt.load_clip_pt(args.distill_pretrained, teacher_cfg)
            teacher = (teacher_cfg, t_params)
            logger.info("distilling from %s (%s)", args.distill_model, args.distill_pretrained)
        coca_weights = None
        if is_coca:
            # reference create_loss: "coca" in model name -> CoCaLoss with
            # these CLI weights (factory.py:325-331)
            if args.siglip or teacher is not None:
                raise SystemExit("--siglip / --distill-model do not compose "
                                 "with CoCa models (reference create_loss "
                                 "dispatches CoCa first, factory.py:325-341)")
            coca_weights = (args.coca_caption_loss_weight,
                            args.coca_contrastive_loss_weight)
            logger.info(
                "CoCa fine-tune: CoCaLoss caption_w=%g clip_w=%g",
                *coca_weights,
            )
        step_fn = make_flyp_step(
            cfg, optimizer, hp, table,
            use_gt=(args.method == "flyp_gt"), use_siglip=args.siglip,
            teacher=teacher, aug=aug, coca_weights=coca_weights,
        )

    state = create_train_state(params, optimizer, bank)

    # ---- resume ----------------------------------------------------------------
    start_epoch = 0
    if args.resume:
        path = find_latest_checkpoint(checkpoint_dir) if args.resume == "latest" else args.resume
        if path:
            from latteclip_tpu.obs.file_sync import pt_load_path

            r_params, r_bank, r_meta = ckpt.load_clip_pt(pt_load_path(path), cfg)
            r_bank_arr = (
                np.stack([r_bank[c] for c in classnames])
                if r_bank and all(c in r_bank for c in classnames)
                else bank
            )
            start_epoch = int(r_meta.get("epoch", 0))
            if args.siglip and "logit_bias" not in r_params:
                # resuming --siglip from a plain-CLIP checkpoint: re-inject
                # the trainable bias (same as the fresh-params path above)
                r_params = dict(r_params, logit_bias=jnp.asarray(-10.0, jnp.float32))
            state = create_train_state(r_params, optimizer, r_bank_arr)
            resume_step = int(r_meta.get("step", start_epoch * pipeline.steps_per_epoch))
            state = state.replace(step=jnp.asarray(resume_step, jnp.int32))
            if "optimizer" in r_meta:
                # restore AdamW moments + the optax schedule count so the LR
                # schedule continues where it stopped (reference
                # main.py:378-379 restores optimizer.state_dict())
                state = state.replace(
                    opt_state=ckpt.restore_opt_state(state.opt_state, r_meta["optimizer"])
                )
                logger.info("resumed optimizer state (%d leaves)", len(r_meta["optimizer"]))
            else:
                logger.warning(
                    "checkpoint has no optimizer state; AdamW moments and the "
                    "LR schedule restart from step 0"
                )
            logger.info("resumed from %s (epoch %d, step %d)", path, start_epoch, resume_step)
        else:
            logger.info("no checkpoint to resume from in %s", checkpoint_dir)

    loop_cfg = LoopConfig(
        epochs=args.epochs,
        checkpoint_dir=checkpoint_dir,
        name=name,
        log_every_n_steps=args.log_every_n_steps,
        zeroshot_frequency=args.zeroshot_frequency,
        val_frequency=args.val_frequency,
        save_frequency=args.save_frequency,
        save_most_recent=args.save_most_recent,
        delete_previous_checkpoint=args.delete_previous_checkpoint,
        eval_batch_size=args.eval_batch_size,
        method=args.method,
        profile_dir=os.path.join(log_dir, "trace") if args.profile else None,
        profile_start_step=args.profile_start_step,
        profile_num_steps=args.profile_num_steps,
        lr_schedule=schedule,
        text_packing=args.text_packing,
    )
    imagenet_val_dataset = None
    if args.imagenet_val:
        from latteclip_tpu.data.folder_dataset import ImageFolderDataset

        imagenet_val_dataset = ImageFolderDataset(
            args.imagenet_val, image_size=cfg.vision.image_size,
            dataset_name="imagenet",
        )
    val_pairs_dataset = None
    if args.val_data:
        from latteclip_tpu.data.folder_dataset import CsvDataset

        val_pairs_dataset = CsvDataset(
            args.val_data, img_key=args.csv_img_key,
            caption_key=args.csv_caption_key, sep=args.csv_separator,
            image_size=cfg.vision.image_size,
        )
    from latteclip_tpu.obs.tensorboard import make_writers

    writers = make_writers(
        args.report_to, args.logs, name, jax.process_index() == 0,
        wandb_project=args.wandb_project_name, wandb_notes=args.wandb_notes,
        # reference main.py:451: resume='auto' when resuming from latest
        wandb_resume="auto" if args.resume == "latest" else None,
        config=vars(args),
    )
    remote_sync = None
    if args.remote_sync and jax.process_index() == 0:
        from latteclip_tpu.obs.file_sync import RemoteSync

        remote_sync = RemoteSync(
            log_dir, os.path.join(args.remote_sync, name),
            frequency_s=args.remote_sync_frequency,
            protocol=args.remote_sync_protocol,
        ).start()
        logger.info("remote sync -> %s every %ds", args.remote_sync, args.remote_sync_frequency)

    if args.model_parallelism > 1 and jax.process_count() > 1:
        # eval/checkpoint all-gather the TP shards to replicated on every
        # process before the host fetch (loop._host_local_{eval,save}_state)
        logger.info(
            "model_parallelism=%d across %d hosts: eval/checkpoint will "
            "all-gather TP params per epoch", args.model_parallelism,
            jax.process_count(),
        )
    mesh = make_mesh(model_parallelism=args.model_parallelism)
    loop_mod.train(
        state, step_fn, pipeline, cfg, loop_cfg,
        classnames=classnames,
        val_dataset=val_dataset,
        start_epoch=start_epoch,
        seed=args.seed,
        mesh=mesh,
        tokenizer=tokenizer,
        templates=templates,
        val_pairs_dataset=val_pairs_dataset,
        imagenet_val_dataset=imagenet_val_dataset,
        writers=writers,
    )
    for w in writers:
        w.close()
    if remote_sync is not None:
        remote_sync.final_sync()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

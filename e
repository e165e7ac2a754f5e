"""CoCa: contrastive captioner (reference ``coca_model.py`` +
``transformer.py:565-803``).

Three parts, all pure functions over a param pytree:

* **text tower with class token** (``embed_cls=True``, reference
  transformer.py:598-708): the class embedding is appended AFTER the text,
  the attention mask combines causality with per-sample pad masking (padded
  keys are invisible — reference ``build_cls_mask``, transformer.py:663-670),
  pooling takes the last (cls) position and applies ``ln_final`` after
  pooling;
* **vision tower with attentional pooling** returning pooled + token
  embeddings (``models/vit.py`` with ``output_tokens``);
* **multimodal decoder** (reference MultimodalTransformer,
  transformer.py:711-803): per layer a causal self-attention block over the
  text token embeddings followed by a cross-attention block (ln_1_kv on the
  image tokens), then ``ln_final`` and a width→vocab projection producing
  caption logits.

``coca_loss`` reproduces CoCaLoss (loss.py:278-321): weighted contrastive +
caption CE ignoring pad positions. ``generate`` implements greedy / top-k
sampling with a fixed-shape decode loop (one compile, causality makes the
padded suffix invisible); ``generate_beamsearch`` reproduces the reference's
grouped beam search (coca_model.py:268-478) with HF ``BeamSearchScorer``
semantics natively (tests/test_coca.py checks both against the torch oracle).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.core.config import CoCaConfig, TextConfig
from latteclip_tpu.models import layers as L
from latteclip_tpu.models import text as text_mod
from latteclip_tpu.models import vit as vit_mod
from latteclip_tpu.models.layers import Params, l2_normalize
from latteclip_tpu.train.objective import clip_loss

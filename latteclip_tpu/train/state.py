"""Train state: params + optimizer state + prototype memory bank.

The memory bank is a dense ``[C, D]`` f32 array (one row per class), not the
reference's dict-of-parameters (``src/open_clip/model.py:489-499``) — gathers
(``bank[preds]``) and the per-class segment-mean update become single XLA
ops. Row order follows the classname list, which also defines the
``memory_bank.<classname>`` keys when exporting OpenCLIP checkpoints.

``prototypes`` is the epoch-start snapshot of the bank: the reference stacks
the bank once per epoch and uses that frozen copy for confidence weights all
epoch (``src/training/train.py:347-350``) while the per-step classifier and
anchors read the live bank — both behaviors are preserved.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from latteclip_tpu.core.config import CLIPConfig
from latteclip_tpu.models import clip as clip_mod
from latteclip_tpu.models.tokenizer import ClipTokenizer
from latteclip_tpu.core.mesh import tpu_jit


@struct.dataclass
class TrainState:
    step: jnp.ndarray                  # i32 scalar
    params: Any                        # model param pytree
    opt_state: Any
    memory_bank: jnp.ndarray           # [C, D] f32, L2-normalized rows
    prototypes: jnp.ndarray            # [C, D] epoch-start snapshot

    def start_epoch(self) -> "TrainState":
        """Snapshot the live bank into the epoch prototypes (train.py:347-350).

        Copies: prototypes must not alias the bank, the train step donates
        the whole state (same-buffer-donated-twice error otherwise).
        """
        return self.replace(prototypes=jnp.array(self.memory_bank, copy=True))


def init_memory_bank(
    params,
    cfg: CLIPConfig,
    tokenizer: ClipTokenizer,
    classnames: Sequence[str],
    templates: Sequence[Callable[[str], str]],
) -> jnp.ndarray:
    """bank[c] = normalized encode_text(templates[0](classname)) — reference
    ``init_memory_bank`` (model.py:489-499)."""
    texts = [templates[0](c) for c in classnames]
    tokens = tokenizer(texts)

    @tpu_jit
    def encode(p, t):
        return clip_mod.encode_text(p, cfg, t, normalize=True)

    return jnp.asarray(encode(params, tokens), dtype=jnp.float32)


def build_template_table(
    tokenizer: ClipTokenizer,
    classnames: Sequence[str],
    templates: Sequence[Callable[[str], str]],
) -> np.ndarray:
    """[C, ctx] int32: pre-tokenized templates[0](classname) for every class.

    Replaces the reference's per-step CPU BPE over predicted classnames
    (train.py:433-434) with a device-side gather ``table[preds]``.
    """
    return tokenizer([templates[0](c) for c in classnames])


def create_train_state(
    params,
    optimizer: optax.GradientTransformation,
    memory_bank: jnp.ndarray,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        memory_bank=jnp.asarray(memory_bank, jnp.float32),
        # independent copy: bank and prototypes must not alias, the train
        # step donates the whole state (same-buffer-donated-twice error)
        prototypes=jnp.array(memory_bank, jnp.float32, copy=True),
    )

"""Host-side variable-length sequence packing for the text tower.

The reference pads every caption to the model context (77 tokens —
reference src/open_clip/tokenizer.py:250-258) and runs the text tower on
``B x 77`` rows; ``--text-context-cap`` already shrinks that to the dataset
cap with exact semantics. True packing goes further: real-length token runs
are packed end to end into ``[R, P]`` rows (next-fit, deterministic) and the
attention kernel masks cross-segment entries from a ``[R, P]`` segment-id
plane (kernels.attention_core_qkv_segmented). Causal masking + EOT pooling
make this EXACT for CLIP text towers: a token only ever sees its own
segment's earlier tokens, and pooling gathers the per-sequence EOT position.

All tokenization in this pipeline happens up front, so the packer can run
per batch on the host (numpy) and a dataset-level row count can be chosen
once for a static jit shape (``rows=`` parameter).
"""
from __future__ import annotations

import logging
from typing import Dict, NamedTuple, Optional

import numpy as np

logger = logging.getLogger(__name__)


class PackedText(NamedTuple):
    """Static-shape packed batch; every array is numpy, ready to ship."""

    tokens: np.ndarray     # [R, P] int32, 0-padded
    positions: np.ndarray  # [R, P] int32, position within own sequence
    seg_ids: np.ndarray    # [R, P] int32, 1-based per row, 0 = padding
    eot_row: np.ndarray    # [N] int32, packed row of sequence n's EOT token
    eot_col: np.ndarray    # [N] int32, packed column of sequence n's EOT


def pack_rows_needed(lengths: np.ndarray, pack_len: int) -> int:
    """Rows the next-fit packer will use for ``lengths`` (same algorithm)."""
    rows, fill = 0, pack_len  # force a first row
    for n in np.asarray(lengths, np.int64):
        if n > pack_len - fill:
            rows, fill = rows + 1, 0
        fill += int(n)
    return rows


def pack_token_rows(
    tokens: np.ndarray,
    lengths: np.ndarray,
    pack_len: int = 128,
    rows: Optional[int] = None,
) -> PackedText:
    """Pack ``tokens[n, :lengths[n]]`` runs into ``[R, pack_len]`` rows.

    ``lengths[n]`` counts the real tokens incl. SOT/EOT (EOT at
    ``lengths[n]-1``). Next-fit: sequences are placed in order; a sequence
    that does not fit in the current row starts a new one — deterministic
    and O(N). ``rows`` pins the output row count (static jit shapes across
    batches); it must be >= the packed need.
    """
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths, np.int64)
    N, ctx = tokens.shape
    assert lengths.min() >= 1 and lengths.max() <= min(pack_len, ctx), (
        f"lengths must be in [1, {min(pack_len, ctx)}], got "
        f"[{lengths.min()}, {lengths.max()}]"
    )

    need = pack_rows_needed(lengths, pack_len)
    R = need if rows is None else rows
    if R < need:
        raise ValueError(f"rows={rows} < packed need {need}")

    # next-fit placement: a cheap integer loop over sequences (the running
    # fill makes it inherently sequential), then ONE vectorized scatter per
    # plane for the token movement — the packer sits on the input pipeline's
    # critical path, and a per-token Python loop measurably host-binds the
    # full training loop on few-core machines (BASELINE.md full-loop rows).
    seq_row = np.empty(N, np.int64)   # packed row of each sequence
    seq_col = np.empty(N, np.int64)   # start column within its row
    seq_seg = np.empty(N, np.int64)   # 1-based segment id within its row
    row, fill, seg_in_row = 0, 0, 0
    for n in range(N):
        ln = int(lengths[n])
        if ln > pack_len - fill:
            row, fill, seg_in_row = row + 1, 0, 0
        seg_in_row += 1
        seq_row[n] = row
        seq_col[n] = fill
        seq_seg[n] = seg_in_row
        fill += ln

    total = int(lengths.sum())
    tok_seq = np.repeat(np.arange(N, dtype=np.int64), lengths)  # token -> seq
    cum0 = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    pos = np.arange(total, dtype=np.int64) - cum0[tok_seq]      # pos in seq

    out = np.zeros(R * pack_len, np.int32)
    positions = np.zeros(R * pack_len, np.int32)
    seg_ids = np.zeros(R * pack_len, np.int32)
    dest = seq_row[tok_seq] * pack_len + seq_col[tok_seq] + pos
    out[dest] = tokens.reshape(-1)[tok_seq * ctx + pos]
    positions[dest] = pos
    seg_ids[dest] = seq_seg[tok_seq]
    return PackedText(
        out.reshape(R, pack_len),
        positions.reshape(R, pack_len),
        seg_ids.reshape(R, pack_len),
        seq_row.astype(np.int32),
        (seq_col + lengths - 1).astype(np.int32),
    )


def token_lengths(tokens: np.ndarray) -> np.ndarray:
    """Real lengths of padded token rows: EOT position + 1.

    The CLIP tokenizer gives EOT the highest id in every row (reference
    src/open_clip/tokenizer.py:250-258; argmax pooling relies on the same
    invariant), so ``argmax`` finds it. All-zero rows (missing caption — the
    pipeline's zero filler) get length 1: the packed forward then pools
    position 0 of token 0, exactly what the padded tower computes for them.
    """
    return np.argmax(np.asarray(tokens), axis=-1).astype(np.int64) + 1


def pack_template_table(table: np.ndarray, pack_len: int = 128) -> PackedText:
    """Pack the static per-class template table once (step-build time).

    Template rows are short ("a photo of a <classname>." — typically 8-16
    BPE tokens), so the packed template forward touches ~C*len tokens
    instead of C*ctx. Rows are padded up to a multiple of 8 (sublane-
    friendly; padding rows are seg_id 0 = fully masked).
    """
    table = np.asarray(table)
    lengths = token_lengths(table)
    need = pack_rows_needed(lengths, pack_len)
    return pack_token_rows(table, lengths, pack_len, rows=-(-need // 8) * 8)


def pack_caption_batch(
    per_image_tokens: np.ndarray,
    per_group_tokens: np.ndarray,
    pack_len: int,
    rows: int,
) -> Dict[str, np.ndarray]:
    """Pack both caption streams of one train batch into device-ready arrays.

    Sequence order is [per_image (B), per_group (B)] — the step splits the
    [2B, E] packed-forward output back into the two streams. ``rows`` pins
    the static row count (caller chooses the jit bucket; padding rows are
    seg_id 0 = masked). Field names match what ``train.step`` reads.
    """
    N = per_image_tokens.shape[0]
    tokens = np.concatenate([per_image_tokens, per_group_tokens], axis=0)
    packed = pack_token_rows(tokens, token_lengths(tokens), pack_len, rows=rows)
    assert packed.eot_row.shape[0] == 2 * N
    return {
        "cap_tokens": packed.tokens,
        "cap_positions": packed.positions,
        "cap_seg_ids": packed.seg_ids,
        "cap_eot_row": packed.eot_row,
        "cap_eot_col": packed.eot_col,
    }


class PackRowBucketer:
    """Monotonic row-count bucketing for static jit shapes across batches.

    Per-batch packed need varies; jit wants few distinct shapes. Each batch's
    need (+ ~6% slack) is rounded up to ``multiple`` and the running maximum
    is kept, so row counts only ever grow — in practice one or two jit
    specializations per run for a stationary caption-length distribution.
    ``fixed`` pins the count outright (required in multi-host jobs, where
    per-host adaptive buckets would disagree on the global array shape).
    """

    def __init__(self, multiple: int = 8, fixed: Optional[int] = None):
        self.multiple = max(1, int(multiple))
        self.fixed = fixed
        self._rows = 0

    def rows_for(self, need: int) -> int:
        if self.fixed is not None:
            if need > self.fixed:
                raise ValueError(
                    f"--text-packing-rows {self.fixed} < packed need {need}; "
                    "raise the fixed row count"
                )
            return self.fixed
        padded = need + max(2, need // 16)
        m = self.multiple
        grown = -(-padded // m) * m
        if grown > self._rows:
            # each growth is one jit respecialization; the settled value is
            # what --text-packing-rows should pin in multi-host jobs
            logger.info("text-packing row bucket: %d -> %d rows", self._rows, grown)
            self._rows = grown
        return self._rows

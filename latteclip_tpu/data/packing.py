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

from typing import NamedTuple, Optional

import numpy as np


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

    out = np.zeros((R, pack_len), np.int32)
    positions = np.zeros((R, pack_len), np.int32)
    seg_ids = np.zeros((R, pack_len), np.int32)
    eot_row = np.zeros(N, np.int32)
    eot_col = np.zeros(N, np.int32)

    row, fill, seg_in_row = 0, 0, 0
    for n in range(N):
        ln = int(lengths[n])
        if ln > pack_len - fill:
            row, fill, seg_in_row = row + 1, 0, 0
        seg_in_row += 1
        sl = slice(fill, fill + ln)
        out[row, sl] = tokens[n, :ln]
        positions[row, sl] = np.arange(ln, dtype=np.int32)
        seg_ids[row, sl] = seg_in_row
        eot_row[n] = row
        eot_col[n] = fill + ln - 1
        fill += ln
    return PackedText(out, positions, seg_ids, eot_row, eot_col)

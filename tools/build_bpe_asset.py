#!/usr/bin/env python
"""Build the CLIP BPE merge asset consumed by latteclip_tpu.models.tokenizer.

The merge list is the standard public OpenAI CLIP byte-level BPE vocabulary
(originally shipped as ``bpe_simple_vocab_16e6.txt.gz`` with openai/CLIP; the
reference repo vendors the same file at
``/root/reference/src/open_clip/bpe_simple_vocab_16e6.txt.gz``,
cf. reference ``src/open_clip/tokenizer.py:26-28``). This tool re-serialises
the *active* slice of that list (the 48,894 merges the tokenizer actually
uses, cf. reference ``src/open_clip/tokenizer.py:139``) into our own asset
format: gzip-compressed UTF-8 text, one ``first second`` merge per line, no
header line.

Usage:
    python tools/build_bpe_asset.py [SRC_GZ] [DST_GZ]
"""
import gzip
import sys
from pathlib import Path

DEFAULT_SRC = "/root/reference/src/open_clip/bpe_simple_vocab_16e6.txt.gz"
DEFAULT_DST = Path(__file__).resolve().parent.parent / "latteclip_tpu" / "assets" / "clip_bpe_merges.txt.gz"

# The OpenAI vocab file contains a header line followed by ~262k candidate
# merges; CLIP only uses the first 49152-256-2 = 48,894 of them.
NUM_MERGES = 49152 - 256 - 2


def main():
    src = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(DEFAULT_SRC)
    dst = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(DEFAULT_DST)
    lines = gzip.open(src).read().decode("utf-8").split("\n")
    merges = lines[1 : NUM_MERGES + 1]
    for m in merges:
        assert len(m.split()) == 2, f"malformed merge line: {m!r}"
    dst.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(dst, "wb", compresslevel=9) as f:
        f.write("\n".join(merges).encode("utf-8"))
    print(f"wrote {len(merges)} merges -> {dst}")


if __name__ == "__main__":
    main()

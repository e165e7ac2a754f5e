"""Byte-level BPE tokenizer producing OpenAI-CLIP-compatible token ids.

Behavior-compatible with the reference tokenizer (reference
``src/open_clip/tokenizer.py:127-259``): same byte→unicode table, same merge
ranks (public OpenAI CLIP vocabulary, re-serialised into
``latteclip_tpu/assets/clip_bpe_merges.txt.gz``), same special tokens
(``<start_of_text>``=49406, ``<end_of_text>``=49407), same default context
length (77) and pad/truncate rules (zero padding, forced EOT on truncation,
cf. reference ``src/open_clip/tokenizer.py:250-258``).

Implementation is TPU-framework-native: pure Python + numpy (no torch); the
output is an ``int32 [N, context_length]`` array ready for
``jax.device_put``. Training never calls this in the hot loop — all caption
fields and the per-class template table are pre-tokenized (see
``latteclip_tpu/data`` and ``latteclip_tpu/train``), which removes the
reference's in-step CPU BPE bottleneck (reference
``src/training/train.py:433-434``).
"""
from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import regex as re

DEFAULT_CONTEXT_LENGTH = 77

_ASSET_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "assets", "clip_bpe_merges.txt.gz")

try:  # optional: mojibake repair, identity on clean text
    import ftfy as _ftfy
except ImportError:  # pragma: no cover - environment dependent
    _ftfy = None


@lru_cache()
def default_merge_path() -> str:
    env = os.environ.get("LATTECLIP_BPE_PATH")
    if env:
        return env
    return os.path.normpath(_ASSET_PATH)


@lru_cache()
def byte_to_unicode() -> Dict[int, str]:
    """GPT-2 style reversible byte→printable-unicode mapping.

    Printable ASCII and two Latin-1 ranges map to themselves; the remaining
    68 byte values are displaced into the 0x100+ plane so no token string
    ever contains whitespace/control characters.
    """
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    mapping = {b: chr(b) for b in keep}
    offset = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + offset)
            offset += 1
    return mapping


def _basic_clean(text: str) -> str:
    if _ftfy is not None:
        text = _ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


_WS_RE = re.compile(r"\s+")


def _whitespace_clean(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def clean_text(text: str, mode: str = "lower") -> str:
    if mode == "lower":
        return _whitespace_clean(_basic_clean(text)).lower()
    if mode == "whitespace":
        return _whitespace_clean(_basic_clean(text))
    raise ValueError(f"unknown clean mode: {mode}")


def canonicalize_text(text: str, keep_punctuation_exact_string: Optional[str] = None) -> str:
    """big_vision canonicalization: lowercase, punctuation stripped,
    ``_`` -> space (reference tokenizer.py:104-124; SigLIP text cleaning)."""
    import string

    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(str.maketrans("", "", string.punctuation))
            for part in text.split(keep_punctuation_exact_string)
        )
    else:
        text = text.translate(str.maketrans("", "", string.punctuation))
    text = text.lower()
    return _WS_RE.sub(" ", text).strip()


def _adjacent_pairs(word: Tuple[str, ...]) -> set:
    return set(zip(word[:-1], word[1:]))


class ClipTokenizer:
    """CLIP byte-level BPE with numpy output.

    Vocabulary layout (id order): 256 byte symbols, 256 byte symbols with
    ``</w>`` suffix, 48,894 merge results, then ``<start_of_text>`` and
    ``<end_of_text>`` — 49,408 entries total, matching the reference's
    ``vocab_size`` (reference ``src/open_clip/model_configs/ViT-B-32.json``).
    """

    def __init__(
        self,
        merge_path: Optional[str] = None,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "lower",
    ):
        self.byte_encoder = byte_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        path = merge_path or default_merge_path()
        raw = gzip.open(path).read().decode("utf-8")
        merges: List[Tuple[str, str]] = [tuple(line.split()) for line in raw.split("\n") if line]
        self.merge_rank: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}

        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        self.special_tokens = ["<start_of_text>", "<end_of_text>"]
        vocab += self.special_tokens
        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder: Dict[int, str] = {i: tok for tok, i in self.encoder.items()}
        self.vocab_size = len(self.encoder)
        self.sot_token_id = self.encoder["<start_of_text>"]
        self.eot_token_id = self.encoder["<end_of_text>"]
        self.context_length = context_length
        self.clean_mode = clean

        special = "|".join(self.special_tokens)
        self.pattern = re.compile(
            special + r"""|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self._bpe_cache: Dict[str, str] = {t: t for t in self.special_tokens}

    # -- BPE ---------------------------------------------------------------
    def bpe(self, token: str) -> str:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        word: Tuple[str, ...] = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            return token + "</w>"
        pairs = _adjacent_pairs(word)
        while True:
            best = min(pairs, key=lambda p: self.merge_rank.get(p, float("inf")))
            if best not in self.merge_rank:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            n = len(word)
            while i < n:
                if word[i] == first and i + 1 < n and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    # skip ahead to the next occurrence of `first` in one go
                    try:
                        j = word.index(first, i)
                    except ValueError:
                        merged.extend(word[i:])
                        break
                    merged.extend(word[i:j])
                    if j + 1 < n and word[j + 1] == second:
                        merged.append(first + second)
                        i = j + 2
                    else:
                        merged.append(word[j])
                        i = j + 1
            word = tuple(merged)
            if len(word) == 1:
                break
            pairs = _adjacent_pairs(word)
        result = " ".join(word)
        self._bpe_cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = clean_text(text, self.clean_mode)
        for token in re.findall(self.pattern, text):
            unicode_token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self.bpe(unicode_token).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        data = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return data.decode("utf-8", errors="replace").replace("</w>", " ")

    # -- batching ----------------------------------------------------------
    def __call__(
        self,
        texts: Union[str, Sequence[str]],
        context_length: Optional[int] = None,
    ) -> np.ndarray:
        """Tokenize to a zero-padded ``int32 [N, context_length]`` array."""
        if isinstance(texts, str):
            texts = [texts]
        ctx = context_length or self.context_length
        assert ctx, "context_length must be set"
        out = np.zeros((len(texts), ctx), dtype=np.int32)
        for row, text in enumerate(texts):
            ids = [self.sot_token_id] + self.encode(text) + [self.eot_token_id]
            if len(ids) > ctx:
                ids = ids[:ctx]
                ids[-1] = self.eot_token_id
            out[row, : len(ids)] = ids
        return out


@lru_cache()
def get_tokenizer(context_length: int = DEFAULT_CONTEXT_LENGTH) -> ClipTokenizer:
    return ClipTokenizer(context_length=context_length)


def get_tokenizer_for_config(cfg):
    """Config-aware tokenizer dispatch (reference ``factory.get_tokenizer``,
    factory.py:82-124): CLIP BPE for the fused text tower, HF AutoTokenizer
    for HF text towers (``hf_tokenizer_name``), SigLIP sentencepiece for
    SigLIP vocabs. HF/SigLIP tokenizers need their files locally (no network
    egress here) — a tokenizer with the WRONG vocabulary must never be
    silently substituted, so misses raise instead of falling back."""
    from latteclip_tpu.models.hf_text import HFTextConfig

    text = cfg.text
    if isinstance(text, HFTextConfig):
        name = text.tokenizer_name or text.model_name
        try:
            return HFTokenizerWrapper(name, context_length=text.context_length)
        except Exception as e:
            raise RuntimeError(
                f"model {cfg.name!r} needs the HF tokenizer {name!r}; it is "
                "not available locally (no network egress). Fetch its files "
                "and pass a local path via the model JSON's "
                "hf_tokenizer_name, or pre-tokenize inputs."
            ) from e
    if getattr(text, "hf_tokenizer_name", ""):
        # native tower + HF vocab (CLIPA: bert wordpiece, strip_sep_token)
        name = text.hf_tokenizer_name
        try:
            return HFTokenizerWrapper(
                name, context_length=text.context_length,
                strip_sep_token=getattr(text, "strip_sep_token", False),
            )
        except Exception as e:
            raise RuntimeError(
                f"model {cfg.name!r} needs the HF tokenizer {name!r}; it is "
                "not available locally (no network egress). Fetch its files "
                "and point hf_tokenizer_name at the local path, or "
                "pre-tokenize inputs."
            ) from e
    if text.vocab_size == 49408:
        return get_tokenizer(text.context_length)
    # non-CLIP vocab without an HF tokenizer: SigLIP sentencepiece family.
    # $LATTECLIP_SIGLIP_VOCAB supplies the local sentencepiece.model path
    # (the registry names alone cannot be fetched without egress).
    name = os.environ.get(
        "LATTECLIP_SIGLIP_VOCAB",
        "mc4" if text.vocab_size >= 200000 else "c4-en",
    )
    return SigLipTokenizer(name, context_length=text.context_length)


# ---------------------------------------------------------------------------
# Reduction (token-dropping) strategies for over-long texts
# (behavioral parity with reference src/open_clip/tokenizer.py:274-394;
# 'syntax' requires nltk and is intentionally unsupported here)
# ---------------------------------------------------------------------------

def random_mask_tokenize(
    tokenizer: ClipTokenizer,
    texts: Union[str, Sequence[str]],
    context_length: Optional[int] = None,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Randomly drop tokens to fit (keep order unless ``shuffle``)."""
    if isinstance(texts, str):
        texts = [texts]
    rng = rng or np.random.default_rng()
    ctx = context_length or tokenizer.context_length
    out = np.zeros((len(texts), ctx), dtype=np.int32)
    for row, text in enumerate(texts):
        ids = np.asarray(tokenizer.encode(text), dtype=np.int32)
        if len(ids) > ctx - 2:
            keep = rng.permutation(len(ids))[: ctx - 2]
            if not shuffle:
                keep = np.sort(keep)
            ids = ids[keep]
        out[row, 0] = tokenizer.sot_token_id
        out[row, 1 : len(ids) + 1] = ids
        out[row, len(ids) + 1] = tokenizer.eot_token_id
    return out


def simple_mask_tokenize(
    tokenizer: ClipTokenizer,
    texts: Union[str, Sequence[str]],
    context_length: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Keep a random contiguous block of tokens that fits."""
    if isinstance(texts, str):
        texts = [texts]
    rng = rng or np.random.default_rng()
    ctx = context_length or tokenizer.context_length
    out = np.zeros((len(texts), ctx), dtype=np.int32)
    for row, text in enumerate(texts):
        ids = tokenizer.encode(text)
        if len(ids) > ctx - 2:
            start = int(rng.integers(0, len(ids) - (ctx - 2) + 1))
            ids = ids[start : start + ctx - 2]
        full = [tokenizer.sot_token_id] + list(ids) + [tokenizer.eot_token_id]
        out[row, : len(full)] = full
    return out


_SYNTAX_STOPWORDS = frozenset(
    "a an the of in on at to for with and or is are was were be been being "
    "this that these those it its his her their our your my as by from".split()
)
_NOUN_SUFFIXES = ("tion", "ment", "ness", "ity", "ance", "ence", "ship", "ist", "ism")
_ADJ_SUFFIXES = ("ful", "ous", "ive", "able", "ible", "al", "ish", "less", "est", "ed", "y")
_VERB_SUFFIXES = ("ing", "ize", "ise", "ate", "ify")


def _heuristic_pos_order(word: str) -> int:
    """Fallback NN/JJ/VB/other priority when nltk data is unavailable
    (suffix heuristics; nouns first, like the reference's ``get_order``)."""
    w = word.lower()
    if w in _SYNTAX_STOPWORDS or not w.isalpha():
        return 4
    if w.endswith(_NOUN_SUFFIXES):
        return 1
    if w.endswith(_VERB_SUFFIXES):
        return 3
    if w.endswith(_ADJ_SUFFIXES):
        return 2
    return 1  # bare content word: treat as noun (keep), like NN default


def syntax_mask_tokenize(
    tokenizer: ClipTokenizer,
    texts: Union[str, Sequence[str]],
    context_length: Optional[int] = None,
) -> np.ndarray:
    """Part-of-speech-prioritized reduction (reference ``syntax_mask_tokenize``,
    tokenizer.py:325-394): words are ranked nouns(1) < adjectives(2) <
    verbs(3) < other(4), the best ``ctx-2`` kept in original order, then
    tokenized with truncation.

    Uses nltk's tagger when its data is installed; in offline environments
    (no ``punkt``/``averaged_perceptron_tagger``) a documented suffix/stop-
    word heuristic provides the same keep-nouns-first behavior instead of
    crashing (the reference hard-requires the nltk download).
    """
    if isinstance(texts, str):
        texts = [texts]
    ctx = context_length or tokenizer.context_length

    def rank_words(text):
        try:
            import nltk

            words = nltk.tokenize.word_tokenize(text)
            tags = nltk.pos_tag(words)
            order = {"N": 1, "J": 2, "V": 3}
            return words, [order.get(t[:1], 4) if t[:2] in ("NN", "JJ", "VB") or t[:1] in "NJV" else 4
                           for _, t in tags]
        except Exception:
            words = re.findall(r"[\w']+|[.,!?;]", text)
            return words, [_heuristic_pos_order(w) for w in words]

    out = np.zeros((len(texts), ctx), dtype=np.int32)
    for row, text in enumerate(texts):
        words, order = rank_words(text)
        keep = sorted(np.argsort(np.asarray(order), kind="stable")[: ctx - 2])
        reduced = " ".join(str(words[i]) for i in keep)
        ids = [tokenizer.sot_token_id] + tokenizer.encode(reduced) + [tokenizer.eot_token_id]
        if len(ids) > ctx:
            ids = ids[:ctx]
            ids[-1] = tokenizer.eot_token_id
        out[row, : len(ids)] = ids
    return out


class MiniSentencePiece:
    """Dependency-free sentencepiece ``.model`` reader + unigram encoder.

    Parses the serialized ``ModelProto`` directly off the protobuf wire
    format (varint / fixed32 / length-delimited — the same hand-rolled
    discipline as the repo's TFRecord/Event writers) and encodes with the
    unigram Viterbi algorithm the sentencepiece library uses: best-scoring
    segmentation of the ``▁``-marked text over the vocab pieces, unknown
    codepoints falling back to BYTE pieces when the vocab carries them,
    else the UNKNOWN piece. Normalization is limited to the
    whitespace→``▁`` convention with a dummy prefix (SigLIP canonicalizes
    its text upstream — ``canonicalize_text`` — so the vocab's NFKC rules
    are a no-op on what this tokenizer actually sees).

    Un-gates ``SigLipTokenizer`` construction when the ``sentencepiece``
    package is absent (VERDICT r4 #9); the real c4-en/mc4 vocab files are
    still required (zero egress — the download-URL error stands).
    """

    _UNK_PENALTY = 10.0  # sentencepiece kUnkPenalty

    def __init__(self, model_bytes: bytes):
        self.pieces: list = []      # (piece str, score, type)
        self._ids: Dict[str, int] = {}
        self._byte_ids: Dict[int, int] = {}
        self.unk_id = 0
        min_score = 0.0
        for fno, wt, val in self._fields(model_bytes):
            if fno == 1 and wt == 2:  # repeated SentencePiece
                piece, score, ptype = "", 0.0, 1
                for sfno, swt, sval in self._fields(val):
                    if sfno == 1 and swt == 2:
                        piece = sval.decode("utf-8")
                    elif sfno == 2 and swt == 5:
                        import struct

                        score = struct.unpack("<f", sval)[0]
                    elif sfno == 3 and swt == 0:
                        ptype = sval
                idx = len(self.pieces)
                self.pieces.append((piece, score, ptype))
                if ptype == 2:      # UNKNOWN
                    self.unk_id = idx
                elif ptype == 6:    # BYTE ("<0xAB>")
                    self._byte_ids[int(piece[3:5], 16)] = idx
                elif ptype in (1, 4):  # NORMAL / USER_DEFINED
                    self._ids[piece] = idx
                    min_score = min(min_score, score)
        self._max_piece_len = max((len(p) for p in self._ids), default=1)
        self._unk_score = min_score - self._UNK_PENALTY

    @classmethod
    def from_file(cls, path: str) -> "MiniSentencePiece":
        with open(path, "rb") as f:
            return cls(f.read())

    @staticmethod
    def _fields(buf: bytes):
        """Iterate protobuf (field_number, wire_type, value) triples."""
        i, n = 0, len(buf)
        while i < n:
            tag, i = MiniSentencePiece._varint(buf, i)
            fno, wt = tag >> 3, tag & 7
            if wt == 0:
                val, i = MiniSentencePiece._varint(buf, i)
            elif wt == 1:
                val, i = buf[i:i + 8], i + 8
            elif wt == 2:
                ln, i = MiniSentencePiece._varint(buf, i)
                val, i = buf[i:i + ln], i + ln
            elif wt == 5:
                val, i = buf[i:i + 4], i + 4
            else:
                raise ValueError(f"unsupported protobuf wire type {wt}")
            yield fno, wt, val

    @staticmethod
    def _varint(buf: bytes, i: int):
        out = shift = 0
        while True:
            b = buf[i]
            i += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out, i
            shift += 7

    def encode(self, text: str) -> list:
        """Unigram Viterbi piece ids (no specials appended)."""
        s = "▁" + text.replace(" ", "▁")  # dummy prefix + space mark
        n = len(s)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back = [None] * (n + 1)  # (start, token_id or None=unk char)
        best[0] = 0.0
        for i in range(n):
            if best[i] == NEG:
                continue
            for j in range(i + 1, min(n, i + self._max_piece_len) + 1):
                tid = self._ids.get(s[i:j])
                if tid is not None:
                    sc = best[i] + self.pieces[tid][1]
                    if sc > best[j]:
                        best[j], back[j] = sc, (i, tid)
            # unknown single codepoint fallback keeps the lattice connected
            if best[i + 1] < best[i] + self._unk_score:
                best[i + 1], back[i + 1] = best[i] + self._unk_score, (i, None)
        ids: list = []
        j = n
        while j > 0:
            i, tid = back[j]
            if tid is None:
                ch = s[i:j].encode("utf-8")
                if self._byte_ids:
                    ids.extend(self._byte_ids[b] for b in reversed(ch))
                else:
                    ids.append(self.unk_id)
            else:
                ids.append(tid)
            j = i
        return ids[::-1]


class SigLipTokenizer:
    """SigLIP T5-sentencepiece tokenizer wrapper (reference
    tokenizer.py:456-510). Needs a LOCAL ``sentencepiece.model`` file — the
    reference downloads its vocab at construction, which this environment
    cannot (the error carries the upstream URL). Uses the ``sentencepiece``
    package via ``T5TokenizerFast`` when installed, else the dependency-free
    :class:`MiniSentencePiece` unigram encoder on the same vocab file. Text
    is big_vision-canonicalized (lowercase, punctuation stripped); pad/eos
    forced to id 1 like the reference."""

    VOCAB_URLS = {
        "c4-en": "http://storage.googleapis.com/t5-data/vocabs/cc_en.32000/sentencepiece.model",
        "mc4": "http://storage.googleapis.com/t5-data/vocabs/mc4.250000.100extra/sentencepiece.model",
    }

    def __init__(self, tokenizer_name: str, context_length: int = 64):
        if tokenizer_name in self.VOCAB_URLS and not os.path.exists(tokenizer_name):
            raise FileNotFoundError(
                f"sentencepiece vocab {tokenizer_name!r} must be fetched from "
                f"{self.VOCAB_URLS[tokenizer_name]} and passed as a local path "
                "(no network egress here)"
            )
        self.tokenizer = None
        try:
            import sentencepiece  # noqa: F401
            from transformers import T5TokenizerFast

            self.tokenizer = T5TokenizerFast(tokenizer_name, legacy=False)
            self.tokenizer.pad_token_id = 1
            self.tokenizer.eos_token_id = 1
        except ImportError:
            # dependency-free fallback: same vocab file, unigram Viterbi
            self.mini = MiniSentencePiece.from_file(tokenizer_name)
        self.pad_id = self.eos_id = 1  # reference forces both to 1
        self.context_length = context_length

    def __call__(self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        texts = [canonicalize_text(_basic_clean(t)) for t in texts]
        ctx = context_length or self.context_length
        if self.tokenizer is not None:
            enc = self.tokenizer(
                list(texts), return_tensors="np",
                max_length=ctx, padding="max_length", truncation=True,
            )
            return enc["input_ids"].astype(np.int32)
        out = np.full((len(texts), ctx), self.pad_id, dtype=np.int32)
        for row, text in enumerate(texts):
            # T5 semantics: pieces + </s>, truncated to ctx with eos kept
            ids = self.mini.encode(text)[: ctx - 1] + [self.eos_id]
            out[row, : len(ids)] = ids
        return out


class HFTokenizerWrapper:
    """Adapter exposing a HuggingFace tokenizer with the ClipTokenizer
    calling convention (reference HFTokenizer, tokenizer.py:397-453)."""

    def __init__(self, name: str, context_length: int = DEFAULT_CONTEXT_LENGTH,
                 clean: str = "whitespace", strip_sep_token: bool = False):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(name)
        self.context_length = context_length
        self.clean_mode = clean
        self.strip_sep_token = strip_sep_token

    def __call__(self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        texts = [clean_text(t, self.clean_mode) for t in texts]
        enc = self.tokenizer(
            list(texts),
            return_tensors="np",
            max_length=context_length or self.context_length,
            padding="max_length",
            truncation=True,
        )
        ids = enc["input_ids"].astype(np.int32)
        if self.strip_sep_token:
            # CLIPA: drop [SEP] so 'last' pooling sees the final word token
            # (reference tokenizer.py HFTokenizer strip_sep_token)
            ids = np.where(ids == self.tokenizer.sep_token_id, 0, ids)
        return ids

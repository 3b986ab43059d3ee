"""Single tokenizer authority for the whole framework.

The reference lets TextProcessor, TextEncoder, and CaptionDecoder each mutate
special tokens independently, so their vocabularies can drift by a few ids
(reference preprocessing.py:182-197, model.py:315-324, model.py:509-511).
Here ONE `CaptionTokenizer` instance is constructed once and shared by the
data pipeline, both towers, and the decoder.

Three operating modes, all offline-capable (zero network egress):

1. **HF-artifact mode** — load a GPT-2-style byte-level BPE from local
   ``vocab.json`` + ``merges.txt`` files (artifact-compatible with the
   reference's ``gpt2-medium`` tokenizer when those files are on disk).
2. **Trained-BPE mode** — train a byte-level BPE on a caption corpus
   (``CaptionTokenizer.train_bpe``). Used for from-scratch runs.
3. **Byte fallback** — 256 byte tokens + specials; always available.

Special tokens ([PAD]/[UNK]/[BOS]/[EOS]/[SEP]) are appended after the base
vocabulary in a fixed order so every component sees identical ids.

Hot-path byte-pair encoding optionally dispatches to the C++ extension in
``native/bpe.cpp`` (ctypes); the pure-Python path is the reference
implementation and the default.
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

SPECIAL_TOKENS = ("[PAD]", "[UNK]", "[BOS]", "[EOS]", "[SEP]")


def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte<->unicode map (printable surrogate alphabet)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_BYTE_ENCODER = _bytes_to_unicode()
_BYTE_DECODER = {v: k for k, v in _BYTE_ENCODER.items()}


import re

from pgica_tpu.data._unicode_classes import LETTER_RANGES, NUMBER_RANGES


def _char_class(ranges) -> str:
    parts = []
    for a, b in ranges:
        if b > a:
            parts.append(f"{re.escape(chr(a))}-{re.escape(chr(b))}")
        else:
            parts.append(re.escape(chr(a)))
    return "".join(parts)


_L = _char_class(LETTER_RANGES)
_N = _char_class(NUMBER_RANGES)

# GPT-2's exact pretokenizer pattern with \p{L}/\p{N} expanded from the
# generated Unicode tables (scripts/gen_unicode_tables.py) — token-identical
# with real GPT-2 vocab/merges artifacts for ALL text, not just ASCII. The
# C++ encoder (native/bpe.cpp + native/unicode_classes.h) classifies decoded
# codepoints against the same ranges; parity enforced by tests/test_native_bpe.
_PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    rf"| ?[{_L}]+"
    rf"| ?[{_N}]+"
    rf"| ?[^\s{_L}{_N}]+"
    r"|\s+(?!\S)|\s+"
)


def _pretokenize(text: str) -> List[str]:
    """GPT-2-style pretokenization: contractions, leading-space word/digit/
    punct runs, and GPT-2's whitespace-run rules — exact \\p{L}/\\p{N}
    semantics (see _PRETOKEN_RE)."""
    return _PRETOKEN_RE.findall(text)


class CaptionTokenizer:
    """Byte-level BPE tokenizer with appended special tokens."""

    def __init__(
        self,
        vocab: Optional[Dict[str, int]] = None,
        merges: Optional[List[Tuple[str, str]]] = None,
    ):
        if vocab is None:
            # Byte-fallback vocabulary: the 256 byte-alphabet symbols.
            vocab = {_BYTE_ENCODER[b]: b for b in range(256)}
            merges = []
        self._base_vocab = dict(vocab)
        self._merges = list(merges or [])
        self._merge_ranks = {pair: i for i, pair in enumerate(self._merges)}

        self.vocab: Dict[str, int] = dict(self._base_vocab)
        base = max(self.vocab.values()) + 1 if self.vocab else 0
        for i, tok in enumerate(SPECIAL_TOKENS):
            if tok not in self.vocab:
                self.vocab[tok] = base + i
        self.id_to_token = {i: t for t, i in self.vocab.items()}
        self._cache: Dict[str, List[str]] = {}
        self._native = None  # lazily-built C++ encoder (see native_bpe.py)
        self._native_tried = False

    def __getstate__(self):
        """Picklable across process boundaries (grain/fork dataloader workers):
        the ctypes handle to the C++ encoder is process-local, so drop it and
        let each worker lazily rebuild its own via ``_native_encoder``."""
        state = self.__dict__.copy()
        state["_native"] = None
        state["_native_tried"] = False
        state["_cache"] = {}
        return state

    # -- special token properties ------------------------------------------------

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    @property
    def pad_token_id(self) -> int:
        return self.vocab["[PAD]"]

    @property
    def unk_token_id(self) -> int:
        return self.vocab["[UNK]"]

    @property
    def bos_token_id(self) -> int:
        return self.vocab["[BOS]"]

    @property
    def eos_token_id(self) -> int:
        return self.vocab["[EOS]"]

    @property
    def sep_token_id(self) -> int:
        return self.vocab["[SEP]"]

    # -- BPE ----------------------------------------------------------------------

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = [_BYTE_ENCODER[b] for b in token.encode("utf-8")]
        if not self._merge_ranks:
            self._cache[token] = word
            return word
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self._merge_ranks.get(p, float("inf")))
            if best not in self._merge_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._cache[token] = word
        return word

    # -- encode / decode ------------------------------------------------------------

    def _native_encoder(self):
        if not self._native_tried:
            self._native_tried = True
            try:
                from pgica_tpu.data.native_bpe import NativeBPE

                candidate = NativeBPE(self.vocab, self._merges, self.unk_token_id)
                self._native = candidate if candidate.available else None
            except Exception:
                self._native = None
        return self._native

    def encode(self, text: str, add_bos: bool = False, add_eos: bool = False) -> List[int]:
        ids: List[int] = []
        if add_bos:
            ids.append(self.bos_token_id)
        native = self._native_encoder()
        body = native.encode(text) if native is not None else None
        if body is None:  # pure-Python reference path (always used for non-ASCII)
            body = []
            unk = self.unk_token_id
            for piece in _pretokenize(text):
                for sym in self._bpe(piece):
                    body.append(self.vocab.get(sym, unk))
        ids.extend(body)
        if add_eos:
            ids.append(self.eos_token_id)
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        special_ids = {self.vocab[t] for t in SPECIAL_TOKENS}
        symbols: List[str] = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in special_ids:
                continue
            tok = self.id_to_token.get(i)
            if tok is None or tok in SPECIAL_TOKENS:
                continue
            symbols.append(tok)
        raw = "".join(symbols)
        data = bytes(_BYTE_DECODER[c] for c in raw if c in _BYTE_DECODER)
        return data.decode("utf-8", errors="replace")

    def encode_padded(
        self, text: str, max_length: int, add_bos: bool = True, add_eos: bool = True
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode to fixed length; returns (ids[int32], mask[int32])."""
        ids = self.encode(text, add_bos=add_bos, add_eos=False)
        if add_eos:
            ids = ids[: max_length - 1] + [self.eos_token_id]
        else:
            ids = ids[:max_length]
        mask = np.zeros((max_length,), np.int32)
        mask[: len(ids)] = 1
        out = np.full((max_length,), self.pad_token_id, np.int32)
        out[: len(ids)] = ids
        return out, mask

    def encode_batch(
        self, texts: Sequence[str], max_length: int, add_bos: bool = True, add_eos: bool = True
    ) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.stack([self.encode_padded(t, max_length, add_bos, add_eos)[0] for t in texts])
        masks = np.stack([self.encode_padded(t, max_length, add_bos, add_eos)[1] for t in texts])
        return ids, masks

    # -- persistence ------------------------------------------------------------------

    def save(self, directory: Union[str, Path]) -> None:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        with open(directory / "vocab.json", "w") as f:
            json.dump(self._base_vocab, f, ensure_ascii=False)
        with open(directory / "merges.txt", "w") as f:
            f.write("#version: pgica_tpu\n")
            for a, b in self._merges:
                f.write(f"{a} {b}\n")

    @classmethod
    def load(cls, directory: Union[str, Path]) -> "CaptionTokenizer":
        directory = Path(directory)
        with open(directory / "vocab.json") as f:
            vocab = json.load(f)
        merges: List[Tuple[str, str]] = []
        merges_path = directory / "merges.txt"
        if merges_path.exists():
            for line in merges_path.read_text().splitlines():
                if line.startswith("#") or not line.strip():
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b.strip()))
        return cls(vocab=vocab, merges=merges)

    @classmethod
    def from_pretrained(cls, name_or_path: Union[str, Path]) -> "CaptionTokenizer":
        """Load local GPT-2-style artifacts if present; else byte-fallback.

        ``name_or_path`` may be a directory holding vocab.json/merges.txt
        (HF layout). Model *names* like "gpt2-medium" resolve to byte
        fallback in this offline environment.
        """
        path = Path(str(name_or_path))
        if path.is_dir() and (path / "vocab.json").exists():
            return cls.load(path)
        return cls()

    # -- training ------------------------------------------------------------------------

    @classmethod
    def train_bpe(
        cls, corpus: Iterable[str], vocab_size: int = 8192, min_frequency: int = 2
    ) -> "CaptionTokenizer":
        """Train a byte-level BPE on caption text (standard merge-frequency BPE)."""
        word_freq: Counter = Counter()
        for text in corpus:
            for piece in _pretokenize(text):
                word_freq[piece] += 1

        words: Dict[Tuple[str, ...], int] = {}
        for w, f in word_freq.items():
            sym = tuple(_BYTE_ENCODER[b] for b in w.encode("utf-8"))
            words[sym] = words.get(sym, 0) + f

        vocab = {_BYTE_ENCODER[b]: b for b in range(256)}
        merges: List[Tuple[str, str]] = []
        target_merges = max(0, vocab_size - 256 - len(SPECIAL_TOKENS))

        for _ in range(target_merges):
            pair_freq: Counter = Counter()
            for sym, f in words.items():
                for i in range(len(sym) - 1):
                    pair_freq[(sym[i], sym[i + 1])] += f
            if not pair_freq:
                break
            best, freq = pair_freq.most_common(1)[0]
            if freq < min_frequency:
                break
            merges.append(best)
            first, second = best
            joined = first + second
            new_words: Dict[Tuple[str, ...], int] = {}
            for sym, f in words.items():
                out: List[str] = []
                i = 0
                while i < len(sym):
                    if i < len(sym) - 1 and sym[i] == first and sym[i + 1] == second:
                        out.append(joined)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                t = tuple(out)
                new_words[t] = new_words.get(t, 0) + f
            words = new_words
            vocab[joined] = len(vocab)

        return cls(vocab=vocab, merges=merges)

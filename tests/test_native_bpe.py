"""Native C++ BPE encoder parity with the pure-Python reference path."""

import numpy as np
import pytest

from pgica_tpu.data.native_bpe import NativeBPE, get_library
from pgica_tpu.data.tokenizer import CaptionTokenizer, _pretokenize

pytestmark = pytest.mark.skipif(
    get_library() is None, reason="native BPE library unavailable (g++ build failed)"
)

ASCII_TEXTS = [
    "a red bird sitting on a branch",
    "Hello, World! 123 test-case",
    "  leading spaces and   multiple   gaps",
    "punctuation... everywhere!!! (really?)",
    "x",
    "",
    "the quick brown fox jumps over the lazy dog 42 times",
    "don't stop; it's we'll I'm you're we've he'd",
    " 's odd '' apostrophes'",
    "mixed \t whitespace\truns  \t end ",
]

UNICODE_TEXTS = [
    "caf\u00e9 \u2615 na\u00efve",
    "\u65e5\u672c\u8a9e caption",
    # class boundaries the round-1 ">=0x80 is a letter" approximation broke:
    "x\u00b2 + y\u00b3",          # superscripts are \p{N}, not letters
    "a \u2192 b \u2014 c",         # arrows/dashes are punctuation
    "\u0661\u0662\u0663 digits",  # Arabic-Indic digits are \p{N}
    "mixed\u4e2d\u6587and123",     # script switch inside a word
    "non\u2011breaking\u00a0space",  # U+00A0 is \s in Python regex
    "emoji \U0001f600\U0001f680 run",
]


def _python_encode(tok: CaptionTokenizer, text: str):
    ids = []
    for piece in _pretokenize(text):
        for sym in tok._bpe(piece):
            ids.append(tok.vocab.get(sym, tok.unk_token_id))
    return ids


class TestNativeParity:
    def test_byte_fallback_vocab(self):
        tok = CaptionTokenizer()
        native = NativeBPE(tok.vocab, tok._merges, tok.unk_token_id)
        assert native.available
        for text in ASCII_TEXTS:
            assert native.encode(text) == _python_encode(tok, text), repr(text)

    def test_trained_bpe_vocab(self):
        corpus = ["the cat sat on the mat"] * 30 + ["dogs playing in the park"] * 30
        tok = CaptionTokenizer.train_bpe(corpus, vocab_size=350)
        native = NativeBPE(tok.vocab, tok._merges, tok.unk_token_id)
        assert native.available
        for text in ASCII_TEXTS + ["the cat playing in the mat park"]:
            assert native.encode(text) == _python_encode(tok, text), repr(text)

    def test_unicode_parity(self):
        tok = CaptionTokenizer()
        native = NativeBPE(tok.vocab, tok._merges, tok.unk_token_id)
        for text in UNICODE_TEXTS:
            assert native.encode(text) == _python_encode(tok, text), repr(text)

    def test_tokenizer_integration_roundtrip(self):
        tok = CaptionTokenizer()
        text = "native path roundtrip test 99"
        ids = tok.encode(text)
        assert tok._native is not None  # native engaged for ASCII
        assert tok.decode(ids) == text

"""Hermetic mini-WordPiece tokenizer fixture.

Implements just enough of the HuggingFace fast-tokenizer surface for the
engine's adapters — ``__call__(words, is_split_into_words=True)`` returning
an encoding with ``tokens()``/``word_ids()``, ``convert_tokens_to_ids``,
``unk_token``/``pad_token_id`` — over the standard greedy
longest-match-first WordPiece algorithm (public construction; continuation
pieces carry the ``##`` prefix, no match → the whole word becomes [UNK]).

No vendored vocab files, no network: the default vocab is generated here
(specials + ascii letters/digits as start and ## continuation pieces + a few
multi-char merges so greedy matching is actually exercised).
"""

from __future__ import annotations

SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
_CHARS = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [str(d) for d in range(10)]
_MERGES = ["the", "ing", "tion", "##ing", "##tion", "##er", "##ed"]


def default_vocab() -> list[str]:
    return SPECIALS + _CHARS + ["##" + c for c in _CHARS] + _MERGES


class MiniEncoding:
    def __init__(self, tokens: list[str], word_ids: list[int | None]):
        self._tokens = tokens
        self._word_ids = word_ids
        self.input_ids = None  # filled by the tokenizer when ids requested

    def tokens(self) -> list[str]:
        return self._tokens

    def word_ids(self) -> list[int | None]:
        return self._word_ids


class MiniWordPieceTokenizer:
    unk_token = "[UNK]"
    pad_token = "[PAD]"
    cls_token = "[CLS]"
    sep_token = "[SEP]"

    def __init__(self, vocab: list[str] | None = None):
        self.vocab = {t: i for i, t in enumerate(vocab or default_vocab())}
        self.pad_token_id = self.vocab[self.pad_token]
        self.unk_token_id = self.vocab[self.unk_token]

    # -- core wordpiece ------------------------------------------------------
    def wordpiece(self, word: str) -> list[str]:
        """Greedy longest-match-first; whole word → [UNK] on any dead end."""
        if not word:
            return [self.unk_token]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while end > start:
                cand = word[start:end]
                if start > 0:
                    cand = "##" + cand
                if cand in self.vocab:
                    cur = cand
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces

    # -- HF-ish surface --------------------------------------------------
    def __call__(self, words: list[str], is_split_into_words: bool = False,
                 add_special_tokens: bool = True) -> MiniEncoding:
        assert is_split_into_words, "fixture supports pre-split input only"
        toks: list[str] = []
        wids: list[int | None] = []
        if add_special_tokens:
            toks.append(self.cls_token)
            wids.append(None)
        for i, w in enumerate(words):
            ps = self.wordpiece(w.lower())
            toks.extend(ps)
            wids.extend([i] * len(ps))
        if add_special_tokens:
            toks.append(self.sep_token)
            wids.append(None)
        enc = MiniEncoding(toks, wids)
        enc.input_ids = self.convert_tokens_to_ids(toks)
        return enc

    def convert_tokens_to_ids(self, tokens: list[str]) -> list[int]:
        return [self.vocab.get(t, self.unk_token_id) for t in tokens]


# ---------------------------------------------------------------------------
# mocked "transformers" forward for the I2 wrapper tests (lives here so the
# executor workers can unpickle it — this module is shipped via addPyFile)
# ---------------------------------------------------------------------------
MOCK_N_CLASSES = 5


def mock_forward(input_ids, attention_mask, bbox):
    """Deterministic logits from token ids alone; asserts the reference's
    batch contract in-task (raises → Spark task failure → test failure)."""
    import numpy as np

    ids = np.asarray(input_ids)
    assert ids.ndim == 2 and ids.shape[0] <= 8, ids.shape
    assert ids.shape[1] % 8 == 0, f"not padded to multiple of 8: {ids.shape}"
    m, bb = np.asarray(attention_mask), np.asarray(bbox)
    assert m.shape == ids.shape and bb.shape == ids.shape + (4,)
    assert ((bb >= 0) & (bb <= 1000)).all()
    c = np.arange(MOCK_N_CLASSES)
    return ((ids[..., None] * 31 + c * 7) % 13).astype(np.float64) / 3.0


def mock_load_fn():
    return MiniWordPieceTokenizer(), mock_forward, MOCK_N_CLASSES

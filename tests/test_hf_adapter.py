"""HF-tokenizer adapter (Q1) + mocked-transformers forward path (I2).

Proves the pluggable-tokenizer contract holds with a real WordPiece
implementation (hermetic mini vocab, tests/wordpiece_fixture.py) — the
splitter contract cases reproduce through the full Arrow path — and that
transformer_window_predictions implements the reference's endpoint batching
(batch 8, pad-to-multiple-of-8, ``inference.py:68-70``) and
token→word→window averaging (``inference.py:449-492``) against a pure-Python
replay.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.operators.inference import (
    aggregate_word_predictions,
    transformer_window_predictions,
)
from amazon_textract_transformer_pipeline_spark.operators.splitting import (
    hf_tokenize_adapter,
    split_pages_to_windows,
)
from amazon_textract_transformer_pipeline_spark.schemas import PAGE_SCHEMA

from wordpiece_fixture import (
    MOCK_N_CLASSES,
    MiniWordPieceTokenizer,
    mock_load_fn,
)

TOK = MiniWordPieceTokenizer()
ADAPTED = hf_tokenize_adapter(TOK)


@pytest.fixture(autouse=True, scope="module")
def _ship_fixture_module(spark):
    """tests/ isn't on executor sys.path; ship the tokenizer fixture so
    cloudpickled closures can resolve it worker-side."""
    from pathlib import Path

    spark.sparkContext.addPyFile(
        str(Path(__file__).resolve().parent / "wordpiece_fixture.py"))


def test_wordpiece_greedy_longest_match():
    assert TOK.wordpiece("the") == ["the"]  # merge wins over chars
    assert TOK.wordpiece("thex") == ["the", "##x"]
    assert TOK.wordpiece("running") == ["r", "##u", "##n", "##n", "##ing"]
    assert TOK.wordpiece("émigré") == ["[UNK]"]  # out-of-alphabet


def test_adapter_matches_wordpiece_and_guarantees_a_piece():
    assert ADAPTED("The") == ["the"]  # lowercasing inside the fixture
    assert ADAPTED("") == ["[UNK]"]
    assert ADAPTED("émigré") == ["[UNK]"]
    assert len(ADAPTED("abc123")) == 6


def _word(text: str, i: int) -> dict:
    return {"text": text, "conf": 99.0, "id": f"w{i}", "line_id": 0,
            "box": {"left": 0.01 * i, "top": 0.0, "width": 0.009,
                    "height": 0.01}}


# a word of k 'a's costs exactly k pieces under the mini vocab (only 'a' and
# '##a' match), so the splitter contract cases translate 1:1 to words.
CONTRACT_CASES = [
    ("all_fit", [3, 3, 3], [(0, 3)]),
    ("exact_boundary", [5, 5], [(0, 2)]),
    ("boundary_backfill", [5, 5, 1], [(0, 2), (1, 3)]),
    ("under_half_backfill", [3, 3, 3, 3], [(0, 3), (1, 4)]),
    ("at_half_no_backfill", [5, 5, 5], [(0, 2), (2, 3)]),
    ("oversize_skipped", [12], []),
    ("oversize_middle", [3, 12, 3], [(0, 1), (2, 3)]),
    ("oversize_start", [12, 3], [(1, 2)]),
]


def test_splitter_contract_with_real_wordpiece(spark):
    rows = [
        (name, 1, [_word("a" * k, i) for i, k in enumerate(counts)])
        for name, counts, _ in CONTRACT_CASES
    ]
    import pyspark.sql.types as T

    pages = spark.createDataFrame(
        rows, T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("page_num", T.IntegerType()),
            PAGE_SCHEMA["words"],
        ]))
    win = split_pages_to_windows(pages, max_content_seq_len=10,
                                 tokenize=ADAPTED)
    got = {}
    for r in win.collect():
        got.setdefault(r.url, []).append((r.window_ix, r.start_word, r.end_word))
    for name, _, expected in CONTRACT_CASES:
        spans = [(s, e) for _, s, e in sorted(got.get(name, []))]
        assert spans == expected, (name, spans, expected)


# ---------------------------------------------------------------------------
# mocked-transformers I2 path (mock lives in wordpiece_fixture for pickling)
# ---------------------------------------------------------------------------
N_CLASSES = MOCK_N_CLASSES


def _replay_word_probs(words: list[str]) -> np.ndarray:
    """Pure-Python replay of collation + forward + softmax + per-word mean
    for a single window (logits depend only on token ids, so batch
    composition and padding don't affect the replayed values)."""
    tok = MiniWordPieceTokenizer()
    toks, wids = ["[CLS]"], [-1]
    for i, w in enumerate(words):
        ps = tok.wordpiece(w.lower())
        toks.extend(ps)
        wids.extend([i] * len(ps))
    toks.append("[SEP]")
    wids.append(-1)
    ids = np.array(tok.convert_tokens_to_ids(toks))
    c = np.arange(N_CLASSES)
    logits = ((ids[:, None] * 31 + c * 7) % 13).astype(np.float64) / 3.0
    z = np.exp(logits - logits.max(axis=-1, keepdims=True))
    probs = z / z.sum(axis=-1, keepdims=True)
    wids = np.array(wids)
    return np.stack([probs[wids == i].mean(axis=0) for i in range(len(words))])


@pytest.fixture(scope="module")
def small_windows(spark, doc_words):
    from amazon_textract_transformer_pipeline_spark.operators.assembly import (
        pages_view,
    )

    pages = pages_view(doc_words).limit(30)
    return split_pages_to_windows(pages, max_content_seq_len=24,
                                  tokenize=ADAPTED).cache()


def test_transformer_path_matches_python_replay(spark, small_windows):
    preds = transformer_window_predictions(
        small_windows, mock_load_fn, tokenize=ADAPTED).cache()
    rows = preds.filter("window_ix = 0").limit(400).collect()
    assert rows
    # replay needs the window's word texts: refetch them from the windows df
    wtexts = {
        (r.url, r.page_num, r.window_ix):
            [w["text"] for w in r.words]
        for r in small_windows.collect()
    }
    checked = 0
    by_window: dict[tuple, list] = {}
    for r in rows:
        by_window.setdefault((r.url, r.page_num, r.window_ix), []).append(r)
    for key, rs in list(by_window.items())[:10]:
        expect = _replay_word_probs(wtexts[key])
        rs = sorted(rs, key=lambda r: r.word_pos)
        assert len(rs) == len(expect)
        for r, ex in zip(rs, expect):
            assert np.allclose(np.array(r.probs), ex, atol=1e-12), key
        checked += 1
    assert checked >= 5


def test_transformer_cross_window_mean(spark, small_windows):
    """Words duplicated by the <50% backfill get the mean of their per-window
    probs (I3) — verified against a per-window replay mean."""
    preds = transformer_window_predictions(
        small_windows, mock_load_fn, tokenize=ADAPTED)
    agg = aggregate_word_predictions(preds, n_classes=N_CLASSES)
    multi = (
        preds.groupBy("url", "page_num", "word_pos")
        .agg(F.count("*").alias("n"),
             F.first("probs").alias("p"))
        .filter("n > 1").limit(5).collect()
    )
    assert multi, "fixture produced no overlapped words — weaken max_len"
    aggd = {(r.url, r.page_num, r.word_pos): np.array(r.probs)
            for r in agg.join(
                preds.groupBy("url", "page_num", "word_pos").count()
                .filter("count > 1").drop("count"),
                ["url", "page_num", "word_pos"]).collect()}
    per_window = {}
    for r in preds.join(
        preds.groupBy("url", "page_num", "word_pos").count()
        .filter("count > 1").drop("count"),
        ["url", "page_num", "word_pos"],
    ).collect():
        per_window.setdefault((r.url, r.page_num, r.word_pos), []).append(
            np.array(r.probs))
    for key, plist in per_window.items():
        assert np.allclose(aggd[key], np.mean(plist, axis=0), atol=1e-12), key
    # argmax/confidence contract
    row = agg.limit(1).collect()[0]
    assert row.pred_cls == int(np.argmax(row.probs))
    assert row.pcc == pytest.approx(max(row.probs))


def test_transformer_zero_word_windows_no_arrow_crash(spark):
    """Externally-supplied windows with zero words must not crash the Arrow
    cast (all-empty pd.DataFrame defaults to float64 columns) — the flush()
    guard mirrors predict_windows'."""
    from amazon_textract_transformer_pipeline_spark.operators.splitting import (
        WINDOW_SCHEMA,
    )

    empty = spark.createDataFrame(
        [("doc://z", 1, 0, 0, 0, 2, [], [])], schema=WINDOW_SCHEMA)
    out = transformer_window_predictions(
        empty, mock_load_fn, tokenize=ADAPTED).collect()
    assert out == []

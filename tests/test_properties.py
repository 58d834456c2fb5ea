"""Property-based tests (SURVEY §5.4): pure-Python invariants via hypothesis
over the shared rule implementations — fast, no Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import ref_rules
from amazon_textract_transformer_pipeline_spark.operators.frontend import parse_html
from amazon_textract_transformer_pipeline_spark.operators.splitting import (
    split_words,
    stub_tokenize,
)
from amazon_textract_transformer_pipeline_spark.sources.synthetic import (
    expected_text,
)

CLASSES = {0: "A", 1: "B", 2: "C"}


@st.composite
def word_seq(draw):
    n = draw(st.integers(1, 40))
    words = []
    for i in range(n):
        words.append(
            {
                "page_num": 1 + i // 20,
                "line_id": (i // 5) % 4,
                "text": f"w{i}",
                "conf": 50.0 + (i % 50),
                "word_id": f"id{i}",
                "box": {"left": 0.1, "top": 0.1, "width": 0.01, "height": 0.01},
                "pred_cls": draw(st.integers(0, 4)),  # 3 and 4 → "other"
                "pcc": draw(st.floats(0.5, 0.999999)),
            }
        )
    return words


@given(word_seq())
@settings(max_examples=200, deadline=None)
def test_e1_run_conservation(words):
    """Every mention is a contiguous word slice; mentions never overlap;
    total mention words ≤ total words; mention confidences within word
    bounds."""
    dets = ref_rules.extract_entities_ref(words, CLASSES)
    seen: set[str] = set()
    by_id = {w["word_id"]: w for w in words}
    order = {w["word_id"]: i for i, w in enumerate(words)}
    for d in dets:
        ixs = [order[b] for b in d["Blocks"]]
        assert ixs == list(range(ixs[0], ixs[0] + len(ixs))), "non-contiguous run"
        assert not (set(d["Blocks"]) & seen), "overlapping mentions"
        seen.update(d["Blocks"])
        assert all(by_id[b]["pred_cls"] == d["ClassId"] for b in d["Blocks"])
        lo = min(min(by_id[b]["pcc"], by_id[b]["conf"]) for b in d["Blocks"])
        assert abs(d["Confidence"] - lo) < 1e-12


@given(st.lists(st.integers(1, 30), min_size=0, max_size=60),
       st.integers(8, 64))
@settings(max_examples=300, deadline=None)
def test_q2_splitter_invariants(counts, max_len):
    """Windows stay within budget, are in order, cover all non-oversize
    words, and overlap only via the final-window backfill."""
    splits = split_words(counts, max_len)
    n = len(counts)
    starts = [0]
    for c in counts:
        starts.append(starts[-1] + c)
    covered: set[int] = set()
    prev_end = 0
    for (s, e) in splits:
        assert 0 <= s < e <= n
        assert starts[e] - starts[s] <= max_len, "window over budget"
        # gaps are legal only where oversize words were skipped
        assert all(counts[i] > max_len for i in range(prev_end, s)), \
            "gap not explained by oversize words"
        covered.update(range(s, e))
        prev_end = max(prev_end, e)
    for i in range(n):
        if counts[i] <= max_len:
            assert i in covered, f"non-oversize word {i} uncovered"
        else:
            assert i not in covered, "oversize word must be skipped"


@given(st.lists(st.floats(0.01, 0.999), min_size=1, max_size=10))
@settings(max_examples=200, deadline=None)
def test_e8_noisy_or_bounds(confs):
    """Noisy-OR ≥ max(confs), < 1, and monotone in every argument."""
    def noisy_or(cs):
        p = 1.0
        for c in cs:
            p *= 1 - c
        return 1 - p

    v = noisy_or(confs)
    # FP can saturate the product to 0 → v == 1.0 exactly
    assert max(confs) - 1e-12 <= v <= 1.0
    bumped = [min(c + 0.001, 0.9999) for c in confs]
    assert noisy_or(bumped) >= v - 1e-12


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               max_size=400))
@settings(max_examples=200, deadline=None)
def test_frontend_never_crashes_and_is_deterministic(s):
    """Arbitrary unicode as HTML: parser total + deterministic; extracted
    words contain no whitespace."""
    b = s.encode("utf-8")
    p1, p2 = parse_html(b), parse_html(b)
    assert p1 == p2
    for page in p1:
        for line in page:
            assert line, "empty line emitted"
            for w in line:
                assert w and not any(ch.isspace() for ch in w)


@given(st.lists(st.lists(st.lists(
    st.text(alphabet="abcXYZ0123&<>'\"éñ中", min_size=1, max_size=8)
    .filter(lambda t: not t.isspace()),
    min_size=1, max_size=6), min_size=0, max_size=5), min_size=1, max_size=3))
@settings(max_examples=150, deadline=None)
def test_generator_render_roundtrip(pages):
    """Any word structure (no-whitespace tokens) survives the HTML render →
    parse round trip byte-identically."""
    from amazon_textract_transformer_pipeline_spark.sources.synthetic import (
        _render_html,
    )
    import random

    rng = random.Random(7)
    html = _render_html(rng, pages).encode("utf-8")
    assert expected_text(parse_html(html)) == expected_text(pages)


@given(st.lists(st.integers(0, 100), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_tokenizer_reconstruction(lengths):
    """stub_tokenize pieces concatenate back to the word; count ≥ 1."""
    for n in lengths:
        w = ("ab3$" * (n // 4 + 1))[: max(n, 1)]
        pieces = stub_tokenize(w)
        assert "".join(pieces) == w
        assert len(pieces) >= 1


# ---------------------------------------------------------------------------
# UniversalBox reconstruction properties (boxes.py:11-111 semantics)
# ---------------------------------------------------------------------------
_coord = st.floats(0.0, 1.0, allow_nan=False)


@given(top=_coord, left=_coord, h=st.floats(0.001, 1.0),
       w=st.floats(0.001, 1.0))
@settings(max_examples=200, deadline=None)
def test_ubox_any_two_of_three_agree(top, left, h, w):
    """Every sufficient constructor subset reconstructs the same box, and
    re-serializing through any style roundtrips."""
    from amazon_textract_transformer_pipeline_spark.operators.uboxes import UBox

    full = UBox(top=top, left=left, height=h, width=w)
    variants = [
        UBox(top=top, bottom=full.bottom, left=left, right=full.right),
        UBox(bottom=full.bottom, height=h, right=full.right, width=w),
        UBox(box=full.to_dict("TLHW")),
        UBox(box=full.to_dict("tbrl")),
        UBox(box=full.to_dict("THWBRL")),  # over-specified but consistent
    ]
    for v in variants:
        for attr in ("top", "left", "height", "width", "bottom", "right"):
            assert abs(getattr(v, attr) - getattr(full, attr)) < 1e-9


@given(st.lists(st.tuples(_coord, _coord, st.floats(0.001, 0.5),
                          st.floats(0.001, 0.5)),
                min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_ubox_aggregate_contains_all(boxes):
    """The aggregate box contains every input box (same orientation)."""
    from amazon_textract_transformer_pipeline_spark.operators.uboxes import UBox

    ubs = [UBox(top=t, left=l, height=h, width=w) for t, l, h, w in boxes]
    agg = UBox.aggregate(ubs)
    eps = 1e-9
    for b in ubs:
        assert agg.top <= b.top + eps and agg.left <= b.left + eps
        assert agg.bottom >= b.bottom - eps and agg.right >= b.right - eps


# --------------------------------------------------------------------------
# image codecs (functions/codecs.py): encode→decode is the identity for
# opaque pixels, any shape, any PNG filter choice
# --------------------------------------------------------------------------

_img_shape = st.tuples(st.integers(1, 17), st.integers(1, 17))


@given(_img_shape, st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
       st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(shape, ftype, seed):
    import numpy as np

    from amazon_textract_transformer_pipeline_spark.functions import codecs

    h, w = shape
    rng = np.random.Generator(np.random.PCG64(seed))
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out, orient = codecs.decode_png(codecs.encode_png(arr, filter_type=ftype))
    assert orient is None
    assert (out == arr).all()


@given(_img_shape, st.booleans(), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_bmp_ppm_roundtrip_property(shape, top_down, seed):
    import numpy as np

    from amazon_textract_transformer_pipeline_spark.functions import codecs

    h, w = shape
    rng = np.random.Generator(np.random.PCG64(seed))
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    b, _ = codecs.decode_bmp(codecs.encode_bmp(arr, top_down=top_down))
    p, _ = codecs.decode_ppm(codecs.encode_ppm(arr))
    assert (b == arr).all() and (p == arr).all()


# --------------------------------------------------------------------------
# WARC fixture-writer/reader roundtrip (pure python, no Spark)
# --------------------------------------------------------------------------

@given(st.lists(
    st.tuples(
        st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1, max_size=30),
        st.binary(max_size=200)),
    min_size=1, max_size=10), st.booleans())
@settings(max_examples=40, deadline=None)
def test_warc_roundtrip_property(pages, with_requests):
    import gzip
    from datetime import datetime, timedelta

    from amazon_textract_transformer_pipeline_spark.sources import warc

    recs = [{"url": f"http://h/{i}/{u}", "date":
             datetime(2026, 1, 1) + timedelta(seconds=i), "html": body}
            for i, (u, body) in enumerate(pages)]
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".warc.gz") as f:
        warc.write_warc_gz(f.name, recs, with_request_records=with_requests)
        raw = gzip.decompress(open(f.name, "rb").read())
    rows = list(warc.records_to_page_rows(raw))
    assert [r["url"] for r in rows] == [r["url"] for r in recs]
    assert [bytes(r["html"]) for r in rows] == [r["html"] for r in recs]
    assert all(r["warc_ts"] is not None for r in rows)

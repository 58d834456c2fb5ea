"""Winnowing fingerprints (operators/dedup.py:winnow_fingerprints):
Schleimer et al. 2003 — rightmost-minimal hash per full window, pinned
against a Python replica; the paper's detection guarantee is property-
checked on shifted copies."""

from __future__ import annotations

import hashlib
import random

from amazon_textract_transformer_pipeline_spark.operators import dedup


def _h64(s: str) -> int:
    """Python twin of functions/portable.py hash64 (15-hex md5 prefix)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text, k, w):
    t = text.lower()
    if len(t) < k:
        return set()
    hs = [_h64(t[i:i + k]) for i in range(len(t) - k + 1)]
    out = set()
    for i in range(len(hs) - w + 1):
        window = hs[i:i + w]
        m = min(window)
        pos = i + max(j for j, h in enumerate(window) if h == m)
        out.add((pos, hs[pos]))
    return out


def _run(spark, rows, k=5, w=4):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.winnow_fingerprints(df, k=k, w=w)
    res: dict[int, set] = {d: set() for d, _ in rows}
    for r in got.collect():
        res[r.doc_id].add((r.pos, r.fp))
    return res


def test_matches_replica_on_plain_text(spark):
    rows = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, "abababababab"),           # periodic -> heavy hash ties
            (2, "aaaaaaaaaa"),             # constant -> all ties, rightmost
            (3, "tiny"),                   # < k+w-1 -> no full window
            (4, "")]
    got = _run(spark, rows)
    for d, t in rows:
        assert got[d] == _py_winnow(t, 5, 4), d


def test_density_and_coverage(spark):
    rng = random.Random(3)
    t = "".join(rng.choice("abcdefgh ") for _ in range(400))
    got = _run(spark, [(0, t)])[0]
    want = _py_winnow(t, 5, 4)
    assert got == want
    # winnowing guarantee bounds: at least one selection per window, at
    # most one new per window -> density within (1/w, 1]
    n_windows = len(t) - 5 + 1 - 4 + 1
    assert 0 < len(got) <= n_windows
    assert len(got) >= n_windows // 4  # every window covered


def test_shared_substring_guarantee(spark):
    # any shared substring of length >= w + k - 1 (= 8) must share at
    # least one fingerprint HASH even when its position shifts
    rng = random.Random(9)
    shared = "zqxjvkwpyg"  # 10 chars > 8
    a = "".join(rng.choice("abc ") for _ in range(100)) + shared
    b = shared + "".join(rng.choice("def ") for _ in range(100))
    got = _run(spark, [(0, a), (1, b)])
    fps_a = {fp for _, fp in got[0]}
    fps_b = {fp for _, fp in got[1]}
    assert fps_a & fps_b, "guarantee violated: no shared fingerprint"


def test_case_normalized(spark):
    got = _run(spark, [(0, "Hello World Hello"), (1, "hello world hello")])
    assert got[0] == got[1]

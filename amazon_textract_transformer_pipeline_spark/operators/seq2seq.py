"""Seq2seq value normalization (SURVEY §2.7 I6, §2.8 E5-E6).

The reference calls a T5-style SageMaker endpoint with the contract
``{"inputs": [...]} → {"generated_text": [...]}`` (util/normalize.py:3-9);
its training data is the synthetic date-normalization task
(``notebooks/src/code/data/seq2seq/date_normalization.py``). Here the
"endpoint" is a pluggable batch function behind :func:`make_normalizer`:

* :func:`rule_based_date_normalizer` — deterministic stand-in reproducing
  the date task's semantics (parse many human formats → ISO YYYY-MM-DD);
  unparseable inputs return NULL (the failure channel — reference logs and
  skips, normalize.py:77-84).
* a transformers ``generate()`` drops into the same signature when a
  runtime exists.

The Spark stage is UDF family (c): distinct inputs only (the reference's
hand-rolled CSE, normalize.py:42-58 — Catalyst won't dedupe UDF calls), then
an Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

_MONTHS = {m.lower(): i + 1 for i, m in enumerate(
    ["January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"])}
_MONTHS.update({m[:3]: v for m, v in list(_MONTHS.items())})

_PATTERNS = [
    # 2001-12-31 / 2001/12/31
    (re.compile(r"^(\d{4})[-/](\d{1,2})[-/](\d{1,2})$"), ("y", "m", "d")),
    # 31/12/2001, 31.12.2001, 31-12-2001 (day-first)
    (re.compile(r"^(\d{1,2})[-/.](\d{1,2})[-/.](\d{4})$"), ("d", "m", "y")),
    # 31 Dec 2001 / 31 December 2001
    (re.compile(r"^(\d{1,2})(?:st|nd|rd|th)?\s+([A-Za-z]+),?\s+(\d{4})$"),
     ("d", "M", "y")),
    # Dec 31, 2001 / December 31 2001
    (re.compile(r"^([A-Za-z]+)\s+(\d{1,2})(?:st|nd|rd|th)?,?\s+(\d{4})$"),
     ("M", "d", "y")),
]


def normalize_date_text(text: str) -> str | None:
    """One value → ISO date, or None if unparseable."""
    s = text.strip()
    for pat, fields in _PATTERNS:
        m = pat.match(s)
        if not m:
            continue
        parts = dict(zip(fields, m.groups()))
        if "M" in parts:
            mon = _MONTHS.get(parts["M"].lower()[:3] if len(parts["M"]) > 3
                              else parts["M"].lower())
            if mon is None:
                return None
            parts["m"] = str(mon)
        y, mo, d = int(parts["y"]), int(parts["m"]), int(parts["d"])
        if not (1 <= mo <= 12 and 1 <= d <= 31):
            return None
        return f"{y:04d}-{mo:02d}-{d:02d}"
    return None


def rule_based_date_normalizer(prompted_inputs: list[str],
                               prompt: str = "Convert dates to YYYY-MM-DD: ") -> list[str | None]:
    """Endpoint-contract stand-in: list in → list out, prompt stripped."""
    out = []
    for s in prompted_inputs:
        body = s[len(prompt):] if s.startswith(prompt) else s
        out.append(normalize_date_text(body))
    return out


def make_normalizer(fn: Callable[[list[str]], list[str | None]] | None = None):
    """Build the ``normalizer`` callable expected by
    entities.normalize_mentions: DataFrame[endpoint, input] →
    DataFrame[endpoint, input, output], Arrow-batched."""
    batch_fn = fn or rule_based_date_normalizer

    def normalizer(requests: DataFrame) -> DataFrame:
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                outs = batch_fn(b["input"].tolist())
                yield pd.DataFrame({"endpoint": b["endpoint"],
                                    "input": b["input"],
                                    "output": outs})

        return requests.mapInPandas(
            run, schema="endpoint string, input string, output string")

    return normalizer

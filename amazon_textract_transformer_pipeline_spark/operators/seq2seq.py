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


def hf_generate_fn(model_path: str, batch_size: int = 8,
                   strip: bool = True) -> Callable[[list[str]], list[str | None]]:
    """Real seq2seq generate behind the endpoint contract
    (``notebooks/src/code/inference_seq2seq.py:60-130``): a
    text2text-generation pipeline loaded once, inputs batched
    ``batch_size`` at a time (INFERENCE_BATCH_SIZE, inference_seq2seq), and
    ``generated_text`` whitespace-stripped exactly like predict_fn. Drop the
    result into :func:`make_normalizer`; requires transformers+torch on the
    executors (import-gated — this sandbox ships neither).

    The returned closure defers the heavy load to first call so it pickles
    cheaply to executors and loads once per Arrow worker.
    """
    try:
        import transformers  # noqa: F401
    except ImportError as e:  # pragma: no cover - sandbox has no transformers
        raise NotImplementedError(
            "hf_generate_fn needs the `transformers` runtime; use "
            "rule_based_date_normalizer (same contract) in this environment."
        ) from e

    state: dict = {}

    def generate(prompted_inputs: list[str]) -> list[str | None]:
        if "pl" not in state:
            import torch
            from transformers import (
                AutoModelForSeq2SeqLM,
                AutoTokenizer,
                pipeline,
            )

            tok = AutoTokenizer.from_pretrained(model_path,
                                                pad_to_multiple_of=8)
            mdl = AutoModelForSeq2SeqLM.from_pretrained(model_path)
            mdl.eval()
            device = torch.device(
                "cuda" if torch.cuda.is_available() else "cpu")
            mdl.to(device)
            state["pl"] = pipeline("text2text-generation", model=mdl,
                                   tokenizer=tok, batch_size=batch_size,
                                   device=mdl.device)
        result = state["pl"](list(prompted_inputs),
                             clean_up_tokenization_spaces=True)
        outs = [r["generated_text"] for r in result]
        return [t.strip() if strip and t is not None else t for t in outs]

    return generate


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

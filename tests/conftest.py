from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from amazon_textract_transformer_pipeline_spark.session import get_spark  # noqa: E402

TESTDATA = Path("/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running crash-consistency / e2e tests")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("attp-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_df(spark):
    """300 deterministic synthetic pages, cached for the whole run."""
    from amazon_textract_transformer_pipeline_spark.sources import synthetic_pages_df

    df = synthetic_pages_df(spark, 300, seed=42, partitions=8).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def doc_words(spark, pages_df):
    from amazon_textract_transformer_pipeline_spark.operators.frontend import html_to_words

    df = html_to_words(pages_df).cache()
    df.count()
    return df

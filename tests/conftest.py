from __future__ import annotations

import pytest

from shaman_scraping_spark.corpus.generator import TINY, generate_corpus
from shaman_scraping_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("shaman-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus():
    return generate_corpus(TINY)


@pytest.fixture(scope="session")
def tiny_corpus_dir(tiny_corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus_tiny")
    tiny_corpus.write(out)
    return out


@pytest.fixture(scope="session")
def pages_df(spark, tiny_corpus_dir):
    return spark.read.parquet(str(tiny_corpus_dir / "pages.parquet"))

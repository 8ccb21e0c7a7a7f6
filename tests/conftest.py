import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knext_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("knext_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    from knext_spark.corpus import gen_corpus_rows

    return gen_corpus_rows(n_docs=12, seed=42)


@pytest.fixture(scope="session")
def parsed_docs(spark, corpus_rows):
    from knext_spark.corpus import docs_from_rows
    from knext_spark.parse import parse_docs

    return parse_docs(docs_from_rows(spark, corpus_rows)).cache()


@pytest.fixture(scope="session")
def xml_dir(tmp_path_factory, corpus_rows):
    d = tmp_path_factory.mktemp("xml")
    for repo, path, commit, lang, content in corpus_rows:
        (d / os.path.basename(path)).write_text(content)
    return d

from knext_spark.corpus.kgml_gen import gen_corpus_rows, gen_kgml_doc  # noqa: F401
from knext_spark.corpus.table import (  # noqa: F401
    DOCS_SCHEMA,
    docs_from_rows,
    read_docs,
    write_docs,
)

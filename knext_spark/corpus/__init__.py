from knext_spark.corpus.kgml_gen import (  # noqa: F401
    gen_corpus_rows,
    gen_docs_df,
    gen_kgml_doc,
)
from knext_spark.corpus.table import (  # noqa: F401
    DOCS_SCHEMA,
    docs_from_rows,
    read_docs,
    write_docs,
)

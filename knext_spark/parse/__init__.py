from knext_spark.parse.kgml import parse_docs, KGML_SCHEMA  # noqa: F401

from knext_spark.knext.edges import (  # noqa: F401
    build_edges,
    quarantine_docs,
    EDGE_COLS,
)
from knext_spark.knext.propagate import (  # noqa: F401
    propagate_faithful,
    propagate_contract,
)

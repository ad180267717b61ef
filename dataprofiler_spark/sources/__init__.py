from dataprofiler_spark.sources.synthetic import (  # noqa: F401
    VOCAB_SIZE,
    gen_sequences,
    gen_sources_ref,
    violation_spec,
)
from dataprofiler_spark.sources.tables import load_table, load_tables, read_source  # noqa: F401

from parallel_dataflow_spark.sources.tables import TABLES, load_table, load_tables, register_views  # noqa: F401
from parallel_dataflow_spark.sources.sequences import (  # noqa: F401
    SEQUENCE_SCHEMA,
    generate_sequences_pandas,
    write_sequence_table,
    read_sequence_stream,
)

"""Schema'd sources and sinks.

The reference reads gzipped CSV with per-call ``usecols``/``parse_dates``
(reference: preproc/cohort/day_intervals_cohort_v1.py:65-71,116-129 and
utils/icu_preprocess_util.py:155-175) and hand-chunks the big scans
(icu_preprocess_util.py:289-327). Here every source carries an explicit
StructType (never infer on a production path — a schema-inference pass is
a full extra scan at 100 TB), projection is a ``.select`` Catalyst prunes
into the reader, and chunking is Spark's own partitioned scan.
"""

from temporai_mivdp_spark.sources.readers import (
    TESTDATA_TABLES,
    fan_out,
    load_table,
    load_tables,
    read_csv_gz,
    read_jsonl,
    read_tsv,
)
from temporai_mivdp_spark.sources.sinks import (
    compact_parquet,
    write_bucketed,
    write_csv_gz,
    write_parquet,
)

__all__ = [
    "TESTDATA_TABLES",
    "compact_parquet",
    "fan_out",
    "load_table",
    "load_tables",
    "read_csv_gz",
    "read_jsonl",
    "read_tsv",
    "write_bucketed",
    "write_csv_gz",
    "write_parquet",
]

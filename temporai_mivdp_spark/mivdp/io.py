"""MIMIC-IV directory loader — drop-in input parity with the reference.

The reference reads ``<root>/<version>/{core,hosp,icu}/*.csv.gz``
(day_intervals_cohort_v1.py:65-71 etc.). A user switching engines points
this loader at the same directory; every table comes back schema'd
(mivdp.schemas — no inference pass) and ready for the pipeline stages.

At 100 TB: gzip is not splittable — one task per file. ``to_parquet_lake``
lands the CSVs once as partitioned parquet; run the pipeline from that.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from temporai_mivdp_spark.mivdp import schemas
from temporai_mivdp_spark.sources import read_csv_gz, write_parquet

#: table name -> (relative path under the version dir, schema)
MIMIC_TABLES = {
    "patients": ("core/patients.csv.gz", schemas.PATIENTS),
    "admissions": ("core/admissions.csv.gz", schemas.ADMISSIONS),
    "icustays": ("icu/icustays.csv.gz", schemas.ICUSTAYS),
    "diagnoses_icd": ("hosp/diagnoses_icd.csv.gz", schemas.DIAGNOSES_ICD),
    "chartevents": ("icu/chartevents.csv.gz", schemas.CHARTEVENTS),
    "outputevents": ("icu/outputevents.csv.gz", schemas.OUTPUTEVENTS),
    "procedureevents": ("icu/procedureevents.csv.gz", schemas.PROCEDUREEVENTS),
    "inputevents": ("icu/inputevents.csv.gz", schemas.INPUTEVENTS),
}


def load_mimic_table(
    spark: SparkSession, root_dir: str, version: str, name: str
) -> DataFrame:
    """Load one raw MIMIC-shaped table from the reference's directory
    layout with its explicit schema."""
    rel, schema = MIMIC_TABLES[name]
    return read_csv_gz(spark, os.path.join(root_dir, version, rel), schema)


def load_mimic_tables(
    spark: SparkSession, root_dir: str, version: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the full raw table set (or a subset)."""
    return {
        n: load_mimic_table(spark, root_dir, version, n)
        for n in (names or MIMIC_TABLES)
    }


def to_parquet_lake(
    spark: SparkSession, root_dir: str, version: str, lake_dir: str
) -> None:
    """One-time landing: rewrite the gzip CSV drop as parquet (splittable,
    columnar, prunable). Event tables could further ``partitionBy`` a
    date-bucket column when incremental loads matter."""
    for name in MIMIC_TABLES:
        src = os.path.join(root_dir, version, MIMIC_TABLES[name][0])
        if not os.path.exists(src):
            continue
        write_parquet(load_mimic_table(spark, root_dir, version, name),
                      os.path.join(lake_dir, name))

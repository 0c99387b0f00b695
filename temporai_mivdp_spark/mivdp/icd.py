"""ICD-9 -> ICD-10 standardization and disease cohorts.

The reference loops over distinct ICD-9 codes doing a pandas ``.loc``
lookup per code with first-row-wins semantics
(disease_cohort.py:29-71; icu_preprocess_util.py:369-398). Here the whole
conversion is ONE broadcast left join against a deduplicated mapping —
the ~24k-row mapping never moves the fact side, and misses stay NULL
exactly like the reference's ``np.nan``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporai_mivdp_spark.mivdp.schemas import ICD_MAPPING
from temporai_mivdp_spark.sources import read_tsv


def read_icd_mapping(spark: SparkSession, path: str) -> DataFrame:
    """Load the ICD-9->10 mapping TSV, lowercasing descriptions
    (disease_cohort.py:14-19) and stamping the file line order so
    "first match" is reproducible (the reference's ``.iloc[0]`` takes the
    first row in file order; a single-file read keeps one partition, so
    ``monotonically_increasing_id`` preserves that order)."""
    df = read_tsv(spark, path, schema=ICD_MAPPING)
    return df.withColumn(
        "diagnosis_description", F.lower(F.col("diagnosis_description"))
    ).withColumn("__line", F.monotonically_increasing_id())


def first_match_mapping(mapping: DataFrame, key_col: str = "diagnosis_code") -> DataFrame:
    """One row per mapping key: the first in file order
    (disease_cohort.py:53 ``.iloc[0]``)."""
    w = Window.partitionBy(key_col).orderBy(F.col("__line").asc())
    return (
        mapping.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key_col, "icd10cm")
    )


def standardize_icd(
    diag: DataFrame,
    mapping: DataFrame,
    root: bool = True,
    code_col: str = "icd_code",
    version_col: str = "icd_version",
    out_col: str = "root_icd10_convert",
) -> DataFrame:
    """Add ``out_col``: ICD-9 rows (version 9) mapped to ICD-10 via the
    first-match mapping; ICD-10 rows pass through; mapping misses -> NULL.
    Plus ``root``: first 3 chars of the converted code (NULL stays NULL).

    Semantics-exact to disease_cohort.py:37-71 / icu_preprocess_util.py:
    369-398: with ``root=True`` the lookup key is the ICD-9 code's first
    3 characters.
    """
    lookup_key = F.substring(F.col(code_col), 1, 3) if root else F.col(code_col)
    first = first_match_mapping(mapping).withColumnRenamed("icd10cm", "__mapped")
    joined = diag.join(
        F.broadcast(first),
        on=lookup_key == F.col("diagnosis_code"),
        how="left",
    ).drop("diagnosis_code")
    converted = joined.withColumn(
        out_col,
        F.when(F.col(version_col) == 9, F.col("__mapped")).otherwise(F.col(code_col)),
    ).drop("__mapped")
    return converted.withColumn("root", F.substring(F.col(out_col), 1, 3))


def disease_hadm_ids(
    diag: DataFrame, mapping: DataFrame, icd10_code: str
) -> DataFrame:
    """EP-1's disease filter (disease_cohort.py:74-103): hadm_ids with at
    least one diagnosis whose converted ICD-10 *root* contains the code.
    Returns a distinct ``hadm_id`` key DataFrame for a semi-join."""
    std = standardize_icd(diag, mapping, root=True)
    return (
        std.filter(F.col("root").isNotNull())
        .filter(F.col("root").contains(icd10_code))
        .select("hadm_id")
        .dropDuplicates()
    )

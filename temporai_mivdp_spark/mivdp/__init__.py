"""The clinical pipeline itself: Spark-native cohort extraction, ICD
standardization, event feature engineering, and time-series generation with
the capabilities of the reference MIMIC-IV pipeline (SURVEY.md §3).

Structure mirrors the reference's *capabilities*, not its code:

  schemas    explicit StructTypes for every raw MIMIC-shaped table
  icd        ICD-9 -> ICD-10 standardization + disease cohorts (EP-1 part)
  cohort     visit/patient assembly + mortality/LOS/readmission labels (EP-1)
  features   per-modality event extraction, cleaning, summaries (EP-2)
  datagen    task windows, tumbling buckets, dense grids, imputation (EP-3)

Every stage is a pure DataFrame -> DataFrame function; persistence between
stages is the caller's choice (the reference forces a gzip-CSV round-trip
per stage, feature_preproc_icu.py:254,459-527 — here a single lazy DAG can
span the whole pipeline, or checkpoint to Parquet where operationally
useful).
"""

from temporai_mivdp_spark.mivdp import cohort, datagen, features, icd, schemas

__all__ = ["cohort", "datagen", "features", "icd", "schemas"]

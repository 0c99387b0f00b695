"""Explicit schemas for the raw MIMIC-shaped inputs (FIXTURES.md).

The reference infers all types from CSV plus per-call ``parse_dates``
(day_intervals_cohort_v1.py:65-71,116-129). At 100 TB inference is a full
extra pass — every production read here carries one of these StructTypes.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])  # type: ignore[arg-type]


#: core/patients (day_intervals_cohort_v1.py:116-129)
PATIENTS = _s(
    ("subject_id", LongType()),
    ("gender", StringType()),
    ("dod", TimestampType()),
    ("anchor_age", IntegerType()),
    ("anchor_year", IntegerType()),
    ("anchor_year_group", StringType()),
)

#: core/admissions (day_intervals_cohort_v1.py:91-110,179-185)
ADMISSIONS = _s(
    ("subject_id", LongType()),
    ("hadm_id", LongType()),
    ("admittime", TimestampType()),
    ("dischtime", TimestampType()),
    ("deathtime", TimestampType()),
    ("hospital_expire_flag", IntegerType()),
    ("insurance", StringType()),
    ("ethnicity", StringType()),
)

#: icu/icustays (day_intervals_cohort_v1.py:65-71)
ICUSTAYS = _s(
    ("subject_id", LongType()),
    ("hadm_id", LongType()),
    ("stay_id", LongType()),
    ("intime", TimestampType()),
    ("outtime", TimestampType()),
    ("los", DoubleType()),  # fractional days
)

#: hosp/diagnoses_icd (disease_cohort.py:25)
DIAGNOSES_ICD = _s(
    ("subject_id", LongType()),
    ("hadm_id", LongType()),
    ("seq_num", IntegerType()),
    ("icd_code", StringType()),
    ("icd_version", IntegerType()),
)

#: icu/chartevents (feature_preproc_icu.py:121 usecols)
CHARTEVENTS = _s(
    ("stay_id", LongType()),
    ("charttime", TimestampType()),
    ("itemid", LongType()),
    ("valuenum", DoubleType()),
    ("valueuom", StringType()),
)

#: icu/outputevents (feature_preproc_icu.py:94-111)
OUTPUTEVENTS = _s(
    ("subject_id", LongType()),
    ("hadm_id", LongType()),
    ("stay_id", LongType()),
    ("charttime", TimestampType()),
    ("itemid", LongType()),
)

#: icu/procedureevents (feature_preproc_icu.py:145 usecols)
PROCEDUREEVENTS = _s(
    ("stay_id", LongType()),
    ("starttime", TimestampType()),
    ("itemid", LongType()),
)

#: icu/inputevents (icu_preprocess_util.py:161-175 usecols)
INPUTEVENTS = _s(
    ("subject_id", LongType()),
    ("stay_id", LongType()),
    ("itemid", LongType()),
    ("starttime", TimestampType()),
    ("endtime", TimestampType()),
    ("rate", DoubleType()),
    ("amount", DoubleType()),
    ("orderid", LongType()),
)

#: ICD-9 -> ICD-10 mapping TSV (utils/mappings/ICD9_to_ICD10_mapping.txt)
ICD_MAPPING = _s(
    ("diagnosis_type", StringType()),
    ("diagnosis_code", StringType()),
    ("diagnosis_description", StringType()),
    ("icd9cm", StringType()),
    ("icd10cm", StringType()),
    ("flags", StringType()),
)

#: labeled cohort golden column set
#: (tests/preproc/cohort/test_day_intervals_cohort_v1.py:9-23)
COHORT_COLUMNS_ICU = [
    "subject_id",
    "stay_id",
    "hadm_id",
    "intime",
    "outtime",
    "los",
    "min_valid_year",
    "dod",
    "Age",
    "gender",
    "ethnicity",
    "insurance",
    "label",
]

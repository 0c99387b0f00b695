"""Cohort extraction (EP-1): visit/patient assembly + labels.

Re-expresses day_intervals_cohort_v1.py:25-436 as one lazy DataFrame DAG:
scan -> filter -> broadcast joins -> label (when / interval-exists join) ->
projection. The reference's per-subject readmission loop with row-wise
appends — self-flagged "highly inefficient" (:20-22) — becomes a set-wise
exists-join that shuffles once on subject_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporai_mivdp_spark.functions.scalars import floor_days
from temporai_mivdp_spark.operators.joins import interval_exists_label
from temporai_mivdp_spark.operators.filters import semi_join_filter


def patient_attributes(patients: DataFrame) -> DataFrame:
    """Derived patient columns (day_intervals_cohort_v1.py:131-132):
    ``yob = anchor_year - anchor_age``;
    ``min_valid_year = anchor_year + (2019 - int(anchor_year_group[-4:]))``.
    """
    return patients.withColumn(
        "yob", F.col("anchor_year") - F.col("anchor_age")
    ).withColumn(
        "min_valid_year",
        F.col("anchor_year")
        + (F.lit(2019) - F.substring(F.col("anchor_year_group"), -4, 4).cast("int")),
    )


def visit_pts_icu(
    icustays: DataFrame,
    patients: DataFrame,
    admissions: DataFrame,
    use_admn: bool = False,
    disease_hadm_ids: DataFrame | None = None,
) -> DataFrame:
    """ICU visit-patient assembly (day_intervals_cohort_v1.py:64-88,
    116-186, ICU branch).

    Joins: visits ⋈ patients (subject_id, broadcast the patient side when
    it is the dimension), ⋈ admissions demographics (hadm_id). For
    readmission cohorts, stays where the patient died before discharge are
    removed (:84). Adults only (:176).
    """
    visit = icustays
    if use_admn:
        # dod from patients; drop stays with death before discharge (:84)
        dod = patients.select("subject_id", F.col("dod").alias("__dod"))
        visit = (
            visit.join(dod, "subject_id", "inner")
            .filter(F.col("__dod").isNull() | (F.col("__dod") >= F.col("outtime")))
            .drop("__dod")
        )
        if disease_hadm_ids is not None:
            visit = semi_join_filter(visit, disease_hadm_ids, "hadm_id")

    pts = patient_attributes(patients).select(
        "subject_id", "anchor_year", "anchor_age", "yob", "min_valid_year", "dod", "gender"
    )
    joined = visit.select(
        "subject_id", "stay_id", "hadm_id", "intime", "outtime", "los"
    ).join(pts, "subject_id", "inner")

    # Age = anchor_age; adults only (:173-176)
    adult = joined.withColumn("Age", F.col("anchor_age")).filter(F.col("Age") >= 18)

    demo = admissions.select("hadm_id", "insurance", "ethnicity")
    out = adult.join(demo, "hadm_id", "inner")
    return out.select(
        "subject_id", "stay_id", "hadm_id", "intime", "outtime", "los",
        "min_valid_year", "dod", "Age", "gender", "ethnicity", "insurance",
    )


def visit_pts_hosp(
    admissions: DataFrame,
    patients: DataFrame,
    use_admn: bool = False,
    disease_hadm_ids: DataFrame | None = None,
) -> DataFrame:
    """Non-ICU visit assembly (day_intervals_cohort_v1.py:92-114,155-220):
    los = whole days between admit and discharge (:98-106, the days-only
    string split -> ``floor_days``); readmission drops in-hospital deaths
    via ``hospital_expire_flag`` (:110); requires non-null min_valid_year
    (:212)."""
    visit = admissions.withColumn(
        "los", floor_days(F.col("dischtime"), F.col("admittime")).cast("double")
    )
    if use_admn:
        visit = visit.filter(F.col("hospital_expire_flag") == 0)
    if disease_hadm_ids is not None:
        visit = semi_join_filter(visit, disease_hadm_ids, "hadm_id")

    pts = patient_attributes(patients).select(
        "subject_id", "yob", "min_valid_year", "dod", "gender", "anchor_age"
    )
    joined = visit.select(
        "subject_id", "hadm_id", "admittime", "dischtime", "los", "insurance", "ethnicity"
    ).join(pts, "subject_id", "inner")
    adult = joined.withColumn("Age", F.col("anchor_age")).filter(F.col("Age") >= 18)
    return adult.filter(F.col("min_valid_year").isNotNull()).select(
        "subject_id", "hadm_id", "admittime", "dischtime", "los",
        "min_valid_year", "dod", "Age", "gender", "ethnicity", "insurance",
    )


def label_mortality(
    cohort: DataFrame,
    admit_col: str = "intime",
    disch_col: str = "outtime",
    death_col: str = "dod",
) -> tuple[DataFrame, DataFrame]:
    """Mortality label (partition_by_mort, day_intervals_cohort_v1.py:
    326-372): invalid = null admit/discharge; label = 1 iff death time
    falls within [admit, discharge]. The reference's split-fillna-concat
    dance collapses to one ``when`` — no split, no union."""
    invalid = cohort.filter(F.col(admit_col).isNull() | F.col(disch_col).isNull())
    valid = cohort.filter(F.col(admit_col).isNotNull() & F.col(disch_col).isNotNull())
    labeled = valid.withColumn(
        "label",
        F.when(
            F.col(death_col).isNotNull()
            & (F.col(death_col) >= F.col(admit_col))
            & (F.col(death_col) <= F.col(disch_col)),
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    return labeled, invalid


def label_los(
    cohort: DataFrame,
    los_days: int,
    admit_col: str = "intime",
    disch_col: str = "outtime",
) -> tuple[DataFrame, DataFrame]:
    """Length-of-stay label (partition_by_los, :240-265): invalid = null
    admit/discharge/los; label = los > threshold."""
    invalid = cohort.filter(
        F.col(admit_col).isNull() | F.col(disch_col).isNull() | F.col("los").isNull()
    )
    valid = cohort.filter(
        F.col(admit_col).isNotNull() & F.col(disch_col).isNotNull() & F.col("los").isNotNull()
    )
    labeled = valid.withColumn(
        "label", F.when(F.col("los") > los_days, 1).otherwise(0).cast("int")
    )
    return labeled, invalid


def label_readmission(
    cohort: DataFrame,
    gap_days: int,
    group_col: str = "subject_id",
    admit_col: str = "intime",
    disch_col: str = "outtime",
) -> DataFrame:
    """Readmission label (partition_by_readmit, :268-323): visit i is
    positive iff ANY visit of the same subject starts after i's discharge
    and within ``gap_days`` of it. Single-visit subjects and the
    chronologically last visit get 0 naturally (no later visit exists in
    the gap) — no special-casing needed, unlike the reference's loop.

    One equi-join on subject_id (hash shuffle), interval predicate inside
    the key group, aggregate back to one row per visit.
    """
    id_cols = [c for c in cohort.columns if c not in (group_col, admit_col, disch_col)]
    return interval_exists_label(
        cohort,
        group_key=group_col,
        start_col=admit_col,
        end_col=disch_col,
        gap_days=gap_days,
        id_cols=id_cols,
    )


def cohort_summary(cohort: DataFrame, group_col: str = "subject_id") -> DataFrame:
    """A10/S7 one-row summary (day_intervals_cohort_v1.py:667-683)."""
    return cohort.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.countDistinct(group_col).alias("n_patients"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).cast("long").alias("n_neg"),
    )


def extract_cohort_icu(
    icustays: DataFrame,
    patients: DataFrame,
    admissions: DataFrame,
    label: str,
    time: int = 0,
    disease_hadm_ids_df: DataFrame | None = None,
    cohort_disease_hadm_ids_df: DataFrame | None = None,
) -> DataFrame:
    """EP-1 end-to-end for the ICU path (extract_data,
    day_intervals_cohort_v1.py:444-685): assemble visits, apply the label
    strategy, optional disease semi-join on the labeled cohort (:643-653).

    ``label``: "mortality" | "readmission" | "los".
    ``time``: readmission gap days or LOS threshold days.
    """
    use_admn = label == "readmission"
    pts = visit_pts_icu(icustays, patients, admissions, use_admn=use_admn,
                        disease_hadm_ids=disease_hadm_ids_df)
    if label == "mortality":
        labeled, _ = label_mortality(pts)
    elif label == "readmission":
        labeled = label_readmission(pts, gap_days=time)
    elif label == "los":
        labeled, _ = label_los(pts, los_days=time)
    else:
        raise ValueError(f"unknown label {label!r}")
    if cohort_disease_hadm_ids_df is not None:
        labeled = semi_join_filter(labeled, cohort_disease_hadm_ids_df, "hadm_id")
    return labeled


def extract_cohort_hosp(
    admissions: DataFrame,
    patients: DataFrame,
    label: str,
    time: int = 0,
    disease_hadm_ids_df: DataFrame | None = None,
    cohort_disease_hadm_ids_df: DataFrame | None = None,
) -> DataFrame:
    """EP-1 end-to-end for the NON-ICU path (extract_data with
    use_ICU=False, day_intervals_cohort_v1.py:444-685): visits come
    from admissions (los = whole days between admittime and dischtime
    — the :98-106 timedelta string-split as ``floor_days``; readmission
    drops in-hospital deaths via hospital_expire_flag :110), the same
    three label strategies run over (admittime, dischtime), and the
    optional disease semi-join applies to the labeled cohort.

    ``label``: "mortality" | "readmission" | "los".
    ``time``: readmission gap days or LOS threshold days.
    """
    use_admn = label == "readmission"
    pts = visit_pts_hosp(
        admissions, patients, use_admn=use_admn,
        disease_hadm_ids=disease_hadm_ids_df,
    )
    if label == "mortality":
        labeled, _ = label_mortality(
            pts, admit_col="admittime", disch_col="dischtime"
        )
    elif label == "readmission":
        labeled = label_readmission(
            pts, gap_days=time, admit_col="admittime", disch_col="dischtime"
        )
    elif label == "los":
        labeled, _ = label_los(
            pts, los_days=time, admit_col="admittime", disch_col="dischtime"
        )
    else:
        raise ValueError(f"unknown label {label!r}")
    if cohort_disease_hadm_ids_df is not None:
        labeled = semi_join_filter(labeled, cohort_disease_hadm_ids_df, "hadm_id")
    return labeled

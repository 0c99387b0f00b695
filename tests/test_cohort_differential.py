"""EP-1 composition-level differential: ``extract_cohort_icu`` end to end
against an independent pandas transliteration of the reference's cohort
pipeline (day_intervals_cohort_v1.py:444-685 — get_visit_pts :25-220 +
get_case_ctrls :375-441 + partition_by_{mort,readmit,los} :241-372), on
randomized MIMIC-shaped fixtures, across all three label strategies.

The per-operator oracles check each stage; this catches COMPOSITION
drift (a filter applied before instead of after a join, an off-by-one in
the readmission window) that stage-level checks cannot. The
transliteration deliberately keeps the reference's formulation — python
loops over subject groups, positional last-row handling — so agreement
is evidence, not tautology. CSV/gzip I/O is skipped on both sides
(fixtures are in-memory frames): file glue is covered by the source
tests, the semantics under test start at the parsed tables.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from temporai_mivdp_spark.mivdp.cohort import extract_cohort_icu

BASE = dt.datetime(2015, 1, 1)


# ---------------------------------------------------------------------------
# Reference transliteration (pandas, loops and all)
# ---------------------------------------------------------------------------


def ref_visit_pts_icu(icustays, patients, admissions, use_admn):
    """get_visit_pts, ICU branch (:64-88, 116-186)."""
    visit = icustays.copy()
    if use_admn:
        pts_dod = patients[["subject_id", "dod"]]
        visit = visit.merge(pts_dod, on="subject_id", how="inner")
        visit = visit.loc[visit.dod.isna() | (visit.dod >= visit.outtime)]
        visit = visit.drop(columns=["dod"])
    pts = patients.copy()
    pts["yob"] = pts["anchor_year"] - pts["anchor_age"]
    pts["min_valid_year"] = pts["anchor_year"] + (
        2019 - pts["anchor_year_group"].str.slice(start=-4).astype(int)
    )
    vp = visit[["subject_id", "stay_id", "hadm_id", "intime", "outtime", "los"]].merge(
        pts[["subject_id", "anchor_year", "anchor_age", "yob", "min_valid_year", "dod", "gender"]],
        on="subject_id",
        how="inner",
    )
    vp["Age"] = vp["anchor_age"]
    vp = vp.loc[vp["Age"] >= 18]
    eth = admissions[["hadm_id", "insurance", "ethnicity"]]
    vp = vp.merge(eth, on="hadm_id", how="inner")
    return vp[
        ["subject_id", "stay_id", "hadm_id", "intime", "outtime", "los",
         "min_valid_year", "dod", "Age", "gender", "ethnicity", "insurance"]
    ]


def ref_partition_by_mort(df):
    """partition_by_mort (:326-372): label 1 iff dod in [intime, outtime]."""
    invalid = df.loc[df.intime.isna() | df.outtime.isna()]
    cohort = df.loc[~df.intime.isna() & ~df.outtime.isna()].copy()
    labels = []
    for _, row in cohort.iterrows():
        if pd.isna(row.dod):
            labels.append(0)
        else:
            labels.append(int(row.intime <= row.dod <= row.outtime))
    cohort["label"] = labels
    return cohort, invalid


def ref_partition_by_readmit(df, gap_days):
    """partition_by_readmit (:268-323): per-subject loop, admit-sorted;
    row i is a case iff any visit admits strictly after i's discharge
    and within the gap; the positionally-last row always lands in ctrl."""
    gap = dt.timedelta(days=gap_days)
    case_rows, ctrl_rows = [], []
    for _, group in df.sort_values(by=["subject_id", "intime"]).groupby("subject_id"):
        if group.shape[0] <= 1:
            ctrl_rows.append(group.iloc[0])
            continue
        for idx in range(group.shape[0] - 1):
            visit_time = group.iloc[idx]["outtime"]
            hit = group.loc[
                (group["intime"] > visit_time) & (group["intime"] - visit_time <= gap)
            ]
            (case_rows if hit.shape[0] >= 1 else ctrl_rows).append(group.iloc[idx])
        ctrl_rows.append(group.iloc[-1])
    case = pd.DataFrame(case_rows)
    ctrl = pd.DataFrame(ctrl_rows)
    if not case.empty:
        case["label"] = 1
    if not ctrl.empty:
        ctrl["label"] = 0
    return pd.concat([f for f in (case, ctrl) if not f.empty], axis=0)


def ref_partition_by_los(df, los_days):
    """partition_by_los (:241-265): label = los > threshold."""
    invalid = df.loc[df.intime.isna() | df.outtime.isna() | df.los.isna()]
    cohort = df.loc[~df.intime.isna() & ~df.outtime.isna() & ~df.los.isna()].copy()
    cohort["label"] = (cohort["los"] > los_days).astype(int)
    return cohort, invalid


def ref_extract_icu(icustays, patients, admissions, label, time, cohort_hadm_ids=None):
    """extract_data composition (:444-685, ICU branch)."""
    pts = ref_visit_pts_icu(icustays, patients, admissions, use_admn=label == "readmission")
    if label == "mortality":
        cohort, _ = ref_partition_by_mort(pts)
    elif label == "readmission":
        cohort = ref_partition_by_readmit(pts, time)
    elif label == "los":
        cohort, _ = ref_partition_by_los(pts, time)
    else:
        raise ValueError(label)
    if cohort_hadm_ids is not None:
        cohort = cohort[cohort["hadm_id"].isin(cohort_hadm_ids)]
    return cohort


# ---------------------------------------------------------------------------
# Randomized MIMIC-shaped fixture
# ---------------------------------------------------------------------------


def make_fixture(seed, n_subjects=40, allow_null_times=True):
    rng = random.Random(seed)
    patients, icustays, admissions = [], [], []
    stay_id = hadm_id = 1000
    for sid in range(n_subjects):
        anchor_age = rng.randint(15, 90)  # some minors -> adult filter fires
        gender = rng.choice(["M", "F"])
        anchor_year = rng.randint(2012, 2019)
        group_end = rng.choice([2011, 2014, 2017, 2019])
        anchor_year_group = f"{group_end - 2} - {group_end}"
        n_stays = rng.randint(1, 4)
        stays = []
        t = BASE + dt.timedelta(days=rng.randint(0, 200))
        for _ in range(n_stays):
            intime = t
            los_days = rng.uniform(0.2, 12.0)
            outtime = intime + dt.timedelta(days=los_days)
            # gaps chosen to straddle the 30-day readmission window
            t = outtime + dt.timedelta(days=rng.choice([1, 5, 15, 29, 30, 31, 45, 90]))
            stays.append((intime, outtime, los_days))
        # dod: none / during a stay / between stays / long after
        dod = None
        mode = rng.random()
        if mode < 0.25:
            s = rng.choice(stays)
            dod = s[0] + (s[1] - s[0]) / 2
        elif mode < 0.4:
            dod = stays[-1][1] + dt.timedelta(days=rng.randint(1, 400))
        patients.append((sid, anchor_year, anchor_age, anchor_year_group, dod, gender))
        for intime, outtime, los_days in stays:
            stay_id += 1
            hadm_id += 1
            if allow_null_times and rng.random() < 0.05:
                intime = None
            if allow_null_times and rng.random() < 0.05:
                outtime = None
            icustays.append((sid, stay_id, hadm_id, intime, outtime, los_days))
            admissions.append(
                (hadm_id, rng.choice(["Medicare", "Medicaid", "Other"]),
                 rng.choice(["WHITE", "BLACK", "ASIAN", "OTHER"]))
            )
    pdf_pat = pd.DataFrame(
        patients,
        columns=["subject_id", "anchor_year", "anchor_age", "anchor_year_group", "dod", "gender"],
    )
    pdf_icu = pd.DataFrame(
        icustays, columns=["subject_id", "stay_id", "hadm_id", "intime", "outtime", "los"]
    )
    pdf_adm = pd.DataFrame(admissions, columns=["hadm_id", "insurance", "ethnicity"])
    for c in ("intime", "outtime"):
        pdf_icu[c] = pd.to_datetime(pdf_icu[c])
    pdf_pat["dod"] = pd.to_datetime(pdf_pat["dod"])
    return pdf_icu, pdf_pat, pdf_adm


def to_spark(spark, pdf_icu, pdf_pat, pdf_adm):
    icu = spark.createDataFrame(
        pdf_icu,
        "subject_id long, stay_id long, hadm_id long, intime timestamp, "
        "outtime timestamp, los double",
    )
    pat = spark.createDataFrame(
        pdf_pat,
        "subject_id long, anchor_year long, anchor_age long, "
        "anchor_year_group string, dod timestamp, gender string",
    )
    adm = spark.createDataFrame(pdf_adm, "hadm_id long, insurance string, ethnicity string")
    return icu, pat, adm


def _labels(df_rows):
    return {(r.subject_id, r.stay_id): r.label for r in df_rows}


@pytest.mark.parametrize("label,time", [("mortality", 0), ("readmission", 30), ("los", 3)])
@pytest.mark.parametrize("seed", [2, 13])
def test_extract_cohort_icu_matches_reference_transliteration(spark, label, time, seed):
    # readmission never sees null times in MIMIC (icustays intime/outtime
    # are non-null by construction); the reference loop has no defined
    # null semantics there, so the fixture matches the real invariant
    pdf_icu, pdf_pat, pdf_adm = make_fixture(
        seed, allow_null_times=label != "readmission"
    )
    icu, pat, adm = to_spark(spark, pdf_icu, pdf_pat, pdf_adm)

    got = _labels(extract_cohort_icu(icu, pat, adm, label=label, time=time).collect())
    ref = ref_extract_icu(pdf_icu, pdf_pat, pdf_adm, label, time)
    want = {(int(r.subject_id), int(r.stay_id)): int(r.label) for _, r in ref.iterrows()}

    assert got == want
    # the fixture must actually exercise both classes
    assert 0 < sum(want.values()) < len(want)


@pytest.mark.parametrize("label,time", [("readmission", 30), ("los", 3)])
def test_extract_cohort_icu_disease_filter_matches(spark, label, time):
    """The optional hadm_id disease semi-join on the LABELED cohort
    (:643-653) must subset without changing any surviving label."""
    pdf_icu, pdf_pat, pdf_adm = make_fixture(7, allow_null_times=False)
    icu, pat, adm = to_spark(spark, pdf_icu, pdf_pat, pdf_adm)
    rng = random.Random(99)
    keep_hadm = sorted(h for h in pdf_icu.hadm_id if rng.random() < 0.5)
    hids = spark.createDataFrame([(h,) for h in keep_hadm], "hadm_id long")

    got = _labels(
        extract_cohort_icu(
            icu, pat, adm, label=label, time=time, cohort_disease_hadm_ids_df=hids
        ).collect()
    )
    ref = ref_extract_icu(pdf_icu, pdf_pat, pdf_adm, label, time, cohort_hadm_ids=set(keep_hadm))
    want = {(int(r.subject_id), int(r.stay_id)): int(r.label) for _, r in ref.iterrows()}
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# hosp (use_ICU=False) branch: transliteration + differential
# ---------------------------------------------------------------------------


def ref_visit_pts_hosp(admissions, patients, use_admn):
    """get_visit_pts, hosp branch (:90-114, 155-220): los = whole days
    from the timedelta string split; readmission drops in-hospital
    deaths; dropna(min_valid_year)."""
    visit = admissions.copy()
    td = visit["dischtime"] - visit["admittime"]
    visit["los"] = pd.to_numeric(
        td.astype(str).str.split(" ", expand=True)[0]
    )
    if use_admn:
        visit = visit.loc[visit.hospital_expire_flag == 0]
    pts = patients.copy()
    pts["yob"] = pts["anchor_year"] - pts["anchor_age"]
    pts["min_valid_year"] = pts["anchor_year"] + (
        2019 - pts["anchor_year_group"].str.slice(start=-4).astype(int)
    )
    vp = visit[["subject_id", "hadm_id", "admittime", "dischtime", "los"]].merge(
        pts[["subject_id", "anchor_year", "anchor_age", "yob",
             "min_valid_year", "dod", "gender"]],
        on="subject_id",
        how="inner",
    )
    vp["Age"] = vp["anchor_age"]
    vp = vp.loc[vp["Age"] >= 18]
    eth = admissions[["hadm_id", "insurance", "ethnicity"]]
    vp = vp.merge(eth, on="hadm_id", how="inner")
    return vp.dropna(subset=["min_valid_year"])[
        ["subject_id", "hadm_id", "admittime", "dischtime", "los",
         "min_valid_year", "dod", "Age", "gender", "ethnicity", "insurance"]
    ]


def ref_partition_by_readmit_hosp(df, gap_days):
    """Same loop as the ICU form, over (admittime, dischtime)."""
    d = df.rename(columns={"admittime": "intime", "dischtime": "outtime"})
    out = ref_partition_by_readmit(d, gap_days)
    return out.rename(columns={"intime": "admittime", "outtime": "dischtime"})


def ref_extract_hosp(admissions, patients, label, time):
    pts = ref_visit_pts_hosp(admissions, patients, use_admn=label == "readmission")
    if label == "mortality":
        invalid_mask = pts.admittime.isna() | pts.dischtime.isna()
        cohort = pts.loc[~invalid_mask].copy()
        cohort["label"] = [
            0 if pd.isna(r.dod) else int(r.admittime <= r.dod <= r.dischtime)
            for _, r in cohort.iterrows()
        ]
    elif label == "readmission":
        cohort = ref_partition_by_readmit_hosp(pts, time)
    elif label == "los":
        mask = pts.admittime.isna() | pts.dischtime.isna() | pts.los.isna()
        cohort = pts.loc[~mask].copy()
        cohort["label"] = (cohort["los"] > time).astype(int)
    else:
        raise ValueError(label)
    return cohort


def make_hosp_fixture(seed, n_subjects=40):
    rng = random.Random(seed)
    patients, admissions = [], []
    hadm_id = 5000
    for sid in range(n_subjects):
        anchor_age = rng.randint(15, 90)
        gender = rng.choice(["M", "F"])
        anchor_year = rng.randint(2012, 2019)
        group_end = rng.choice([2011, 2014, 2017, 2019])
        anchor_year_group = f"{group_end - 2} - {group_end}"
        n_adm = rng.randint(1, 4)
        stays = []
        t = BASE + dt.timedelta(days=rng.randint(0, 200))
        for _ in range(n_adm):
            admit = t
            los_days = rng.uniform(0.2, 12.0)
            disch = admit + dt.timedelta(days=los_days)
            t = disch + dt.timedelta(days=rng.choice([1, 5, 15, 29, 30, 31, 45, 90]))
            stays.append((admit, disch))
        dod = None
        died_inhouse = False
        mode = rng.random()
        if mode < 0.25:
            s = rng.choice(stays)
            dod = s[0] + (s[1] - s[0]) / 2
            died_inhouse = True
        elif mode < 0.4:
            dod = stays[-1][1] + dt.timedelta(days=rng.randint(1, 400))
        patients.append((sid, anchor_year, anchor_age, anchor_year_group, dod, gender))
        for admit, disch in stays:
            hadm_id += 1
            expire = int(died_inhouse and dod is not None and admit <= dod <= disch)
            admissions.append(
                (sid, hadm_id, admit, disch, expire,
                 rng.choice(["Medicare", "Medicaid", "Other"]),
                 rng.choice(["WHITE", "BLACK", "ASIAN", "OTHER"]))
            )
    pdf_pat = pd.DataFrame(
        patients,
        columns=["subject_id", "anchor_year", "anchor_age", "anchor_year_group",
                 "dod", "gender"],
    )
    pdf_adm = pd.DataFrame(
        admissions,
        columns=["subject_id", "hadm_id", "admittime", "dischtime",
                 "hospital_expire_flag", "insurance", "ethnicity"],
    )
    for c in ("admittime", "dischtime"):
        pdf_adm[c] = pd.to_datetime(pdf_adm[c])
    pdf_pat["dod"] = pd.to_datetime(pdf_pat["dod"])
    return pdf_adm, pdf_pat


@pytest.mark.parametrize("label,time", [("mortality", 0), ("readmission", 30), ("los", 3)])
@pytest.mark.parametrize("seed", [3, 17])
def test_extract_cohort_hosp_matches_reference_transliteration(spark, label, time, seed):
    from temporai_mivdp_spark.mivdp.cohort import extract_cohort_hosp

    pdf_adm, pdf_pat = make_hosp_fixture(seed)
    adm = spark.createDataFrame(
        pdf_adm,
        "subject_id long, hadm_id long, admittime timestamp, "
        "dischtime timestamp, hospital_expire_flag int, insurance string, "
        "ethnicity string",
    )
    pat = spark.createDataFrame(
        pdf_pat,
        "subject_id long, anchor_year long, anchor_age long, "
        "anchor_year_group string, dod timestamp, gender string",
    )
    got = {
        (r.subject_id, r.hadm_id): r.label
        for r in extract_cohort_hosp(adm, pat, label=label, time=time).collect()
    }
    ref = ref_extract_hosp(pdf_adm, pdf_pat, label, time)
    want = {(int(r.subject_id), int(r.hadm_id)): int(r.label) for _, r in ref.iterrows()}
    assert got == want
    assert 0 < sum(want.values()) < len(want)


# ---------------------------------------------------------------------------
# EP-3 front half: task-window trim composition differential
# (mortality_length / los_length / readmission_length, datagen :392-520)
# ---------------------------------------------------------------------------


def ref_task_trim(data, meds, chart, task, include_time, pred_w):
    """Transliteration of the reference's *_length methods: stay filter,
    meds interval trim (clamp at window or shift-to-end), point-event
    trim. Returns (data, meds, chart) pandas frames."""
    data = data.copy()
    if task == "mortality":
        data = data[data["los"] >= include_time + pred_w]
    else:
        data = data[data["los"] >= include_time]
    if task == "readmission":
        data["select_time"] = data["los"] - include_time
    data["los"] = include_time

    meds = meds[meds["stay_id"].isin(data["stay_id"])].copy()
    chart = chart[chart["stay_id"].isin(data["stay_id"])].copy()
    if task == "readmission":
        meds = pd.merge(meds, data[["stay_id", "select_time"]], on="stay_id", how="left")
        meds["stop_time"] = meds["stop_time"] - meds["select_time"]
        meds["start_time"] = meds["start_time"] - meds["select_time"]
        meds = meds[meds["stop_time"] >= 0]
        meds.loc[meds.start_time < 0, "start_time"] = 0
        meds = meds.drop(columns=["select_time"])
        chart = pd.merge(chart, data[["stay_id", "select_time"]], on="stay_id", how="left")
        chart["start_time"] = chart["start_time"] - chart["select_time"]
        chart = chart[chart["start_time"] >= 0]
        chart = chart.drop(columns=["select_time"])
    else:
        meds = meds[meds["start_time"] <= include_time]
        meds.loc[meds.stop_time > include_time, "stop_time"] = include_time
        chart = chart[chart["start_time"] <= include_time]
    return data, meds, chart


def make_datagen_fixture(seed, n_stays=60):
    rng = random.Random(seed)
    stays, meds, chart = [], [], []
    for sid in range(n_stays):
        los = rng.randint(1, 200)
        stays.append((sid, los))
        for _ in range(rng.randint(0, 6)):
            start = rng.randint(0, los + 30)  # some events past los
            stop = start + rng.randint(0, 80)
            meds.append((sid, rng.randint(1, 5), start, stop, rng.uniform(0.5, 9.9)))
        for _ in range(rng.randint(0, 8)):
            chart.append((sid, rng.randint(1, 9), rng.randint(0, los + 30),
                          rng.uniform(50.0, 150.0)))
    pdf_data = pd.DataFrame(stays, columns=["stay_id", "los"])
    pdf_meds = pd.DataFrame(
        meds, columns=["stay_id", "itemid", "start_time", "stop_time", "rate"]
    )
    pdf_chart = pd.DataFrame(
        chart, columns=["stay_id", "itemid", "start_time", "valuenum"]
    )
    return pdf_data, pdf_meds, pdf_chart


@pytest.mark.parametrize(
    "task,include_time,pred_w",
    [("mortality", 72, 24), ("los", 96, 0), ("readmission", 48, 0)],
)
@pytest.mark.parametrize("seed", [5, 23])
def test_task_trim_composition_matches_reference(spark, task, include_time, pred_w, seed):
    from temporai_mivdp_spark.mivdp import datagen as dg

    pdf_data, pdf_meds, pdf_chart = make_datagen_fixture(seed)
    data = spark.createDataFrame(pdf_data, "stay_id long, los long")
    meds = spark.createDataFrame(
        pdf_meds, "stay_id long, itemid long, start_time long, stop_time long, rate double"
    )
    chart = spark.createDataFrame(
        pdf_chart, "stay_id long, itemid long, start_time long, valuenum double"
    )

    if task == "mortality":
        kept = dg.trim_anchored_start(data, include_time, pred_window=pred_w)
        m = dg.trim_events_start(meds, kept, include_time, clamp_stop=True)
        c = dg.trim_events_start(chart, kept, include_time)
    elif task == "los":
        kept = dg.trim_anchored_start(data, include_time)
        m = dg.trim_events_start(meds, kept, include_time, clamp_stop=True)
        c = dg.trim_events_start(chart, kept, include_time)
    else:
        kept = dg.trim_readmission(data, include_time)
        m = dg.trim_events_end_anchored(meds, kept, has_stop=True)
        c = dg.trim_events_end_anchored(chart, kept)

    rd, rm, rc = ref_task_trim(pdf_data, pdf_meds, pdf_chart, task, include_time, pred_w)

    got_stays = {(r.stay_id, r.los) for r in kept.select("stay_id", "los").collect()}
    want_stays = {(int(r.stay_id), int(r.los)) for _, r in rd.iterrows()}
    assert got_stays == want_stays

    # meds: multiset of (stay, item, start, stop, rate)
    got_m = sorted(
        (r.stay_id, r.itemid, r.start_time, r.stop_time, round(r.rate, 9))
        for r in m.select("stay_id", "itemid", "start_time", "stop_time", "rate").collect()
    )
    want_m = sorted(
        (int(r.stay_id), int(r.itemid), int(r.start_time), int(r.stop_time),
         round(float(r.rate), 9))
        for _, r in rm.iterrows()
    )
    assert got_m == want_m

    got_c = sorted(
        (r.stay_id, r.itemid, r.start_time, round(r.valuenum, 9))
        for r in c.select("stay_id", "itemid", "start_time", "valuenum").collect()
    )
    want_c = sorted(
        (int(r.stay_id), int(r.itemid), int(r.start_time), round(float(r.valuenum), 9))
        for _, r in rc.iterrows()
    )
    assert got_c == want_c
    # the windows must actually cut something on this fixture
    assert len(want_stays) < len(pdf_data)
    assert len(want_m) < len(pdf_meds[pdf_meds.stay_id.isin(rd.stay_id)])

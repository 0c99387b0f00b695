"""EP-2 composition-level differential: the chain ``feature_icu`` →
``preprocess_features_icu`` → ``generate_summary_icu`` →
``features_selection_icu`` (mivdp/api.py:101-196) end to end against an
independent pandas transliteration of the reference's feature pipeline
(feature_preproc_icu.py:26-391 — icu_preprocess_util.py preproc_* :155-430
+ uom_conversion.drop_wrong_uom + outlier_removal.outlier_imputation +
the summary groupby/merge chains), on a randomized MIMIC-shaped fixture,
across the three diag grouping modes and both chart outlier modes.

The per-operator oracles (a2/a3/a7/a8/j7 etc.) check each stage; this
catches COMPOSITION drift (voting before instead of after dedup, a
dropna moved across a join, a right-merge turned left) that stage-level
checks cannot. The transliteration deliberately keeps the reference's
formulation — python loops over code groups and itemid groups, in-place
drops — so agreement is evidence, not tautology.

Known representational difference, held out of the comparison surface:
the reference carries ``event_time_from_admit`` as a raw Timedelta while
the engine floors it to whole hours at extraction (SURVEY §1.2, F4).
Downstream consumers only ever bucket or group on it, so the fixture
generates at most one event per (stay, item, value, hour) and the
reference side floors before comparing — dedup then collapses the same
rows on both sides.
"""

from __future__ import annotations

import datetime as dt
import gzip
import os
import random
import tempfile

import numpy as np
import pandas as pd
import pytest

from temporai_mivdp_spark.mivdp import api

BASE = dt.datetime(2150, 1, 1)


# ---------------------------------------------------------------------------
# Randomized MIMIC-shaped fixture
# ---------------------------------------------------------------------------

ICD_MAP_ROWS = [  # (diagnosis_code, icd10cm) — first-match table
    ("428", "I50"), ("401", "I10"), ("250", "E11"), ("428", "I509"),
]
ICD9_POOL = ["42822", "4280", "40101", "25000", "25040", "7999"]  # 799 unmapped
ICD10_POOL = ["I251", "I5030", "E119", "J189"]
CHART_ITEMS = {
    # itemid -> list of (uom, weight): majorities engineered strict so the
    # 0.95 vote either clearly fires or clearly doesn't (pandas
    # value_counts ties are insertion-order nondeterminism we pin away)
    220045: [("bpm", 1.0)],
    220210: [("insp/min", 0.97), ("L/min", 0.03)],   # fires at 0.95
    223762: [("degC", 0.6), ("degF", 0.4)],           # never fires
}


def make_fixture(seed):
    rng = random.Random(seed)
    subjects = list(range(1, 21))
    stays, adms = [], []
    stay_id = 1000
    hadm_id = 100
    for s in subjects:
        n_stays = rng.choice([1, 1, 1, 2])  # a few subjects with 2 stays
        hadm_id += 1
        for _ in range(n_stays):
            stay_id += 1
            intime = BASE + dt.timedelta(days=rng.randint(0, 60), hours=rng.randint(0, 23))
            outtime = intime + dt.timedelta(hours=rng.randint(30, 200))
            stays.append((s, hadm_id, stay_id, intime, outtime, rng.randint(0, 1)))
    cohort = pd.DataFrame(
        stays, columns=["subject_id", "hadm_id", "stay_id", "intime", "outtime", "label"]
    )

    diag_rows = []
    for s, h, *_ in stays:
        for seq in range(1, rng.randint(2, 5)):
            v = rng.choice([9, 9, 10])
            code = rng.choice(ICD9_POOL if v == 9 else ICD10_POOL)
            diag_rows.append((s, h, seq, code, v))
    # a few rows outside the cohort — the inner join must drop them
    diag_rows += [(99, 9999, 1, "42822", 9), (98, 9998, 1, "I251", 10)]
    diag = pd.DataFrame(
        diag_rows, columns=["subject_id", "hadm_id", "seq_num", "icd_code", "icd_version"]
    )

    chart_rows = []
    for s, h, st, intime, _o, _l in stays:
        for item, uoms in CHART_ITEMS.items():
            n = rng.randint(3, 12)
            for k in range(n):
                # unique hour per (stay, item, k): no same-hour collapse
                t = intime + dt.timedelta(hours=k * 2, minutes=rng.randint(0, 59))
                uom = uoms[0][0] if len(uoms) == 1 else (
                    uoms[0][0] if rng.random() < uoms[0][1] else uoms[1][0]
                )
                val = (
                    0.0 if rng.random() < 0.08
                    else round(rng.uniform(30, 200), 1)
                )
                chart_rows.append((st, t, item, val, uom))
    # null valuenum and an exact duplicate: both dropped/collapsed
    chart_rows.append((stays[0][2], stays[0][3], 220045, None, "bpm"))
    chart_rows.append(chart_rows[0])
    chart = pd.DataFrame(
        chart_rows, columns=["stay_id", "charttime", "itemid", "valuenum", "valueuom"]
    )

    out_rows = []
    for s, h, st, intime, _o, _l in stays:
        for k in range(rng.randint(1, 5)):
            t = intime + dt.timedelta(hours=3 * k, minutes=rng.randint(0, 59))
            out_rows.append((s, h, st, t, rng.choice([226559, 226560])))
    out_rows.append(out_rows[0])  # duplicate collapses on both sides
    out_ev = pd.DataFrame(
        out_rows, columns=["subject_id", "hadm_id", "stay_id", "charttime", "itemid"]
    )

    proc_rows = []
    for s, h, st, intime, _o, _l in stays:
        for k in range(rng.randint(0, 3)):
            t = intime + dt.timedelta(hours=5 * k + 1, minutes=rng.randint(0, 59))
            proc_rows.append((st, t, rng.choice([225441, 225792])))
    proc = pd.DataFrame(proc_rows, columns=["stay_id", "starttime", "itemid"])

    med_rows = []
    order = 9000
    for s, h, st, intime, _o, _l in stays:
        for k in range(rng.randint(1, 4)):
            order += 1
            start = intime + dt.timedelta(hours=k, minutes=rng.randint(0, 59))
            end = start + dt.timedelta(hours=rng.randint(1, 20))
            rate = None if rng.random() < 0.1 else round(rng.uniform(0.5, 5), 2)
            amount = 0.0 if rng.random() < 0.15 else round(rng.uniform(1, 50), 1)
            med_rows.append(
                (s, st, rng.choice([221906, 222168]), start, end, rate, amount, order)
            )
    med = pd.DataFrame(
        med_rows,
        columns=["subject_id", "stay_id", "itemid", "starttime", "endtime",
                 "rate", "amount", "orderid"],
    )
    return cohort, diag, chart, out_ev, proc, med


def write_mimic_drop(cohort, diag, chart, out_ev, proc, med):
    """Serialize the fixture as the reference's csv.gz directory layout
    (the Spark chain reads it via load_mimic_table)."""
    root = tempfile.mkdtemp(prefix="mimic-feat-diff-")
    v = "1.0"

    def gz(path, df):
        full = os.path.join(root, v, path)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with gzip.open(full, "wt") as f:
            df.to_csv(f, index=False, date_format="%Y-%m-%d %H:%M:%S")

    gz("hosp/diagnoses_icd.csv.gz", diag)
    gz("icu/chartevents.csv.gz", chart)
    gz("icu/outputevents.csv.gz", out_ev)
    gz("icu/procedureevents.csv.gz", proc)
    gz("icu/inputevents.csv.gz", med)
    map_path = os.path.join(root, "icd_map.tsv")
    with open(map_path, "w") as f:
        f.write("diagnosis_type\tdiagnosis_code\tdiagnosis_description\ticd9cm\ticd10cm\tflags\n")
        for code, icd10 in ICD_MAP_ROWS:
            f.write(f"ICD9\t{code}\tDESC {code}\t{code}\t{icd10}\t1\n")
    return root, v, map_path


# ---------------------------------------------------------------------------
# Reference transliteration (pandas, loops and all)
# ---------------------------------------------------------------------------


def ref_icd_9to10(code, mapping):
    """icu_preprocess_util.py:373-380 with root=True: first-match on the
    3-char root."""
    rows = mapping.loc[mapping["diagnosis_code"] == code[:3]]
    return rows["icd10cm"].iloc[0] if len(rows) else np.nan


def ref_preproc_icd(diag, cohort, mapping):
    """preproc_icd_module (:341-430): cohort join + per-ICD9-code-group
    conversion loop + root extraction."""
    module = diag.merge(cohort[["hadm_id", "stay_id", "label"]], on="hadm_id", how="inner")
    module = module.copy()
    module["root_icd10_convert"] = module["icd_code"].values
    for code, group in module.loc[module.icd_version == 9].groupby(by="icd_code"):
        new_code = ref_icd_9to10(code, mapping)
        for idx in group.index.values:
            module.at[idx, "root_icd10_convert"] = new_code
    module["root"] = module["root_icd10_convert"].apply(
        lambda x: x[:3] if type(x) is str else np.nan  # noqa: E721
    )
    return module[["subject_id", "hadm_id", "stay_id", "icd_code",
                   "root_icd10_convert", "root"]]


def ref_preproc_out(out_ev, cohort):
    """preproc_out (:235-278): dedup, stay join, timedelta, dropna."""
    module = out_ev.drop_duplicates()
    df = module.merge(cohort[["stay_id", "intime", "outtime"]], on="stay_id", how="inner")
    df = df.copy()
    df["event_time_from_admit"] = df["charttime"] - df["intime"]
    return df.dropna()


def ref_preproc_chart(chart, cohort):
    """preproc_chart (:280-338) + drop_wrong_uom(0.95): valuenum dropna,
    stay join, timedelta, full dropna, dedup, then the per-itemid uom
    vote loop with in-place drops."""
    df = chart.dropna(subset=["valuenum"])
    df = df.merge(cohort[["stay_id", "intime"]], on="stay_id", how="inner")
    df = df.copy()
    df["event_time_from_admit"] = df["charttime"] - df["intime"]
    del df["charttime"]
    del df["intime"]
    df = df.dropna().drop_duplicates().reset_index(drop=True)
    # uom_conversion.drop_wrong_uom (:9-26)
    for _item, uom in df.groupby(["itemid"])["valueuom"]:
        vc = uom.value_counts()
        if vc.size > 1:
            most_frequent = vc.index[0]
            if vc.iloc[0] / len(uom) > 0.95:
                df = df.drop(uom[uom != most_frequent].index, axis=0)
    return df.reset_index(drop=True)


def ref_preproc_proc(proc, cohort):
    """preproc_proc (:190-233)."""
    module = proc.drop_duplicates()
    df = module.merge(
        cohort[["subject_id", "hadm_id", "stay_id", "intime", "outtime"]],
        on="stay_id", how="inner",
    )
    df = df.copy()
    df["event_time_from_admit"] = df["starttime"] - df["intime"]
    return df.dropna()


def ref_preproc_meds(med, cohort):
    """preproc_meds (:155-187)."""
    df = med.merge(cohort[["hadm_id", "stay_id", "intime"]], on="stay_id", how="inner")
    df = df.copy()
    df["start_hours_from_admit"] = df["starttime"] - df["intime"]
    df["stop_hours_from_admit"] = df["endtime"] - df["intime"]
    return df.dropna()


def ref_group_diag(diag, mode):
    """preprocess_features_icu diag branch (:242-255)."""
    diag = diag.copy()
    if mode == "both":
        diag["new_icd_code"] = diag["icd_code"]
    if mode == "convert":
        diag["new_icd_code"] = diag["root_icd10_convert"]
    if mode == "convert_group":
        diag["new_icd_code"] = diag["root"]
    return diag[["subject_id", "hadm_id", "stay_id", "new_icd_code"]].dropna()


def ref_outlier(chart, cut_off, left_thresh, impute):
    """outlier_removal.outlier_imputation: per-itemid np.percentile clamp
    (impute) or NaN-and-drop."""
    chart = chart.copy()
    for _item, values in chart.groupby(["itemid"])["valuenum"]:
        arr = values.to_numpy(dtype=float)
        lo = np.percentile(arr, left_thresh)
        hi = np.percentile(arr, cut_off)
        if impute:
            arr[arr < lo] = lo
            arr[arr > hi] = hi
        else:
            arr[arr < lo] = np.nan
            arr[arr > hi] = np.nan
        chart.loc[values.index, "valuenum"] = arr
    return chart.dropna(subset=["valuenum"])


def ref_summary(df, code_col, missing_col=None):
    """generate_summary_icu per-modality chain (:328-391): stay×code size
    → per-code mean, right-merged onto totals (+missing), fillna(0)."""
    freq = df.groupby(["stay_id", code_col]).size().reset_index(name="mean_frequency")
    freq = freq.groupby([code_col])["mean_frequency"].mean().reset_index()
    total = df.groupby(code_col).size().reset_index(name="total_count")
    if missing_col is None:
        summary = pd.merge(freq, total, on=code_col, how="right")
    else:
        missing = (
            df[df[missing_col] == 0].groupby(code_col).size().reset_index(name="missing_count")
        )
        summary = pd.merge(missing, total, on=code_col, how="right")
        summary = pd.merge(freq, summary, on=code_col, how="right")
    return summary.fillna(0)


# ---------------------------------------------------------------------------
# The differential
# ---------------------------------------------------------------------------


def summary_dict(rows, code_col, with_missing):
    out = {}
    for r in rows:
        key = r[code_col]
        vals = (round(float(r["mean_frequency"]), 9), int(r["total_count"]))
        if with_missing:
            vals = vals + (int(r["missing_count"]),)
        out[key] = vals
    return out


@pytest.mark.parametrize(
    "seed,group_mode,impute",
    [(11, "both", False), (12, "convert", True), (13, "convert_group", False)],
)
def test_ep2_chain_matches_reference_transliteration(spark, seed, group_mode, impute):
    cohort_pd, diag_pd, chart_pd, out_pd, proc_pd, med_pd = make_fixture(seed)
    root, v, map_path = write_mimic_drop(cohort_pd, diag_pd, chart_pd, out_pd, proc_pd, med_pd)

    cohort_sp = spark.createDataFrame(cohort_pd)

    # --- Spark chain (the API under test) ---
    raw = api.feature_icu(spark, root, v, cohort_sp, icd_map_path=map_path, persist=False)
    feats = api.preprocess_features_icu(
        raw, group_diag=group_mode, clean_chart=True,
        impute_outlier_chart=impute, thresh=95, left_thresh=5,
    )
    summaries = api.generate_summary_icu(feats)

    # --- reference transliteration ---
    mapping = pd.DataFrame(ICD_MAP_ROWS, columns=["diagnosis_code", "icd10cm"])
    r_diag = ref_preproc_icd(diag_pd, cohort_pd, mapping)
    r_out = ref_preproc_out(out_pd, cohort_pd)
    r_chart = ref_preproc_chart(chart_pd, cohort_pd)
    r_proc = ref_preproc_proc(proc_pd, cohort_pd)
    r_med = ref_preproc_meds(med_pd, cohort_pd)
    r_diag_g = ref_group_diag(r_diag, group_mode)
    r_chart_c = ref_outlier(r_chart, 95, 5, impute)

    # extraction-stage row counts (composition up to the cleaning stage)
    assert raw["out"].count() == len(r_out)
    assert raw["proc"].count() == len(r_proc)
    assert raw["med"].count() == len(r_med)
    assert raw["diag"].count() == len(r_diag)
    assert feats["diag"].count() == len(r_diag_g)
    assert feats["chart"].count() == len(r_chart_c)

    # summaries: the chain's terminal aggregate per modality
    got_diag = summary_dict(
        [r.asDict() for r in summaries["diag"].collect()], "new_icd_code", False
    )
    want_diag = summary_dict(
        ref_summary(r_diag_g, "new_icd_code").to_dict("records"), "new_icd_code", False
    )
    assert got_diag == want_diag

    for mod, ref_df, missing_col in [
        ("out", r_out, None),
        ("proc", r_proc, None),
        ("med", r_med, "amount"),
        ("chart", r_chart_c, "valuenum"),
    ]:
        got = summary_dict(
            [r.asDict() for r in summaries[mod].collect()], "itemid",
            missing_col is not None,
        )
        want = summary_dict(
            ref_summary(ref_df, "itemid", missing_col).to_dict("records"),
            "itemid", missing_col is not None,
        )
        assert got == want, mod

    # selection: the curated-list semi-join (features_selection_icu,
    # reference feature_preproc_icu.py:394-529 — df[df[id].isin(curated)])
    # for ALL FIVE modalities, compared as (stay, id) multisets, not just
    # counts: half the distinct ids per modality, deterministically
    ref_frames = {
        "diag": (r_diag_g, "new_icd_code"),
        "out": (r_out, "itemid"),
        "proc": (r_proc, "itemid"),
        "med": (r_med, "itemid"),
        "chart": (r_chart_c, "itemid"),
    }
    curated_pd = {
        mod: [
            c if col == "new_icd_code" else int(c)
            for c in sorted(df[col].unique())[: max(1, df[col].nunique() // 2)]
        ]
        for mod, (df, col) in ref_frames.items()
    }
    sel_sp = api.features_selection_icu(
        feats,
        {
            mod: spark.createDataFrame(
                [(c,) for c in curated_pd[mod]],
                f"{col}: {'string' if col == 'new_icd_code' else 'long'}",
            )
            for mod, (_, col) in ref_frames.items()
        },
    )
    for mod, (ref_df, col) in ref_frames.items():
        r_sel = ref_df[ref_df[col].isin(curated_pd[mod])]
        got_pairs = sorted(
            (r["stay_id"], r[col]) for r in sel_sp[mod].select("stay_id", col).collect()
        )
        want_pairs = sorted(zip(r_sel["stay_id"], r_sel[col]))
        assert got_pairs == want_pairs, mod

"""MIMIC directory-layout loader tests on a generated csv.gz drop."""

from __future__ import annotations

import gzip
import os
import tempfile

from temporai_mivdp_spark.mivdp.io import load_mimic_tables, to_parquet_lake


def _write_gz(path: str, text: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        f.write(text)


def test_load_mimic_layout_and_lake(spark):
    root = tempfile.mkdtemp(prefix="mimic-")
    v = "1.0"
    _write_gz(
        f"{root}/{v}/core/patients.csv.gz",
        "subject_id,gender,dod,anchor_age,anchor_year,anchor_year_group\n"
        "1,F,,50,2150,2011 - 2013\n"
        "2,M,2150-01-05 12:00:00,70,2150,2014 - 2016\n",
    )
    _write_gz(
        f"{root}/{v}/icu/icustays.csv.gz",
        "subject_id,hadm_id,stay_id,intime,outtime,los\n"
        "1,101,1001,2150-01-01 06:00:00,2150-01-04 06:00:00,3.0\n",
    )
    t = load_mimic_tables(spark, root, v, names=["patients", "icustays"])
    pts = {r.subject_id: r for r in t["patients"].collect()}
    assert pts[1].dod is None and pts[2].dod is not None
    assert pts[2].anchor_age == 70
    stays = t["icustays"].collect()
    assert stays[0].los == 3.0 and stays[0].intime.hour == 6

    lake = tempfile.mkdtemp(prefix="lake-")
    to_parquet_lake(spark, root, v, lake)
    back = spark.read.parquet(f"{lake}/patients")
    assert back.count() == 2
    assert dict(back.dtypes)["dod"] == "timestamp"

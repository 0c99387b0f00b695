"""Scale evidence for the model-based quality tier (SCALING.md).

Two claims carry the 100 TB argument for ``llmdata/quality_model.py``:

1. **Scoring is a projection.** ``quality_model_score`` inlines the
   pretrained weights as plan literals over one codegen'd feature
   projection — zero shuffle, zero Python — so its wall time must track
   the scan near-linearly across a data decade (sf0.01 → sf0.1).

2. **Fit cost = one aggregation scan per iteration.** ``logreg_fit``'s
   per-iteration work is a single map-side-combined gradient agg with a
   (dim+1)-float driver pull, so per-iteration wall time must also
   track the scan — and the docstring's persist-or-sample guidance
   (quality_model.py) needs NUMBERS: fitting on an unpersisted frame
   rescans (and re-projects features over) the corpus every iteration;
   persisting the dim+1 narrow columns makes iterations cheap.

Usage: python tools/scale_quality_model.py [n_iter]
Prints markdown table rows for SCALING.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from temporai_mivdp_spark.llmdata import quality_model as qm  # noqa: E402
from temporai_mivdp_spark.session import get_session  # noqa: E402
from temporai_mivdp_spark.sources import load_table  # noqa: E402

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _score_wall(spark, sf_dir: str) -> float:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    df = qm.quality_model_score(docs)
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _labeled_feats(spark, sf_dir: str):
    """Features + a deterministic label (long docs = positive) — the
    fit-input shape a curation run would build from weak supervision."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feats = qm.quality_feature_vector(docs)
    return feats.withColumn(
        "label", (F.col("len_feat") > 0.1).cast("int")
    )


def _fit_wall(spark, sf_dir: str, n_iter: int, persist: bool) -> float:
    feats = _labeled_feats(spark, sf_dir)
    if persist:
        feats = feats.persist()
        feats.count()  # materialize outside the timed region
    t0 = time.perf_counter()
    qm.logreg_fit(feats, "label", n_iter=n_iter)
    wall = time.perf_counter() - t0
    if persist:
        feats.unpersist()
    return wall


def main() -> None:
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_session(
        app_name="mivdp-scale-quality",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for sf_dir in SFS:
        sf = sf_dir.rsplit("sf", 1)[-1]
        score = _score_wall(spark, sf_dir)
        fit_cold = _fit_wall(spark, sf_dir, n_iter, persist=False)
        fit_hot = _fit_wall(spark, sf_dir, n_iter, persist=True)
        rows.append((sf, score, fit_cold / n_iter, fit_hot / n_iter))

    print("| sf | score wall s | fit s/iter (unpersisted) | fit s/iter (persisted) |")
    print("|---|---|---|---|")
    for sf, score, cold, hot in rows:
        print(f"| {sf} | {score:.3f} | {cold:.3f} | {hot:.3f} |")
    (sf0, s0, c0, h0), (sf1, s1, c1, h1) = rows
    print(
        f"decade ratios (sf{sf0} -> sf{sf1}): score {s1 / s0:.1f}x, "
        f"fit/iter unpersisted {c1 / c0:.1f}x, persisted {h1 / h0:.1f}x, "
        f"persist speedup at sf{sf1}: {c1 / h1:.1f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()

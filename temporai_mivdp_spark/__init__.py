"""temporai_mivdp_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of vanderschaarlab/temporai-mivdp.

Not a port: every operator of the reference pandas pipeline (see SURVEY.md
for the file:line inventory) is re-expressed as declarative Spark
DataFrame/SQL so Catalyst picks the physical plan — broadcast joins instead
of `isin` loops, window functions instead of per-group Python iteration,
a single `groupBy(floor(t/bucket))` instead of a bucketing loop, and
partitioned Parquet instead of gzipped CSV + pickles.

Package map:
  session     SparkSession factory with scale-tuned confs (AQE, Arrow, ...)
  sources     schema'd readers for Parquet / gzipped CSV / TSV + sinks
  operators   generic DataFrame -> DataFrame relational operators
  functions   scalar expression helpers (floor-hours, clamps, casts)
  mivdp       the clinical pipeline itself (cohort, ICD, features, datagen)
  llmdata     large-scale training-data ops (dedup, similarity, text, media)
  streaming   Structured Streaming variants of the time-series operators
"""

__version__ = "0.1.0"

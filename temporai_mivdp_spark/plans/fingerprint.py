"""Stable physical-plan fingerprints for regression attribution.

A bench number that moves with an UNCHANGED fingerprint is provably
measurement noise; a CHANGED fingerprint names the commit that altered
the plan. ``bench.py`` emits one fingerprint per headline query and the
committed ``PLANS.json`` (tools/explain_all.py) is the reference to diff
against.

The fingerprint hashes the pre-execution physical plan string (for AQE
plans, the initial plan — runtime re-optimization hasn't run yet, so the
string is deterministic for a given query + confs) after normalizing
everything that varies run-to-run without the plan actually changing:

* expression ids (``revenue#123L`` — allocated from a global counter
  that depends on how many plans the session built before this one)
* ``plan_id`` / ``[id=#N]`` node counters
* absolute input paths (``sf0.01`` vs ``sf0.1`` is not a plan change)
* partition/file counts and sizes in scan nodes (data-volume dependent)
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame

from temporai_mivdp_spark.plans.inspect import executed_plan

_NORMALIZERS: list[tuple[re.Pattern[str], str]] = [
    (re.compile(r"#\d+"), "#"),                       # expression ids
    # lambda variable counters (x_1, y_268, ... — allocated from a
    # session-global counter, so they shift with session history)
    (re.compile(r"\b([a-z])_\d+#"), r"\1_#"),
    (re.compile(r"plan_id=\d+"), "plan_id="),         # subquery/node plan ids
    (re.compile(r"\[id=#?\d*\]"), ""),                # codegen/exchange ids
    (re.compile(r"file:[^\s\],)]*"), "<path>"),       # absolute input paths
    (re.compile(r"Location: \S+"), "Location: <path>"),
    (re.compile(r"\d+ paths?"), "<n> paths"),         # scan file counts
    (re.compile(r"Statistics\([^)]*\)"), ""),         # size estimates
    (re.compile(r"size=\d+"), "size="),
    (re.compile(r"rowCount=\d+"), "rowCount="),
    # parallelism-dependent counts: shuffle partition numbers inside
    # partitioning specs and scan split counts vary with the session's
    # cpu/partition confs without the plan SHAPE changing
    (re.compile(r"partitioning\((.*?), \d+\)"), r"partitioning(\1)"),
    (re.compile(r"splits=\d+"), "splits="),
    # scan-metadata values (DataFilters etc.) are CHAR-truncated at 100
    # chars BEFORE normalization, so a plan embedding long literals
    # (e.g. dedup_semantic's inlined centroid array) gets cut at a point
    # that shifts with pre-normalization expression-id widths — the one
    # source of run-to-run fingerprint drift observed. Collapse the
    # ENTIRE truncated value, key to first "...": the earlier
    # last-unclosed-bracket collapse kept a prefix whose LENGTH still
    # moved with the cut whenever an inner "]" closed the outer bracket
    # (array literals inside a filter), which is exactly how a wider
    # session expr-id counter can still flip a fingerprint. Untruncated
    # values — every other query — are unchanged.
    # \.{3,}: the cut can land right after a literal's decimal point
    # ("0." + appended "..." = "...."), so consume the WHOLE dot run —
    # a lazy match up to the first three dots leaves a cut-dependent
    # stray "." behind (observed flipping embed_kmeans's fingerprint
    # with session history)
    (re.compile(r"(\b\w+): \[[^\n]*?\.{3,}"), r"\1: [<truncated>"),
    # non-"Key: ["-shaped truncations (bare bracket values)
    (re.compile(r"\[[^\]\n]*\.{3,}"), "[<truncated>"),
]


def normalized_plan(df: DataFrame) -> str:
    """The physical plan string with run-varying counters scrubbed."""
    plan = executed_plan(df)
    for pat, repl in _NORMALIZERS:
        plan = pat.sub(repl, plan)
    return plan


def plan_fingerprint(df: DataFrame) -> str:
    """12-hex-digit stable hash of the normalized physical plan."""
    return hashlib.md5(normalized_plan(df).encode()).hexdigest()[:12]

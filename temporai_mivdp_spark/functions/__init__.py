"""Scalar expression helpers (SURVEY.md §2.8, F1-F14).

Every scalar the reference computes maps to a built-in Catalyst expression
— zero Python UDFs (SURVEY.md §2.10). These helpers exist for readability
at call sites; they all stay inside whole-stage codegen.
"""

from temporai_mivdp_spark.functions.scalars import (
    clamp,
    epoch_micros,
    epoch_seconds,
    floor_days,
    parse_string_list,
    to_number,
)

__all__ = [
    "clamp",
    "epoch_micros",
    "epoch_seconds",
    "floor_days",
    "parse_string_list",
    "to_number",
]

"""Scalar conversion functions (SURVEY.md §2.3, C1–C15).

All functions return JVM-side Column expressions (whole-stage-codegen'd);
no per-row Python anywhere in the hot path.
"""

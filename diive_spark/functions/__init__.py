"""Scalar/domain column functions (SURVEY §2.7): pure Spark SQL
expressions — whole-stage-codegen friendly, no Python in the hot path."""

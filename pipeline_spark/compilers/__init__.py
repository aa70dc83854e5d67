"""Expression compilers: config DSLs → Catalyst Column expressions.

Everything in this package emits pyspark.sql.Column trees (JVM-side,
whole-stage-codegen eligible) — never per-row Python. This is the single
biggest performance rule of the build (see SURVEY.md §4): the reference
interprets filters/expressions row-at-a-time in Java
(reference: util/pipeline/Filter.java:419-466); we let Tungsten compile them.
"""

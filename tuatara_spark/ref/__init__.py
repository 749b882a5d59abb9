"""Pure-NumPy transcription of the reference engine's dataflow stages.

This package is the single kernel shared by BOTH the single-process oracle
(golden-fixture generator, tests) and the Spark Arrow UDFs in
``tuatara_spark.engine`` — sharing one code path is what makes the
byte-identical-per-url invariant structurally safe.

Modules mirror /root/reference/tuatara.cpp stage-for-stage (citations in
each docstring); quirks Q1-Q7 from SURVEY.md §2.1 are preserved.
"""

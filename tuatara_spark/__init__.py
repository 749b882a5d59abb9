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

__version__ = "0.1.0"

"""spark-graft engine: a PySpark-native analytics engine.

Capabilities spec: SURVEY.md §2 (the reference repo at /root/reference is an
empty directory — see SURVEY.md §0 — so the survey's operator inventory is the
binding spec; no reference file:line citations are possible).

Design: everything is DataFrame/SQL so Catalyst + AQE optimize it (predicate
pushdown, column pruning, broadcast conversion, partial aggregation, skew
handling). Python UDFs appear only in the §2.K UDF-surface operators and the
vectorized similarity fast path; every other operator stays JVM-side.

Use ``engine.registry.collect()`` to get the populated QUERIES/ORACLES maps.
"""

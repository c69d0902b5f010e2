"""Declarative query plans (the engine's query surface).

Each module registers named queries with
:mod:`spotify_app_etl_spark.registry`; the driver contract
(``__spark_entry__``) exposes them. Plans are pure DataFrame/SQL —
Catalyst does pushdown, pruning, join selection and partial aggregation.
"""

"""PySpark-native analytics engine with the capabilities of the reference
CarbonData-2.3-for-CDH Spark integration (liutaobigdata/cdh_integrate_carbondata2.3).

Everything is built Spark-first on the public PySpark API:

- ``catalog``   — segment-based table management (manifest = tablestatus JSON),
                  the Spark-side analogue of the reference's segment model
                  (reference: core/.../statusmanager, SURVEY.md §1.1).
- ``plans``     — driver-side pruning (file min/max skipping, metadata
                  count(*)), the analogue of blocklet-index pruning
                  (reference: hadoop/.../CarbonInputFormat.java:540-681).
- ``operators`` — DML (copy-on-write UPDATE/DELETE/MERGE), compaction,
                  dedup / similarity / text-analysis pipeline operators.
- ``mv``        — materialized views with query rewrite + timeseries rollup
                  (reference: mv/plan, integration/spark/.../view/).
- ``streaming`` — CREATE/DROP/SHOW STREAM registry over Structured Streaming
                  (reference: .../command/stream/CarbonCreateStreamCommand.scala).
- ``functions`` — engine UDFs/helpers (geo, timeseries, text) kept JVM-side
                  where possible.
- ``queries``   — the query surface exercised by the driver's correctness
                  gate (one entry per operator, with a DuckDB oracle).
"""

__version__ = "0.1.0"

"""gomapreduce_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MapReduce library
(tgarv/gomapreduce), re-expressed Spark-first.

Layout:
  session      — SparkSession factory tuned for local[N] and 100 TB posture
  sources      — table registry / readers for the driver testdata
  functions    — portable column helpers (cross-engine md5 hash, vector math)
  operators    — DataFrame-native analytics operators (the SURVEY §2 inventory)
  mapreduce    — API-fidelity facade mirroring the reference's four interfaces
                 (Mapper / Reducer / Inputer / Outputer; reference
                 mapper.go:13-20, reducer.go:13-15, inputer.go:11-14,
                 outputer.go:11-13)
  streaming    — Structured Streaming variants of the event-time operators
  queries      — the named query inventory + DuckDB oracle SQL
"""

__version__ = "0.1.0"

"""PySpark-native analytics engine with the capability envelope of
mishra14/Java-MapReduce-framework (see SURVEY.md).

The reference is a servlet-based two-phase MapReduce framework
(map -> hash-shuffle -> external-sort -> grouped-reduce over
``key\\tvalue`` text records; reference entry points at
``src/edu/upenn/cis455/mapreduce/Job.java:19,31``). This package
re-expresses that capability envelope Spark-first:

- ``session``   -- SparkSession builder tuned for the target shape.
- ``sources``   -- parquet/text table loaders (the reference's
  directory-scan source, ``worker/WorkerServlet.java:510-530``).
- ``operators`` -- declared relational / temporal / text / dedup /
  similarity / multimodal operators (SURVEY.md section 2B).
- ``plans``     -- the query registry consumed by ``__spark_entry__``
  and the ``Job(map, reduce)`` API analog + FIFO job queue
  (``master/MasterServlet.java`` semantics).
- ``streaming`` -- Structured Streaming variants of the flagship ops.
"""

__version__ = "0.1.0"

"""SparkSession factory with the physical tuning the north rule requires.

The reference tunes thread counts by hand (``main.py:61-65``, OMP/MKL env
at ``src/core.py:25-41``); here the equivalents are AQE + skew-join +
shuffle-partition + Arrow-batch settings, applied once at session build so
every operator inherits them.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "docling-translate-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or fetch) a tuned session.

    * AQE on, with coalescing and skew-join splitting — the in-engine
      answer to long-transcript key skew.
    * Arrow enabled with a bounded batch size: the Arrow batch is this
      engine's analog of the reference's 16-sentence inference chunk
      (``src/translation/engines/nllb.py:103-126``), sized much larger
      because the map is vectorized.
    * shuffle partitions default to 4× cores locally; on a real cluster
      pass an explicit value sized so partitions fit executor memory.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            n = 32
        shuffle_partitions = max(4 * n, 32)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

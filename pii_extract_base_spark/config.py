"""SparkSession factory with the engine's scale defaults.

Settings chosen for the 100 TB design point (SURVEY.md §4):
 - AQE on (runtime re-plan, skew-join splitting, partition coalescing)
 - Arrow on for pandas UDFs, with a bounded records-per-batch so long
   web pages can't blow executor memory (batch size is additionally
   bytes-capped inside the detect stage)
 - shuffle partition count is a knob; at cluster scale set it to
   ~2-3× total cores via spark-submit conf.
"""

import os

from pyspark.sql import SparkSession

ARROW_MAX_RECORDS_PER_BATCH = 2048  # web pages ~KBs; caps Arrow batch memory


def get_spark(app_name: str = "pii-extract-base-spark",
              cores: int = None,
              shuffle_partitions: int = None,
              extra_conf: dict = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(2 * cores, 32)

    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_MAX_RECORDS_PER_BATCH))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

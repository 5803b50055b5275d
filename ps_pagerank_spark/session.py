"""SparkSession factory with engine defaults.

Local-mode testing uses ``local[N]`` (single JVM); the same configuration
carries to ``spark-submit --py-files`` cluster runs — nothing here is
local-only except the master default.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

# Tuned for the sandbox (32 cores, 128 GiB). On a real cluster these are
# overridden by spark-submit conf; shuffle partitions should track
# 2-3x total executor cores, and AQE coalescing corrects overshoot.
_DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
}


def get_spark(
    master: str | None = None,
    app_name: str = "ps_pagerank_spark",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to Python workers (the local-mode equivalent of
    ``spark-submit --py-files engine.zip``). Without it, pandas-UDF closures
    that reference engine modules fail to unpickle on workers unless the
    driver happens to run from the repo root."""
    pkg_dir = Path(__file__).resolve().parent
    zpath = Path(tempfile.gettempdir()) / "ps_pagerank_spark_pyfiles.zip"
    if not zpath.exists():
        tmp = zpath.with_suffix(".tmp.zip")
        with zipfile.ZipFile(tmp, "w") as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, f"ps_pagerank_spark/{py.relative_to(pkg_dir)}")
        os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(str(zpath))

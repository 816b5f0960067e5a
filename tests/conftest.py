import json
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GOLDEN = REPO / "tests" / "golden"


@pytest.fixture(scope="session")
def golden_turns():
    recs = []
    with open(GOLDEN / "golden_turns.jsonl") as fh:
        for line in fh:
            recs.append(json.loads(line))
    return recs


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession for the Spark-layer tests (SURVEY.md §5.2)."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("ocr-engine-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()

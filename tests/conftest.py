import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_addoption(parser):
    parser.addoption(
        "--run-iceberg", action="store_true", default=False,
        help="run the Iceberg-backend parity gate (needs "
             "iceberg-spark-runtime jar + catalog confs — see "
             "webcrawl_spark/sources/iceberg_io.py)")


@pytest.fixture(scope="session")
def spark():
    from webcrawl_spark.session import get_spark

    spark = get_spark(
        "webcrawl-spark-tests",
        master="local[4]",
        extra_confs={"spark.sql.shuffle.partitions": "8"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def small_site():
    from webcrawl_spark.datagen import build_site

    return build_site(seed=42, n_hosts=4, pages_per_host=24, n_hot_hosts=1,
                      hot_factor=3)


@pytest.fixture(scope="session")
def pages_df(spark, small_site):
    from webcrawl_spark.datagen import pages_rows

    rows = list(pages_rows(small_site))
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).cache()

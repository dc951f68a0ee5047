import pytest

from polars_iptools_spark.session import get_spark

MAXMIND_TEST_DIR = "/root/reference/tests/maxmind"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def collect_col(df, col="result"):
    return [r[col] for r in df.select(col).collect()]

import pytest

from spark_alchemy_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        "spark-alchemy-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "6g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s

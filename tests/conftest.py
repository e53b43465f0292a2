import pytest

import fsst_spark  # noqa: F401  (malloc tuning before JVM fork)


@pytest.fixture(scope="session")
def spark():
    from fsst_spark.jobs.session import get_spark

    s = get_spark("local[4]", app_name="fsst_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()

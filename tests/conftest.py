import pytest

from docling_translate_spark.plans.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="dts-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()

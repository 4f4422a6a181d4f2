import pytest


@pytest.fixture(scope="session")
def spark():
    from coastsat_spark.session import get_spark

    s = get_spark(
        app_name="coastsat_spark_tests",
        cpus=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()

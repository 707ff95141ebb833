import pytest

from scientific_papers_ocr_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="tests",
        cores=4,
        shuffle_partitions=4,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "256"},
    )
    yield s
    s.stop()

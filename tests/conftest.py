import pytest

from logshipper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="logshipper_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts(spark):
    from logshipper_spark.sources.transcripts import generate_transcripts

    return generate_transcripts(spark, n_convs=300, seed=42).cache()

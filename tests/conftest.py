import pytest


@pytest.fixture(scope="session")
def spark():
    from rdfa_streaming_parser_js_spark.session import get_spark
    spark = get_spark("tests", parallelism=4, shuffle_partitions=8)
    yield spark
    spark.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

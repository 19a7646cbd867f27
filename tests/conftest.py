import os

import pytest

from temporal_vector_database_spark.session import get_spark
from temporal_vector_database_spark.sources.fixtures import ensure_fixtures

SF_DIR = os.environ.get("TVDB_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tvdb-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def fix_dir():
    return ensure_fixtures(SF_DIR)


@pytest.fixture(scope="session")
def versions(spark, fix_dir):
    return spark.read.parquet(os.path.join(fix_dir, "versions.parquet"))


@pytest.fixture(scope="session")
def versions_raw(spark, fix_dir):
    return spark.read.parquet(os.path.join(fix_dir, "versions_raw.parquet"))


@pytest.fixture(scope="session")
def queries_vec(spark, fix_dir):
    return spark.read.parquet(os.path.join(fix_dir, "queries_vec.parquet"))


@pytest.fixture(scope="session")
def asof_probes(spark, fix_dir):
    return spark.read.parquet(os.path.join(fix_dir, "asof_probes.parquet"))

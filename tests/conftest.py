import pytest

from oracle_cassandra_migrator_spark._vendor import ensure_protobuf
from oracle_cassandra_migrator_spark.session import build_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"

# Before any SparkSession exists: the vendored google.protobuf (state-v2
# streaming dependency) must land on PYTHONPATH so the JVM-spawned
# Python workers inherit it.
HAVE_PROTOBUF = ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="ocm-spark-tests",
        master="local[16]",
        conf={"spark.sql.shuffle.partitions": "16",
              "spark.sql.warehouse.dir": "/tmp/ocm-test-warehouse"},
    )
    yield session
    session.stop()

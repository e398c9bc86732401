from oracle_cassandra_migrator_spark.sources.readers import read_source
from oracle_cassandra_migrator_spark.sources.pydatasource import (
    register_python_sources,
)

__all__ = ["read_source", "register_python_sources"]

from oracle_cassandra_migrator_spark.reliability.retry import retry
from oracle_cassandra_migrator_spark.reliability.state import (
    LocalFSStateStore,
    StateStore,
)

__all__ = ["retry", "StateStore", "LocalFSStateStore"]

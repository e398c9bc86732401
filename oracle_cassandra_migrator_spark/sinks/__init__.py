from oracle_cassandra_migrator_spark.sinks.writers import write_sink

__all__ = ["write_sink"]

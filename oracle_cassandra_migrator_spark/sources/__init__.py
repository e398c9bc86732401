from oracle_cassandra_migrator_spark.sources.readers import read_source

__all__ = ["read_source"]

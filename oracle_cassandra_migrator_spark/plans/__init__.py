from oracle_cassandra_migrator_spark.plans.compiler import compile_pipeline, compile_transform

__all__ = ["compile_pipeline", "compile_transform"]

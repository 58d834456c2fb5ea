from .portable import duck_hash64, spark_hash64  # noqa: F401

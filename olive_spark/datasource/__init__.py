from olive_spark.datasource.olive_datasource import (  # noqa: F401
    OliveDataSource,
    register_olive,
)

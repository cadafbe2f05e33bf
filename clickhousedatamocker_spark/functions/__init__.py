from clickhousedatamocker_spark.functions.scalar import (
    format_readable_size,
    register_sql_functions,
    to_yyyymmddhh,
)

__all__ = ["format_readable_size", "to_yyyymmddhh", "register_sql_functions"]

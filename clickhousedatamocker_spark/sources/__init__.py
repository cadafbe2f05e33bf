from clickhousedatamocker_spark.sources.generator import BatchGenerator
from clickhousedatamocker_spark.sources.tables import load_table, register_views

__all__ = ["BatchGenerator", "load_table", "register_views"]

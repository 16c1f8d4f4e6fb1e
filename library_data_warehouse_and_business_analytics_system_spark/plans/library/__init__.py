from .etl import initial_load, build_dim_date
from .reports import query1, query2, query3

__all__ = ["initial_load", "build_dim_date", "query1", "query2", "query3"]

from .etl import initial_load, build_dim_date
from .reports import (query1, query1_subtotals, query2, query2_subtotals,
                      query3, query3_subtotals)

__all__ = ["initial_load", "build_dim_date", "query1", "query2", "query3",
           "query1_subtotals", "query2_subtotals", "query3_subtotals"]

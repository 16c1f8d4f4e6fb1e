"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference library data-warehouse system
(Qy248/Library-Data-Warehouse-and-Business-Analytics-System).

Everything here is idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, broadcast joins for small dimensions, window functions for
ranking/LAG, and Pandas UDFs only where built-ins cannot express the
semantics. See SURVEY.md for the operator inventory this covers.
"""

__version__ = "0.1.0"

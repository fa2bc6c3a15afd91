"""sclera_spark — a PySpark-native analytics engine with the query surface
of scleradb/sclera, rebuilt Spark-first (DataFrame/SQL/Catalyst/Structured
Streaming). See SURVEY.md for the blueprint and reference file citations.
"""

from sclera_spark.session import build_session
from sclera_spark.catalog import Catalog, load_tables

__version__ = "0.1.0"

__all__ = ["build_session", "Catalog", "load_tables", "__version__"]

from temporal_vector_database_spark.sources.tables import DRIVER_TABLES, load_table
from temporal_vector_database_spark.sources.fixtures import ensure_fixtures, fixture_dir

__all__ = ["DRIVER_TABLES", "load_table", "ensure_fixtures", "fixture_dir"]

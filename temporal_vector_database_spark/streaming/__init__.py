from temporal_vector_database_spark.streaming.ingest import (  # noqa: F401
    read_version_stream,
    run_ingest_stream,
    stream_encode_versions,
)

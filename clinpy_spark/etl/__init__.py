from clinpy_spark.etl.ingest import (  # noqa: F401
    create_project,
    ingest_expression,
    ingest_junctions,
    ingest_variants,
    load_samples,
)

"""clinpy-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of the clinpy reference library
(reference: /root/reference/clinpy — SQLite+pandas; re-expressed here
as lazy DataFrame plans over a directory-of-Parquet data model).

Layout
------
- ``session``    SparkSession factory tuned for OLAP (AQE, UTC, Arrow).
- ``schema``     YAML type vocabulary -> StructType (reference
                 utils.py:28-53 analogue) + static table schemas.
- ``functions``  column-expression library: interval math, hash ids,
                 text stats, vector math. Pure built-in-function
                 compositions (JVM-side, codegen-friendly) unless noted.
- ``operators``  composed dataframe->dataframe operators: dedup
                 (exact/minhash/simhash), similarity search, event-time
                 windows, interval joins.
- ``sources``    readers for RSEM / STAR SJ / VCF shaped inputs and the
                 Parquet project catalog.
- ``assays``     the user-facing lazy query API mirroring the reference
                 (Project / Expression / Junctions / Variants).
- ``etl``        create-project ingest pipeline (reference
                 create_project.py analogue).
- ``streaming``  Structured Streaming variants of the event-time ops.
"""

__version__ = "0.1.0"

from clinpy_spark.session import get_spark  # noqa: F401

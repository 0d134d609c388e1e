from clinpy_spark.functions.ids import hash_id, junction_id, variant_id  # noqa: F401
from clinpy_spark.functions.intervals import (  # noqa: F401
    interval_overlaps,
    overlap_fraction,
    overlap_len,
    point_in_interval,
)
from clinpy_spark.functions.time import epoch_seconds  # noqa: F401
from clinpy_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401

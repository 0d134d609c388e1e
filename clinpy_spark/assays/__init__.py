from clinpy_spark.assays.base import Assay  # noqa: F401
from clinpy_spark.assays.project import Project  # noqa: F401
from clinpy_spark.assays.expression import Expression  # noqa: F401
from clinpy_spark.assays.junctions import Junction, Junctions  # noqa: F401
from clinpy_spark.assays.variants import Variant, Variants  # noqa: F401

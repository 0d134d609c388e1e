from clinpy_spark.sources.rsem import read_rsem_genes, read_rsem_isoforms  # noqa: F401
from clinpy_spark.sources.star_sj import read_star_sj  # noqa: F401
from clinpy_spark.sources.vcf import read_vcf, vcf_csq_fields, vcf_format_keys  # noqa: F401

"""Schemas: the YAML type vocabulary and the static clinpy table shapes.

Mirrors the reference's dynamic DDL (``str_to_type`` + ``dict_to_table``,
utils.py:28-89) — one shared vocabulary used by BOTH ingest and query so
dynamic schemas can't drift (SURVEY.md §7 hard-point 3). The reference's
SQLAlchemy types map to Spark types per SURVEY.md §1.5.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: The dynamic-DDL type vocabulary (reference utils.py:28-53). ``fk`` is
#: a plain column + documented join key (no engine-enforced constraint).
TYPE_VOCAB: dict[str, DataType] = {
    "str": StringType(),
    "int": LongType(),
    "float": DoubleType(),
    "date": DateType(),
    "bool": BooleanType(),
    "json": MapType(StringType(), StringType()),
    "fk": LongType(),
}


def str_to_type(name: str) -> DataType:
    """YAML type name -> Spark type (reference utils.py:28-53)."""
    try:
        return TYPE_VOCAB[name]
    except KeyError:
        raise ValueError(
            f"unknown type {name!r}; vocabulary is {sorted(TYPE_VOCAB)}"
        ) from None


def struct_from_config(columns: dict[str, dict]) -> StructType:
    """Build a StructType from a config mapping
    ``{colname: {type: str, nullable: bool, ...}}`` (reference
    ``dict_to_table`` utils.py:56-89; index/pk flags become partition /
    sort hints handled at write time, not schema)."""
    fields = []
    for name, spec in columns.items():
        spec = spec or {}
        fields.append(
            StructField(
                name.lower(),
                str_to_type(spec.get("type", "str")),
                bool(spec.get("nullable", True)),
            )
        )
    return StructType(fields)


def _st(*pairs: tuple[str, DataType]) -> StructType:
    return StructType([StructField(n, t) for n, t in pairs])


# Static table schemas (reference rna_tables.py / snp_tables.py; surrogate
# ids are deterministic hashes, see functions.ids).

JUNCTIONS = _st(  # rna_tables.py:6-22 (junctions / all_junctions)
    ("id", LongType()), ("chrom", StringType()), ("start", LongType()),
    ("end", LongType()), ("strand", StringType()),
)

SAMPLE_TO_JUNCTION = _st(  # rna_tables.py:26-39
    ("samplename", StringType()), ("junction", LongType()),
    ("uniq_map", LongType()), ("multi_map", LongType()),
)

GENE_EXPRESSION = _st(  # rna_tables.py:42-48
    ("samplename", StringType()), ("gene", StringType()),
    ("expected_count", DoubleType()), ("tpm", DoubleType()), ("fpkm", DoubleType()),
)

TRANSCRIPT_EXPRESSION = _st(  # rna_tables.py:51-58
    ("samplename", StringType()), ("transcript", StringType()),
    ("expected_count", DoubleType()), ("tpm", DoubleType()),
    ("fpkm", DoubleType()), ("isopct", DoubleType()),
)

VARIANTS = _st(  # snp_tables.py:5-21 / rna_tables.py:61-78
    ("variant_id", LongType()), ("chrom", StringType()), ("pos", LongType()),
    ("id", StringType()), ("ref", StringType()), ("alt", StringType()),
)

#: Raw STAR SJ.out.tab columns (rna_functions.py:31-37; FIXTURES.md §C).
STAR_SJ_RAW = _st(
    ("chrom", StringType()), ("start", LongType()), ("end", LongType()),
    ("strand_code", LongType()), ("motif", LongType()), ("annotated", LongType()),
    ("uniq_map", LongType()), ("multi_map", LongType()), ("max_ohang", LongType()),
)

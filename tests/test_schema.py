"""Schema vocabulary tests (reference utils.py:28-89 semantics)."""

import pytest
from pyspark.sql.types import DoubleType, LongType, MapType, StringType

from clinpy_spark.schema import JUNCTIONS, struct_from_config, str_to_type


def test_vocab_mapping():
    assert isinstance(str_to_type("str"), StringType)
    assert isinstance(str_to_type("int"), LongType)
    assert isinstance(str_to_type("float"), DoubleType)
    assert isinstance(str_to_type("json"), MapType)
    assert isinstance(str_to_type("fk"), LongType)
    with pytest.raises(ValueError, match="unknown type"):
        str_to_type("decimal")


def test_struct_from_config_lowercases_and_defaults():
    st = struct_from_config({
        "Sample_ID": {"type": "int", "nullable": False},
        "cohort": {"type": "str"},
        "user_annot": {"type": "json"},
        "untyped": None,
    })
    names = [f.name for f in st.fields]
    assert names == ["sample_id", "cohort", "user_annot", "untyped"]
    assert not st["sample_id"].nullable
    assert isinstance(st["user_annot"].dataType, MapType)
    assert isinstance(st["untyped"].dataType, StringType)


def test_static_schema_shape():
    assert [f.name for f in JUNCTIONS.fields] == ["id", "chrom", "start", "end", "strand"]


def test_roundtrip_create_dataframe(spark):
    st = struct_from_config({"a": {"type": "int"}, "b": {"type": "str"}})
    df = spark.createDataFrame([(1, "x")], st)
    assert df.schema == st

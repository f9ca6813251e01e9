"""Unit tests for sources/tables.py helpers."""

import pytest

from gdelt_extractor_spark.sources.tables import _parse_byte_string


def test_parse_byte_string_all_spark_forms():
    """VERDICT r4 #6: every byte-string form Spark's JavaUtils
    accepts for size confs must parse (a user-set "128m" raised)."""
    assert _parse_byte_string("134217728b") == 134217728
    assert _parse_byte_string("134217728") == 134217728
    assert _parse_byte_string("128m") == 128 << 20
    assert _parse_byte_string("128mb") == 128 << 20
    assert _parse_byte_string("1g") == 1 << 30
    assert _parse_byte_string("1G") == 1 << 30
    assert _parse_byte_string("512k") == 512 << 10
    assert _parse_byte_string("2t") == 2 << 40
    assert _parse_byte_string(" 64m ") == 64 << 20


def test_parse_byte_string_rejects_garbage():
    for bad in ("12x", "m128", "", "1.5g", "-1g"):
        with pytest.raises(ValueError):
            _parse_byte_string(bad)

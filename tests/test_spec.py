"""spec.normalize: canonicalization rules (pure, no Spark)."""

from __future__ import annotations

import pytest

from ndto_spark.spec import SpecError, is_universal, normalize


def test_camelcase_synonyms():
    s = normalize({"type": "string", "minLength": 2, "maxLength": 5})
    assert s == {"type": "string", "min_length": 2, "max_length": 5}


def test_ref_synonym():
    assert normalize({"$ref": "foo"}) == {"ref": "foo"}


def test_number_becomes_any_of():
    s = normalize({"type": "number", "minimum": 1, "multipleOf": 2})
    assert set(s) == {"any_of"}
    int_s, float_s = s["any_of"]
    assert int_s == {"type": "integer", "minimum": 1, "multiple_of": 2}
    # float multiple_of is dropped (no-op in the reference)
    assert float_s == {"type": "float", "minimum": 1}


def test_bytes_type_name():
    assert normalize({"type": b"object"}) == {"type": "object"}


def test_unknown_type_rejected():
    with pytest.raises(SpecError):
        normalize({"type": "tuple"})


def test_combinators_normalized_recursively():
    s = normalize({"anyOf": [{"type": "string", "minLength": 1}]})
    assert s == {"any_of": [{"type": "string", "min_length": 1}]}


def test_is_universal():
    assert is_universal(True)
    assert is_universal({})
    assert is_universal({"nullable": True})
    assert not is_universal({"type": "string"})
    assert not is_universal(False)

"""Unit tests for the reference hash contract (SURVEY.md §2 O1/O3)."""

import hashlib

import pyarrow as pa

from deduper_ray.functions.hashing import (
    add_hash_columns,
    fingerprint64,
    md5_hex_array,
    sha256_hex_array,
    stringify_columns,
)


def test_separator_and_order():
    # golden sample from reference DeduperTest.kt:427:
    # "3526 HIGH ST, SACRAMENTO, CA, 95838, 59222"
    t = pa.table(
        {
            "street": ["3526 HIGH ST"],
            "city": ["SACRAMENTO"],
            "state": ["CA"],
            "zip": ["95838"],
            "price": ["59222"],
        }
    )
    joined = stringify_columns(t, ("street", "city", "state", "zip", "price"))
    assert joined[0].as_py() == "3526 HIGH ST, SACRAMENTO, CA, 95838, 59222"
    md5 = md5_hex_array(joined)[0].as_py()
    assert (
        md5
        == hashlib.md5(b"3526 HIGH ST, SACRAMENTO, CA, 95838, 59222")
        .hexdigest()
        .upper()
    )


def test_empty_hash_keys_uses_all_columns_in_schema_order():
    # reference Deduper.kt:181-185
    t = pa.table({"a": ["x"], "b": [1], "c": [2.5]})
    assert stringify_columns(t, ())[0].as_py() == "x, 1, 2.5"


def test_null_renders_as_empty_string():
    t = pa.table({"a": ["x", None], "b": [None, "y"]})
    joined = stringify_columns(t, ("a", "b"))
    assert joined.to_pylist() == ["x, ", ", y"]


def test_missing_hash_column_raises():
    t = pa.table({"a": ["x"]})
    try:
        stringify_columns(t, ("a", "nope"))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "nope" in str(e)


def test_int_and_float_stringify():
    t = pa.table({"i": [42], "f": [3.5]})
    assert stringify_columns(t, ("i", "f"))[0].as_py() == "42, 3.5"


def test_sha256_and_fingerprint():
    arr = pa.array(["hello", ""])
    sha = sha256_hex_array(arr)
    assert sha[0].as_py() == hashlib.sha256(b"hello").hexdigest()
    fp = fingerprint64(arr)
    expect = int.from_bytes(hashlib.md5(b"hello").digest()[:8], "big")
    assert fp[0].as_py() == expect


def test_add_hash_columns_batch():
    t = pa.table({"a": ["p", "q"], "b": ["r", "s"]})
    out = add_hash_columns(t, ("a", "b"), sha_col="content_sha256", sha_source="a")
    assert out["row_md5"][0].as_py() == hashlib.md5(b"p, r").hexdigest().upper()
    assert out["content_sha256"][1].as_py() == hashlib.sha256(b"q").hexdigest()

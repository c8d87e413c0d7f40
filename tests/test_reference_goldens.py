"""Literal golden-value conformance against the REFERENCE test suite.

These pin our hash semantics to the exact MD5 constants hardcoded in
/root/reference/src/test/kotlin/DeduperTest.kt — the strongest possible
parity evidence without the reference's (non-redistributable) CSV: the
dupe-group hashes are reconstructed from the dupe_values JSON payloads
the reference test embeds (DeduperTest.kt:46-83), and the sample hash
from the literal sample string (DeduperTest.kt:427-428).
"""

import json

import pyarrow as pa

from deduper_ray.functions.hashing import md5_hex_array, stringify_columns

HASH_KEYS = ("street", "city", "state", "zip", "price")

# (expected hash, reference dupe_values JSON) — DeduperTest.kt:56-79
REFERENCE_GOLDENS = [
    (
        "B23CF69F6FC378E0A9C1AF14F2D2083C",  # sampleHash, DeduperTest.kt:428
        None,  # built from the literal sample string below
    ),
    (
        "3230065898C61AE414BA58E7B7C99C0B",
        '{"zip":"95820","baths":"1","city":"SACRAMENTO",'
        '"sale_date":"Mon May 19 00:00:00 EDT 2008","street":"4734 14TH AVE",'
        '"price":"68000","latitude":"38.539447","state":"CA","beds":"2",'
        '"type":"Residential","sq__ft":"834","longitude":"-121.450858"}',
    ),
    (
        "0A3E9B5F1BDEDF777A313388B815C294",
        '{"zip":"95621","baths":"2","city":"CITRUS HEIGHTS",'
        '"sale_date":"Mon May 19 00:00:00 EDT 2008","street":"8306 CURLEW CT",'
        '"price":"167293","latitude":"38.715781","state":"CA","beds":"4",'
        '"type":"Residential","sq__ft":"1280","longitude":"-121.298519"}',
    ),
    (
        "C4E3F2029871080759FC1C0F878236C3",
        '{"zip":"95648","baths":"0","city":"LINCOLN",'
        '"sale_date":"Mon May 19 00:00:00 EDT 2008",'
        '"street":"7 CRYSTALWOOD CIR","price":"4897","latitude":"38.885962",'
        '"state":"CA","beds":"0","type":"Residential","sq__ft":"0",'
        '"longitude":"-121.289436"}',
    ),
]


def _hash_of_row(row: dict) -> str:
    t = pa.table({k: [row[k]] for k in HASH_KEYS})
    return md5_hex_array(stringify_columns(t, HASH_KEYS))[0].as_py()


def test_sample_hash_literal():
    # DeduperTest.kt:427-428
    t = pa.table(
        {
            "street": ["3526 HIGH ST"],
            "city": ["SACRAMENTO"],
            "state": ["CA"],
            "zip": ["95838"],
            "price": ["59222"],
        }
    )
    joined = stringify_columns(t, HASH_KEYS)
    assert joined[0].as_py() == "3526 HIGH ST, SACRAMENTO, CA, 95838, 59222"
    assert md5_hex_array(joined)[0].as_py() == "B23CF69F6FC378E0A9C1AF14F2D2083C"


def test_dupe_group_hashes_literal():
    # the three dupe-group keys in the reference golden report
    # (DeduperTest.kt:56,64,72) — rebuilt from their embedded JSON rows
    for expected, payload in REFERENCE_GOLDENS[1:]:
        row = json.loads(payload)
        assert _hash_of_row(row) == expected, row["street"]

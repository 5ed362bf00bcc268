"""Bloom/cuckoo sketch invariants (pure numpy, no Spark).

Contract (SURVEY.md §2.4 M1): bloom has ZERO false negatives; cuckoo
supports delete; both round-trip through bytes; correctness never depends
on either (verified at the seen-set level in test_seen.py).
"""

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from web_scraper_spark.sketches import Bloom, Cuckoo


def sha1s(n, tag=""):
    return np.array(
        [hashlib.sha1(f"{tag}{i}".encode()).hexdigest() for i in range(n)], dtype=object
    )


def test_bloom_no_false_negatives():
    b = Bloom.for_capacity(5000, 0.01)
    keys = sha1s(5000)
    b.add_many(keys)
    assert b.contains_many(keys).all()


def test_bloom_fpp_reasonable():
    b = Bloom.for_capacity(5000, 0.01)
    b.add_many(sha1s(5000, "in"))
    fp = b.contains_many(sha1s(20000, "out")).mean()
    assert fp < 0.03  # 1% target, generous bound


def test_bloom_roundtrip_and_merge():
    b1 = Bloom.for_capacity(1000, 0.01)
    b2 = Bloom.for_capacity(1000, 0.01)
    k1, k2 = sha1s(100, "a"), sha1s(100, "b")
    b1.add_many(k1)
    b2.add_many(k2)
    m = Bloom.from_bytes(b1.to_bytes()).merge(b2)
    assert m.contains_many(k1).all() and m.contains_many(k2).all()


def test_bloom_deterministic_bytes():
    b1 = Bloom.for_capacity(1000, 0.01)
    b2 = Bloom.for_capacity(1000, 0.01)
    keys = sha1s(500)
    b1.add_many(keys)
    b2.add_many(keys[::-1].copy())  # insertion order must not matter
    assert b1.to_bytes() == b2.to_bytes()


def test_cuckoo_membership_and_delete():
    c = Cuckoo.for_capacity(4000)
    keys = sha1s(3000)
    assert c.add_many(keys) == 3000
    assert c.contains_many(keys).all()
    gone = keys[:500]
    assert c.delete_many(gone) == 500
    # no false negatives on the survivors
    assert c.contains_many(keys[500:]).all()
    # deleted keys mostly gone (fp collisions allowed, rare)
    assert c.contains_many(gone).mean() < 0.05


def test_cuckoo_roundtrip():
    c = Cuckoo.for_capacity(1000)
    keys = sha1s(800)
    c.add_many(keys)
    c2 = Cuckoo.from_bytes(c.to_bytes())
    assert c2.contains_many(keys).all()
    assert c2.count == c.count


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=200, unique=True))
def test_bloom_property_no_false_negatives(ints):
    keys = np.array([hashlib.sha1(str(i).encode()).hexdigest() for i in ints], dtype=object)
    b = Bloom.for_capacity(len(keys), 0.01)
    b.add_many(keys)
    assert b.contains_many(keys).all()


def test_cuckoo_failed_insert_rolls_back():
    """MAX_KICKS exhaustion must leave the table byte-identical: without
    the kick-chain rollback the final homeless victim — a previously
    ACKNOWLEDGED key — was silently evicted (a false negative, violating
    the no-false-negatives contract)."""
    c = Cuckoo.for_capacity(16)
    inserted, i = [], 0
    while True:
        k = hashlib.sha1(str(i).encode()).hexdigest()
        i += 1
        if c.add_many([k]) == 1:
            inserted.append(k)
        else:
            break
        assert i < 10000, "table never filled"
    before = c.table.copy()
    assert c.contains_many(np.array(inserted, dtype=object)).all()
    # a second failing insert is also a clean no-op
    assert c.add_many([hashlib.sha1(str(i).encode()).hexdigest()]) == 0
    assert (c.table == before).all()

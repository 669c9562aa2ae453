"""Stable hashing — the fix for the reference's nondeterministic hash()
(helicopter_change_importer.py:320, cf. SURVEY.md §7.4)."""

import subprocess
import sys

import numpy as np

from xlsx_to_graphdb_ray.functions.hashing import (
    mix2,
    splitmix64,
    stable_id,
    stable_u64,
)


def test_stable_id_deterministic_across_processes():
    val = stable_id("change record 42", prefix="CHANGE_")
    out = subprocess.run(
        [sys.executable, "-c",
         "from xlsx_to_graphdb_ray.functions.hashing import stable_id;"
         "print(stable_id('change record 42', prefix='CHANGE_'))"],
        capture_output=True, text=True, cwd="/root/repo").stdout.strip()
    assert out == val
    assert val.startswith("CHANGE_") and len(val) == len("CHANGE_") + 12


def test_splitmix_vectorized_matches_scalar():
    xs = np.array([0, 1, 2**63, 12345], dtype=np.uint64)
    vec = splitmix64(xs)
    for i, x in enumerate(xs):
        assert splitmix64(np.array([x], dtype=np.uint64))[0] == vec[i]
    # avalanche: single-bit input change flips ~half the output bits
    a, b = splitmix64(np.array([7, 6], dtype=np.uint64))
    assert 20 < bin(int(a) ^ int(b)).count("1") < 44


def test_mix2_is_order_sensitive():
    a = mix2(np.array([1], dtype=np.uint64), np.array([2], dtype=np.uint64))
    b = mix2(np.array([2], dtype=np.uint64), np.array([1], dtype=np.uint64))
    assert a[0] != b[0]


def test_stable_u64_fnv():
    h = stable_u64(np.array(["abc", "abd", "abc"], dtype=object))
    assert h[0] == h[2] and h[0] != h[1]

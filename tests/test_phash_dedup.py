"""Perceptual-hash image dedup: banded-LSH recall guarantee (pigeonhole),
exact-refine precision, cluster parity with a Python union-find oracle,
and the numeric-id fast path."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from vrtility_spark import datagen, dedup, schema


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.fixture(scope="module")
def aug_pdf(tiny_images_pdf):
    return datagen.with_near_duplicates(tiny_images_pdf)


@pytest.fixture(scope="module")
def aug_df(spark, aug_pdf):
    return schema.images_df(spark, aug_pdf).cache()


def _uf_clusters(ph: dict, max_hamming: int, n_bands: int = 4):
    """Union-find oracle over the SAME candidate set the LSH emits:
    banded agreement first, exact refine second."""
    bits = 64 // n_bands
    mask = (1 << bits) - 1
    pairs = []
    for a, b in itertools.combinations(sorted(ph), 2):
        ha, hb = ph[a] & ((1 << 64) - 1), ph[b] & ((1 << 64) - 1)
        shares = any((ha >> (bits * i)) & mask == (hb >> (bits * i)) & mask
                     for i in range(n_bands))
        if shares and _hamming(ph[a], ph[b]) <= max_hamming:
            pairs.append((a, b))
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            x = parent[x] = parent[parent[x]]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for x in parent:
        comps.setdefault(find(x), []).append(x)
    out = {}
    for members in comps.values():
        rep = min(members)
        for m in members:
            out[m] = (rep, len(members))
    return out, set(pairs)


def test_phash_pairs_recall_and_precision(spark, aug_df, aug_pdf):
    got = {(r.a_id, r.b_id): r.hamming
           for r in dedup.phash_pairs(aug_df, max_hamming=2).collect()}
    ph = dict(zip(aug_pdf.image_id, aug_pdf.phash))
    for (a, b), d in got.items():
        assert a < b
        assert d == _hamming(ph[a], ph[b])  # exact refine
        assert d <= 2
    # pigeonhole: Hamming < n_bands ALWAYS shares a clean band → found
    for a, b in itertools.combinations(sorted(ph), 2):
        if _hamming(ph[a], ph[b]) <= 2:  # < n_bands=4 and <= max_hamming
            assert (a, b) in got


def test_phash_clusters_match_union_find_oracle(spark, aug_df, aug_pdf):
    got = {r.image_id: (r.cluster_rep, r.cluster_size)
           for r in dedup.phash_clusters(aug_df, max_hamming=2).collect()}
    ph = dict(zip(aug_pdf.image_id, aug_pdf.phash))
    want, _ = _uf_clusters(ph, max_hamming=2)
    assert got == want


def test_injected_near_dups_all_caught(spark, aug_df):
    got = {r.image_id: r.cluster_rep
           for r in dedup.phash_clusters(aug_df, max_hamming=2).collect()}
    dup_ids = [i for i in got if i.endswith("_d")]
    assert len(dup_ids) == 20
    for d in dup_ids:
        assert d[:-2] in got
        assert got[d] == got[d[:-2]]  # same cluster as its source


def test_phash_clusters_numeric_id_path(spark, aug_df, aug_pdf):
    """A caller-provided unique numeric id yields the same output as
    the xxhash64 route (output is hash-order independent)."""
    import pyspark.sql.functions as F
    ids = sorted(aug_pdf.image_id)
    nid = {s: i for i, s in enumerate(ids)}
    mapping = spark.createDataFrame(
        [(s, i) for s, i in nid.items()], "image_id string, nid long")
    with_nid = aug_df.join(mapping, "image_id")
    a = {r.image_id: (r.cluster_rep, r.cluster_size)
         for r in dedup.phash_clusters(
             with_nid, numeric_id_col="nid", max_hamming=2).collect()}
    b = {r.image_id: (r.cluster_rep, r.cluster_size)
         for r in dedup.phash_clusters(aug_df, max_hamming=2).collect()}
    assert a == b


def test_phash_pairs_rejects_bad_bands(spark, aug_df):
    with pytest.raises(ValueError, match="divide 64"):
        dedup.phash_pairs(aug_df, n_bands=5)


def test_with_near_duplicates_deterministic(tiny_images_pdf):
    a = datagen.with_near_duplicates(tiny_images_pdf)
    b = datagen.with_near_duplicates(tiny_images_pdf)
    assert list(a.image_id) == list(b.image_id)
    assert list(a.phash) == list(b.phash)
    assert all(bytes(x) == bytes(y) for x, y in zip(a.bytes, b.bytes))
    assert a.image_id.str.endswith("_d").sum() == 20

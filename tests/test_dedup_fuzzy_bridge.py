"""Bridge contract for ext_dedup_fuzzy (the one rows-only driver key).

ext_dedup_fuzzy rides pyspark.ml's MinHashLSH, whose banding internals
(private hash coefficients) have no SQL twin — the driver can only
rows-check it. This suite pins it to the repo's fully-oracled MinHash
implementation (ext/dedup.py:_minhash_stages / minhash_banded_pairs,
driver-hash-green as ext_dedup_minhash_banded) so the key carries a
machine-checked equivalence contract even without a DuckDB oracle:

1. CANDIDATE CONTAINMENT — every pair pyspark.ml returns is also a
   candidate of the oracled twin run at max-recall banding (num_perm=32,
   bands=32, r=1: candidate iff ANY of 32 independent permutations
   collides; miss probability (1-J)^32 <= 8e-4 at the key's J >= 0.2
   threshold). Both pipelines are seeded/deterministic, so on the fixed
   corpora the containment is exact, not statistical.
2. VALUE AGREEMENT — on the intersection, pyspark.ml's verified distance
   equals the twin's exact shingle-set Jaccard (1 - dist == jaccard) up
   to HashingTF feature collisions: at 2^18 features the 500-doc corpus
   shows zero collisions (tolerance 2e-6 = dual 6dp-rounding slack); the
   5000-doc corpus has more shingles per doc and shows isolated
   collisions perturbing the ml-side Jaccard by ~1e-4 (tolerance 5e-4).
3. THRESHOLD — every ml pair respects the key's jaccard_max_distance=0.8
   cut (exact Jaccard >= 0.2).
4. HIGH-SIM RECALL — every twin pair with exact Jaccard >= 0.5 is found
   by ml's 5-table OR-banding (per-pair miss probability (1-J)^5 <= 3.2%
   at J = 0.5; the observed corpus pairs all sit at J >= 0.88 where it
   is <= 2e-5; deterministic under seed=42, so pinned exactly — 28/28 on
   the 500-doc corpus and 256/256 on the 5000-doc corpus at pin time).

Together 1+4 sandwich pyspark.ml's candidate set between the oracled
twin's candidates and its high-similarity verified pairs — the
"candidate-superset equivalence" bridge, checked on every pytest run at
BOTH corpus scales.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

# (corpus dir, value-agreement tolerance) — see docstring point 2
_CORPORA = [
    (SF_SMALL, 2e-6),
    ("/root/testdata/sf0.1", 5e-4),
]


@pytest.fixture(scope="module", params=_CORPORA, ids=["sf0.001", "sf0.1"])
def bridge(request, spark):
    from dbt_pro3_spark.ext import dedup as ded

    sf_dir, tol = request.param
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ml = ded.minhash_lsh_pairs(docs).collect()
    twin = ded.minhash_banded_pairs(docs, num_perm=32, bands=32).collect()
    ml_pairs = {(r.doc_a, r.doc_b): r.jaccard_distance for r in ml}
    twin_pairs = {(r.doc_a, r.doc_b): r.jaccard for r in twin}
    return ml_pairs, twin_pairs, tol


def test_ml_pairs_within_twin_candidates(bridge):
    ml_pairs, twin_pairs, _ = bridge
    assert len(ml_pairs) > 0, "fixture corpus must contain near-dup pairs"
    missing = [p for p in ml_pairs if p not in twin_pairs]
    assert missing == [], (
        f"{len(missing)} pyspark.ml pairs absent from the oracled twin's "
        f"max-recall candidate set: {missing[:5]}"
    )


def test_ml_distance_equals_exact_jaccard(bridge):
    ml_pairs, twin_pairs, tol = bridge
    for p, dist in ml_pairs.items():
        assert p in twin_pairs, f"ml pair {p} absent from twin candidates"
        assert abs((1.0 - dist) - twin_pairs[p]) <= tol, (
            f"pair {p}: ml jaccard {1.0 - dist} != twin exact {twin_pairs[p]}"
        )


def test_ml_respects_distance_threshold(bridge):
    ml_pairs, twin_pairs, _ = bridge
    for p in ml_pairs:
        assert p in twin_pairs, f"ml pair {p} absent from twin candidates"
        assert twin_pairs[p] >= 0.2 - 1e-9


def test_ml_finds_all_high_similarity_twin_pairs(bridge):
    ml_pairs, twin_pairs, _ = bridge
    hi = {p for p, j in twin_pairs.items() if j >= 0.5}
    assert hi, "fixture corpus must contain J >= 0.5 pairs"
    missed = hi - set(ml_pairs)
    assert missed == set(), (
        f"ml 5-table banding missed {len(missed)} high-similarity pairs: "
        f"{sorted(missed)[:5]}"
    )

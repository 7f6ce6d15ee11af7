"""Conformance: distributed pipeline vs single-process exact oracle.

Style of the reference's compare_baseline (benchmark/run_benchmark.py:
602-751): the finding-pair set must match the exact all-pairs oracle
EXACTLY (recall 1.0 here implies the >=0.99 target), on a corpus large
enough to include hot-shingle skew material.
"""

import pytest
import ray.data

from clonehunter_ray.config import EngineConfig
from clonehunter_ray.corpus import generate_corpus
from clonehunter_ray.oracle import exact_verified_pairs
from clonehunter_ray.pipelines.scan import scan


@pytest.mark.parametrize("n_files,seed", [(200, 42), (400, 7)])
def test_pipeline_matches_exact_oracle(ray_session, n_files, seed):
    files, _truth = generate_corpus(n_files, seed)
    cfg = EngineConfig()
    oracle = exact_verified_pairs(files, cfg)
    res = scan(ray.data.from_arrow(files), cfg)
    f = res.findings.to_pandas()
    got = set(map(tuple, f[["unit_a", "unit_b"]].values))
    missed = oracle - got
    extra = got - oracle
    assert not missed, f"LSH missed {len(missed)} oracle pairs: {list(missed)[:5]}"
    assert not extra, f"pipeline emitted {len(extra)} non-oracle pairs: {list(extra)[:5]}"

"""HyperLogLog sketch kernel (functions/sketches.py) and the
approx-distinct pipeline: merge semantics (register max == sketch of
the union), estimate accuracy across cardinality regimes, and the Ray
pipeline pinned against the exact COUNT(DISTINCT) oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from clonehunter_ray.functions import sketches as S

SF_DIR = "/root/testdata/sf0.001"


def test_hll_partial_requires_p12():
    with pytest.raises(ValueError):
        S.hll_partial(np.arange(10, dtype=np.uint64), p=8)


def test_hll_merge_equals_sketch_of_union():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 62, size=5000).astype(np.uint64)
    b = rng.integers(0, 1 << 62, size=5000).astype(np.uint64)
    merged = S.hll_merge(
        [S.hll_partial(a).tobytes(), S.hll_partial(b).tobytes()]
    )
    union = S.hll_partial(np.concatenate([a, b]))
    assert (merged == union).all()


@pytest.mark.parametrize("n", [100, 2_000, 50_000, 400_000])
def test_hll_estimate_accuracy(n):
    # sequential keys are the adversarial case for a weak hash — the
    # splitmix64 avalanche must spread them uniformly
    keys = np.arange(n, dtype=np.uint64)
    est = S.hll_estimate(S.hll_partial(keys))
    assert abs(est - n) / n < 0.05  # p=12 -> sigma ~1.6%


def test_hll_estimate_duplicates_dont_inflate():
    keys = np.tile(np.arange(500, dtype=np.uint64), 100)  # 50k rows, 500 distinct
    est = S.hll_estimate(S.hll_partial(keys))
    assert abs(est - 500) / 500 < 0.05


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_users_pipeline_vs_exact():
    from clonehunter_ray.pipelines import queries as Q

    approx = (
        Q.approx_distinct_users_hll(SF_DIR)
        .to_pandas()
        .set_index("event_type")["approx_users"]
    )
    exact = (
        duckdb.sql(
            "SELECT event_type, count(DISTINCT user_id) AS n "
            f"FROM '{SF_DIR}/events.parquet' GROUP BY 1"
        )
        .df()
        .set_index("event_type")["n"]
    )
    assert set(approx.index) == set(exact.index)
    for t in exact.index:
        assert abs(approx[t] - exact[t]) / exact[t] < 0.05


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitter_tokens_matches_exact_oracle():
    import __ray_entry__ as entry
    from clonehunter_ray.pipelines import queries as Q

    mine = (
        Q.heavy_hitter_tokens(SF_DIR)
        .to_pandas()
        .sort_values(["n", "tok"], ascending=[False, True])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.sql(entry.oracle_sql()["heavy_hitter_tokens"]).df()
    assert len(mine) == len(want) == 10
    assert (mine["tok"].values == want["tok"].values).all()
    assert (mine["n"].values == want["n"].values).all()


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitter_small_mg_table_still_exact_on_zipf():
    """Even with a tiny MG table (mg_size=8 < the 31-token vocab, and
    a near-uniform distribution where NO token clears the n/(m+1) MG
    bar), the per-batch top-k seeding + exact recount still recover
    the true top-k — the candidate-then-verify pattern stays correct
    when the heavy-hitter guarantee doesn't bite."""
    import __ray_entry__ as entry
    from clonehunter_ray.pipelines import queries as Q

    mine = (
        Q.heavy_hitter_tokens(SF_DIR, k=5, mg_size=8)
        .to_pandas()
        .sort_values(["n", "tok"], ascending=[False, True])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.sql(
        "SELECT tok, count(*) AS n FROM (SELECT unnest("
        "regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok "
        "FROM documents WHERE doc_id < 500) GROUP BY tok "
        "ORDER BY n DESC, tok LIMIT 5"
    ).df()
    assert (mine["tok"].values == want["tok"].values).all()
    assert (mine["n"].values == want["n"].values).all()


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_handles_null_users_and_types(tmp_path):
    """NULL user_id rows are ignored (SQL COUNT(DISTINCT) semantics)
    and a NULL event_type forms its own group instead of crashing
    np.unique."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from clonehunter_ray.pipelines import queries as Q

    events = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "ts": pa.array([0] * 8, pa.int64()),
            "event_type": pa.array(
                ["a", "a", None, None, "b", "b", "b", "a"]
            ),
            "user_id": pa.array([1, 2, 3, None, 5, 5, None, None], pa.int64()),
            "value": pa.array([0.0] * 8, pa.float64()),
            "props": pa.array(["{}"] * 8),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(events, str(d / "events.parquet"))
    out = (
        Q.approx_distinct_users_hll(str(d))
        .to_pandas()
        .set_index("event_type")["approx_users"]
    )
    # exact: a -> {1,2}, b -> {5}, NULL type -> {3}
    assert out["a"] == 2
    assert out["b"] == 1
    assert out[None] == 1


def test_bloom_membership_no_false_negatives():
    from clonehunter_ray.functions import sketches as SK
    import numpy as np

    rng = np.random.default_rng(7)
    members = rng.choice(1 << 40, size=5000, replace=False).astype(np.uint64)
    packed = SK.bloom_partial(members, n_bits=1 << 16)
    assert SK.bloom_contains(packed, members).all()
    # disjoint non-members: fpr should be near the design point (<2%)
    non = (members + np.uint64(1 << 41)).astype(np.uint64)
    fpr = SK.bloom_contains(packed, non).mean()
    assert fpr < 0.02


def test_bloom_merge_equals_single_build():
    from clonehunter_ray.functions import sketches as SK
    import numpy as np

    keys = np.arange(10_000, dtype=np.uint64)
    whole = SK.bloom_partial(keys, n_bits=1 << 15)
    parts = [
        SK.bloom_partial(c, n_bits=1 << 15) for c in np.array_split(keys, 7)
    ]
    merged = SK.bloom_merge(parts)
    assert np.array_equal(whole, merged)


def test_bloom_empty_and_validation():
    from clonehunter_ray.functions import sketches as SK
    import numpy as np
    import pytest

    empty = SK.bloom_partial(np.empty(0, dtype=np.uint64), n_bits=1 << 10)
    assert not empty.any()
    assert SK.bloom_contains(empty, np.empty(0, dtype=np.uint64)).shape == (0,)
    with pytest.raises(ValueError):
        SK.bloom_partial(np.arange(3, dtype=np.uint64), n_bits=100)


def test_quantile_sketch_exact_below_capacity():
    from clonehunter_ray.functions.sketches import QuantileSketch
    import numpy as np

    vals = np.array([5.0, 1.0, 9.0, 3.0, 7.0])
    sk = QuantileSketch(64)
    sk.update(vals)
    # no compaction happened: quantile_disc semantics are exact
    assert sk.quantiles([0.2, 0.5, 1.0]).tolist() == [1.0, 5.0, 9.0]
    assert sk.weight == 5


def test_quantile_sketch_merge_and_error_bound():
    from clonehunter_ray.functions.sketches import QuantileSketch
    import numpy as np

    rng = np.random.default_rng(0)
    x = rng.normal(size=400_000)
    parts = []
    for c in np.array_split(x, 37):
        s = QuantileSketch(256)
        s.update(c)
        parts.append(s.serialize())
    merged = QuantileSketch.deserialize(parts[0])
    for b in parts[1:]:
        merged.merge(QuantileSketch.deserialize(b))
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    est = merged.quantiles(qs)
    for e, q in zip(est, qs):
        rank = float((x <= e).mean())
        assert abs(rank - q) < 0.02, (q, rank)
    # total weight is conserved exactly by halve-and-double-weight
    # up to items parked in unfinished buffers (never more than the
    # true count, never less than count - k*levels)
    assert 0 <= len(x) - merged.weight <= 256 * len(merged.levels)


def test_quantile_sketch_serialize_roundtrip():
    from clonehunter_ray.functions.sketches import QuantileSketch
    import numpy as np

    sk = QuantileSketch(32)
    sk.update(np.arange(1000, dtype=np.float64))
    rt = QuantileSketch.deserialize(sk.serialize())
    assert rt.k == sk.k
    assert rt.parity == sk.parity
    assert all(
        np.array_equal(a, b) for a, b in zip(rt.levels, sk.levels)
    )
    assert np.array_equal(
        rt.quantiles([0.1, 0.5, 0.9]), sk.quantiles([0.1, 0.5, 0.9])
    )


def test_quantile_sketch_validation_and_nan():
    from clonehunter_ray.functions.sketches import QuantileSketch
    import numpy as np
    import pytest

    with pytest.raises(ValueError):
        QuantileSketch(4)
    a = QuantileSketch(16)
    a.update(np.array([np.nan, 1.0, np.nan, 2.0]))
    assert a.weight == 2
    b = QuantileSketch(32)
    with pytest.raises(ValueError):
        a.merge(b)


def test_approx_length_quantiles_pipeline(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from clonehunter_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    got = Q.approx_length_quantiles(sf).to_pandas()
    n_chars = pq.read_table(
        f"{sf}/documents.parquet", columns=["n_chars"]
    )["n_chars"].to_numpy(zero_copy_only=False)
    for q, v in zip(got["q"], got["value"]):
        rank = float((n_chars <= v).mean())
        assert abs(rank - q) < 0.05, (q, rank, v)
